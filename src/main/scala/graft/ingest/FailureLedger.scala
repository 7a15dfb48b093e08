package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted failure ledger — the reference's `FAILED_TO_CONVERT` table.
  *
  * Reference: every UNMATCH / OUTOFCONFIG / IRREGULAR file is appended as a
  * row of (FILENAME, HEADER_LIST, HEADER_CNT, META_HEADER_LIST,
  * META_HEADER_CNT, START_EXEC_TIME, TYPE) to a queryable parquet table
  * (DATALAKE_TRANSFORMATION_S3_DAILY_JOB.PY:101–103, 400–413); the job's
  * completion mail points operators at an Athena query over exactly this
  * table (:206–211). UNMATCH rows carry the found-vs-expected header
  * detail; OUTOFCONFIG and IRREGULAR rows blank it (:316–317, 349–358).
  *
  * The table is append-only: each run adds its failures, so the ledger is
  * the ingest system's queryable error history (a failed file appears once
  * per run it failed in, and its last appearance dates the fix).
  */
object FailureLedger {
  val TableName = "FAILED_TO_CONVERT"

  /** One ledger row; column names are the table's schema. */
  final case class Record(
      fname: String,
      header_list: String,
      header_cnt: Option[Int],
      meta_header_list: String,
      meta_header_cnt: Option[Int],
      start_exec_time: String,
      status: String)

  /** Append a run's failures. Metadata-scale frame (one row per failed
    * file); a single output file per run mirrors the reference's
    * `repartition(1)` append (:404) — correct here because the ledger is
    * tiny relative to the data it describes. */
  def append(records: Seq[Record], spark: SparkSession, path: String): Unit =
    if (records.nonEmpty) {
      import spark.implicits._
      records.toDF().coalesce(1).write.mode(SaveMode.Append).parquet(path)
    }

  /** Append a run's failures from a frame already shaped by [[shape]] —
    * rows go parquet-to-parquet without passing through the driver. */
  def appendFrame(failures: DataFrame, path: String): Unit =
    if (!failures.isEmpty)
      failures.coalesce(1).write.mode(SaveMode.Append).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Shape a classified file frame (see [[FailureClassifier.classify]])
    * into ledger rows: non-OK, non-EMPTY files only (an empty file is
    * processed-skipped, not a failure); header detail kept only for
    * UNMATCH rows, blanked otherwise (ref :316–317 vs :349–358). */
  def shape(classified: DataFrame, fname: Column, headerList: Column,
            headerCnt: Column, metaHeaderList: Column, metaHeaderCnt: Column,
            execTime: Column): DataFrame = {
    val unm = col("status") === FailureClassifier.Unmatch
    // EMPTY is not a failure: the reference flushes zero-column files
    // to the processed list without an UNMATCH row (ref L319–322)
    classified.where(!col("status").isin(
        FailureClassifier.Ok, FailureClassifier.Empty))
      .select(
        fname.as("fname"),
        when(unm, headerList).otherwise(lit("")).as("header_list"),
        when(unm, headerCnt).as("header_cnt"),
        when(unm, metaHeaderList).otherwise(lit("")).as("meta_header_list"),
        when(unm, metaHeaderCnt).as("meta_header_cnt"),
        execTime.as("start_exec_time"),
        col("status"))
  }
}
