package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermark-incremental ingest (the RDS→lake path).
  *
  * Reference (CONVERT_RDS_TO_S3_DAILY_JOB.PY:95–102): append only source
  * rows with `key > (SELECT max(key) FROM already_ingested)`.
  *
  * Spark-first: the scalar watermark is an aggregate on the ingested side
  * broadcast into a filter on the source side — one tiny broadcast, the
  * big side streams through a codegen'd filter, and for JDBC sources the
  * predicate pushes down into the remote query.
  */
object Watermark {
  /** Rows of `source` strictly above the max of `ingested(keyCol)`;
    * an EMPTY ingested side means FIRST RUN and keeps everything. The
    * reference's literal SQL (`key > (SELECT max(key)...)`) silently
    * returns zero rows against an empty catalog — the null-comparison
    * footgun — because its first load arrives via a different branch;
    * a library caller gets the explicit rule instead (the JDBC path,
    * [[RdsIngest.readIncremental]], already encodes it via Option). */
  def newerThanMax(source: DataFrame, ingested: DataFrame, keyCol: String): DataFrame = {
    val wm = ingested.agg(max(col(keyCol)).as("__wm"))
    source.crossJoin(broadcast(wm))
      .where(col("__wm").isNull || col(keyCol) > col("__wm"))
      .drop("__wm")
  }

  /** The reference's non-partitioned-table branch (CONVERT_RDS_TO_S3_DAILY
    * _JOB.PY:84–92): no watermark — the whole source snapshot replaces the
    * destination. Plain distributed overwrite; no repartition(1). */
  def fullRefresh(source: DataFrame, destPath: String): Unit =
    source.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(destPath)
}
