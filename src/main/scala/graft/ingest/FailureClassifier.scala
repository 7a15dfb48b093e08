package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingest failure classification.
  *
  * Reference classes (DATALAKE_TRANSFORMATION_S3_DAILY_JOB.PY:102–107):
  *  - IRREGULAR:   filename doesn't parse (L355–358)
  *  - OUTOFCONFIG: no config row covers the file (L349–352)
  *  - UNMATCH:     column count differs from config (L313–318)
  *  - OK:          ingested
  * The reference accumulates these in driver lists and writes them as a
  * "failed to convert" parquet report (L407–417).
  *
  * EMPTY is this repo's explicit name for the reference's 2019.06.21
  * "EMPTY FILES FLUSH TO PROCESSED LIST" branch (L314–322): a file
  * whose parse yields ZERO columns is appended straight to the
  * processed list — skipped forever, never reported as a failure — so
  * a feed that ships empty placeholder markers doesn't spam the
  * failure ledger daily.
  *
  * Spark-first: classification is one projection over (file × left-joined
  * config); the report is just the filtered frame — no driver state.
  */
object FailureClassifier {
  val Ok = "OK"
  val Unmatch = "UNMATCH"
  val OutOfConfig = "OUTOFCONFIG"
  val Irregular = "IRREGULAR"
  /** Zero-column file: ledgered as processed, never reported (ref L319–322). */
  val Empty = "EMPTY"

  /** `files` must carry `irregularCol` (boolean) and `headerCntCol`;
    * `config` carries the join key and `expectedCntCol` (nullable after the
    * left join ⇒ OUTOFCONFIG). */
  def classify(filesWithConfig: DataFrame, irregular: Column,
               headerCnt: Column, expectedCnt: Column): DataFrame =
    filesWithConfig.withColumn("status",
      when(irregular, lit(Irregular))
        .when(expectedCnt.isNull, lit(OutOfConfig))
        .when(headerCnt =!= expectedCnt, lit(Unmatch))
        .otherwise(lit(Ok)))
}
