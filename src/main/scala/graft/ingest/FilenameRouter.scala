package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Landing-zone filename routing.
  *
  * The reference routes `TABLE_YYYYMMDD_HHMMSS.CSV.GZ` objects by slicing
  * the last 23 characters of the key (DATALAKE_TRANSFORMATION_S3_DAILY_JOB
  * .PY:122,274–290) and flags anything else IRREGULAR (L355–358).
  *
  * Spark-first: the parse is a columnar regexp over a DataFrame of file
  * names — a single distributed projection instead of a per-file driver
  * loop, so routing 100M landing files is a normal Spark job.
  */
object FilenameRouter {
  /** `TABLE_YYYYMMDD_HHMMSS.CSV[.GZ]` — table name may itself contain
    * '_'; the reference ships only gzipped files, plain CSV is accepted
    * too (same groups: 1=table, 2=date). */
  val pattern = "^(.+)_([0-9]{8})_[0-9]{6}\\.CSV(\\.GZ)?$"

  def isStandard(fname: Column): Column = fname.rlike(pattern)

  def tableName(fname: Column): Column = regexp_extract(fname, pattern, 1)

  /** Business date parsed from the filename (ref L280–285). */
  def fileDate(fname: Column): Column =
    to_date(regexp_extract(fname, pattern, 2), "yyyyMMdd")

  /** Adds `table_name` / `file_date` / `route_status` columns to a frame of
    * landing-zone object keys in column `fname`. */
  def route(files: DataFrame, fname: String = "fname"): DataFrame = {
    val f = col(fname)
    files
      .withColumn("route_status", when(isStandard(f), lit("OK")).otherwise(lit("IRREGULAR")))
      .withColumn("table_name", when(isStandard(f), tableName(f)).otherwise(lit("(irregular)")))
      .withColumn("file_date", when(isStandard(f), fileDate(f)))
  }
}
