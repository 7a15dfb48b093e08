package graft.ingest

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC→lake ingestion (the reference's CONVERT_RDS_TO_S3_DAILY_JOB.PY).
  *
  * The reference reads each RDS table through a single Glue connection
  * (one partition — the whole table streams through one task). At scale
  * a JDBC read must be RANGE-PARTITIONED: `partitionColumn` with
  * lower/upper bounds fans the read out over `numPartitions` parallel
  * cursors, and Spark pushes the per-partition range predicates into the
  * remote SQL. The watermark filter composes with [[Watermark]]:
  * incremental runs read only `key > max(ingested)` — that predicate
  * also pushes into the remote query, so the database scans only new
  * rows.
  */
object RdsIngest {

  /** Full-table parallel read. `bounds` = (partitionColumn, lower,
    * upper, numPartitions); pass None only for tiny tables (single
    * cursor — the reference's mode). */
  def read(spark: SparkSession, url: String, table: String,
           props: Properties = new Properties(),
           bounds: Option[(String, Long, Long, Int)] = None): DataFrame =
    bounds match {
      case Some((col, lower, upper, n)) =>
        spark.read.jdbc(url, table, col, lower, upper, n, props)
      case None =>
        spark.read.jdbc(url, table, props)
    }

  /** Incremental snapshot: rows of `table` with `keyCol` above the max
    * already in `ingested`, range-partitioned over the new key span.
    * Mirrors CONVERT_RDS L95–102 with the driver-side max replaced by a
    * broadcast scalar. */
  def readIncremental(spark: SparkSession, url: String, table: String,
                      keyCol: String, ingested: DataFrame,
                      numPartitions: Int = 8,
                      props: Properties = new Properties()): DataFrame = {
    val source = read(spark, url, table, props)
    val fresh = Watermark.newerThanMax(source, ingested, keyCol)
    // spread the fresh span over parallel readers when it is large
    if (numPartitions > 1) fresh.repartition(numPartitions) else fresh
  }
}
