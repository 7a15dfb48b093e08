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

  /** Resolve-by-name face (CONVERT_RDS L62–73: the job is handed a
    * CONNECTION NAME and resolves url + credentials from the catalog at
    * runtime). The resolver is the caller's secret-store adapter —
    * credentials never appear in config tables or code, and resolution
    * happens once, on the driver. */
  def read(spark: SparkSession, connectionName: String,
           resolver: String => (String, Properties), table: String): DataFrame = {
    val (url, props) = resolver(connectionName)
    read(spark, url, table, props)
  }

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

  /** Incremental snapshot: rows of `table` with numeric `keyCol` above
    * the max already in `ingested` (CONVERT_RDS L95–102). The watermark
    * is resolved to a LITERAL on the driver so the `key > wm` predicate
    * pushes into the remote SQL — the database scans only new rows —
    * and the fresh key span's bounds come from one remote min/max query
    * so the read fans out over `numPartitions` parallel cursors. */
  def readIncremental(spark: SparkSession, url: String, table: String,
                      keyCol: String, ingested: DataFrame,
                      numPartitions: Int = 8,
                      props: Properties = new Properties()): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, max}
    import org.apache.spark.sql.types.NumericType
    val wmRow = ingested.agg(max(col(keyCol))).head()
    val wm: Option[Any] = if (wmRow.isNullAt(0)) None else Some(wmRow.get(0))
    // range partitioning needs a numeric span; decide from the REMOTE
    // table's schema (one prepare, no data read)
    val base = read(spark, url, table, props)
    val numericKey = base.schema(keyCol).dataType.isInstanceOf[NumericType]

    wm match {
      case Some(n: Number) if numericKey =>
        // filter by the EXACT watermark value (truncating a fractional
        // key would re-ingest rows); long bounds are only partition
        // split points — Spark's first/last JDBC partitions are
        // unbounded, so truncation there cannot lose rows
        boundedRead(spark, url, table, keyCol, Some(n), numPartitions, props)
          .where(col(keyCol) > lit(n))
      case Some(other) =>
        // non-numeric key (date/string): literal predicate still pushes
        read(spark, url, table, props).where(col(keyCol) > lit(other))
      case None if numericKey =>
        // cold start: nothing ingested — full load, still fanned out
        boundedRead(spark, url, table, keyCol, None, numPartitions, props)
      case None => base
    }
  }

  /** Read with partition bounds taken from one remote min/max query over
    * the (optionally watermark-filtered) key span. Only called for
    * numeric keys. */
  private def boundedRead(spark: SparkSession, url: String, table: String,
                          keyCol: String, above: Option[Number],
                          numPartitions: Int, props: Properties): org.apache.spark.sql.DataFrame = {
    // honor the JDBC 'driver' property the way spark.read.jdbc does
    Option(props.getProperty("driver")).foreach(Class.forName)
    val where = above.map(w => s" WHERE $keyCol > $w").getOrElse("")
    val conn = java.sql.DriverManager.getConnection(url, props)
    val (lo, hi, any) =
      try {
        val rs = conn.createStatement().executeQuery(
          s"SELECT MIN($keyCol), MAX($keyCol) FROM $table$where")
        rs.next()
        val l = rs.getLong(1); val lNull = rs.wasNull()
        val h = rs.getLong(2)
        (l, h, !lNull)
      } finally conn.close()
    if (!any)
      read(spark, url, table, props).limit(0)
    else if (hi > lo && numPartitions > 1)
      read(spark, url, table, props, Some((keyCol, lo, hi, numPartitions)))
    else read(spark, url, table, props)
  }
}
