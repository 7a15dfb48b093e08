package graft.ingest

import java.util.Properties

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, date_format, lit, max}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Config-driven multi-table JDBC sweep — the reference's daily RDS job
  * loop (CONVERT_RDS_TO_S3_DAILY_JOB.PY:54–108), which iterates an
  * RDS_MAPPING_FILE CSV of (TABLE, PARTITIONED, PARTITIONKEY) rows and
  * branches per table:
  *
  *  - PARTITIONED=N → full-table read, overwrite (ref L80–81);
  *  - PARTITIONED=Y, destination absent → initial load with a derived
  *    `parkey` = yyyy-MM-dd partition column (ref L88–93);
  *  - PARTITIONED=Y, destination present → watermark-incremental append:
  *    only rows with key above the destination's max, same derived
  *    partition column (ref L96–108). The watermark predicate pushes into
  *    the remote SQL via [[RdsIngest.readIncremental]] — the database
  *    scans only new rows — and numeric key spans fan out over parallel
  *    cursors (the reference streams each table through ONE connection).
  *
  * Two deliberate departures from the reference:
  *  - PER-TABLE FAILURE ISOLATION. The reference's `for row in collect()`
  *    dies wholesale on the first bad table (only the catalog-miss
  *    AnalysisException is handled), so one dropped remote table blocks
  *    every table behind it in the config. Here each leg try/catches into
  *    a report row and the sweep continues; the report frame is the run's
  *    summary (the transform job's report pattern, TRANSFORMATION L400+).
  *  - No `repartition(1)` (the reference's single-DPU idiom): partitioned
  *    writes repartition by the partition column so each day lands as a
  *    bounded file set, and full loads keep the source's fan-out.
  *
  * The config `collect()` is metadata-scale (one row per table — the
  * reference collects the same frame, L54).
  */
object RdsSweep {

  /** Derived partition column, the reference's name (ref L83). */
  val PartitionCol = "parkey"

  /** Config mirrors the reference's mapping CSV: TABLE, PARTITIONED
    * ("Y"/"N"), PARTITIONKEY (null unless partitioned), and our
    * scale addition NUM_PARTITIONS (parallel JDBC cursors). */
  val ConfigSchema: StructType = StructType(Seq(
    StructField("TABLE", StringType, nullable = false),
    StructField("PARTITIONED", StringType, nullable = false),
    StructField("PARTITIONKEY", StringType, nullable = true),
    StructField("NUM_PARTITIONS", LongType, nullable = true)))

  val ReportSchema: StructType = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("mode", StringType, nullable = false),    // full | init | append
    StructField("status", StringType, nullable = false),  // ok | empty | failed
    StructField("rows_written", LongType, nullable = false),
    StructField("dest", StringType, nullable = false),
    StructField("error", StringType, nullable = true)))

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Resolve-by-name face — the reference's connection indirection
    * (CONVERT_RDS_TO_S3_DAILY_JOB.PY:62–73 resolves a named catalog
    * connection into JDBC url + credentials at runtime). The resolver
    * is the caller's secret-store adapter (vault, env, a config
    * table); the library never sees WHERE credentials live, only the
    * (url, props) they resolve to — resolved ONCE per sweep, on the
    * driver, never serialized into the plan. */
  def run(spark: SparkSession, connectionName: String,
          resolver: String => (String, Properties),
          config: DataFrame, destRoot: String): DataFrame = {
    val (url, props) = resolver(connectionName)
    run(spark, url, config, destRoot, props)
  }

  /** Run the sweep: one leg per config row, never aborting the loop.
    * Returns the per-table run report. [[ReportSink.onFailure]] fires
    * with the failed legs when any leg failed (the reference's SNS
    * seam); onComplete always, with the per-table status lines. */
  def run(spark: SparkSession, url: String, config: DataFrame,
          destRoot: String, props: Properties = new Properties(),
          sink: ReportSink = ReportSink.Silent): DataFrame = {
    val legs = config.select(
        col("TABLE"), col("PARTITIONED"), col("PARTITIONKEY"), col("NUM_PARTITIONS"))
      .collect().toSeq.sortBy(_.getAs[String]("TABLE"))
    val report = legs.map { leg =>
      val table = leg.getAs[String]("TABLE")
      val partitioned = leg.getAs[String]("PARTITIONED") == "Y"
      val dest = s"$destRoot/$table"
      val mode =
        if (!partitioned) "full"
        else if (exists(spark, dest)) "append" else "init"
      try {
        val written = mode match {
          case "full" =>
            RdsIngest.read(spark, url, table, props)
              .write.mode(SaveMode.Overwrite).parquet(dest)
            spark.read.parquet(dest).count()
          case "init" =>
            val key = leg.getAs[String]("PARTITIONKEY")
            val df = RdsIngest.read(spark, url, table, props)
              .withColumn(PartitionCol, date_format(col(key), "yyyy-MM-dd"))
            df.repartition(col(PartitionCol))
              .write.mode(SaveMode.Overwrite).partitionBy(PartitionCol).parquet(dest)
            spark.read.parquet(dest).count()
          case "append" =>
            val key = leg.getAs[String]("PARTITIONKEY")
            val cursors = Option(leg.getAs[java.lang.Long]("NUM_PARTITIONS"))
              .map(_.toInt).getOrElse(8)
            val before = spark.read.parquet(dest).count()
            val fresh = RdsIngest.readIncremental(spark, url, table, key,
                ingested = spark.read.parquet(dest), numPartitions = cursors, props = props)
              .withColumn(PartitionCol, date_format(col(key), "yyyy-MM-dd"))
            // the reference's head(1) emptiness guard (L93,107) without a
            // second remote scan: append, then diff the metadata count
            fresh.repartition(col(PartitionCol))
              .write.mode(SaveMode.Append).partitionBy(PartitionCol).parquet(dest)
            spark.read.parquet(dest).count() - before
        }
        Row(table, mode, if (written > 0) "ok" else "empty", written, dest, null)
      } catch {
        case e: Throwable =>
          Row(table, mode, "failed", 0L, dest,
            Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
      }
    }
    val frame = spark.createDataFrame(
      spark.sparkContext.parallelize(report, 1), ReportSchema)
    val lines = report.map(r =>
      s"${r.getString(0)}: ${r.getString(2)} (${r.getString(1)}, rows=${r.getLong(3)})")
    ReportSink.safely(sink.onComplete("rds_sweep",
      s"RDS SWEEP ${report.count(_.getString(2) == "failed")} failed / " +
        s"${report.size} legs\n" + lines.mkString("\n")))
    if (report.exists(_.getString(2) == "failed"))
      ReportSink.safely(sink.onFailure("rds_sweep",
        frame.where(col("status") === "failed")))
    frame
  }
}
