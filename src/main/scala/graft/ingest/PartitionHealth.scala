package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructField, StructType}

/** B15: partition/file HEALTH report — the card that tells you WHICH
  * partitions need [[LakeWriter.compactPartition]], instead of
  * compacting on a schedule and hoping. The reference meets the same
  * problem from the other side (its single-DPU `repartition(1)` writes
  * exist to avoid small files, DATALAKE_TRANSFORMATION_S3_DAILY_JOB.PY
  * L342); at lake scale the honest posture is measure-then-compact:
  * per (table, partition) — file count, byte totals, the average file
  * size, how many files sit under the small-file threshold, and the
  * compaction flag.
  *
  * Everything here is METADATA-scale: one Hadoop FS listing per table /
  * partition directory (the [[SchemaDiscovery.crawl]] posture — lake
  * URIs, never java.io.File), no data file is ever opened. A 10k-table
  * zone is a 10k-listing driver loop through the bounded pool. */
object PartitionHealth {

  val ReportSchema: StructType = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("partition", StringType, nullable = true), // null = unpartitioned
    StructField("files", IntegerType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("avg_bytes", LongType, nullable = false),
    StructField("small_files", IntegerType, nullable = false),
    StructField("needs_compaction", BooleanType, nullable = false)))

  /** The health report for every table [[SchemaDiscovery.crawl]] finds
    * under `zoneDir`. A partitioned table reports one row per LEAF
    * partition directory; an unpartitioned table reports one row with a
    * null partition. `needs_compaction` = more than `targetFiles` files
    * AND an average below `smallBytes` — many small files is the
    * listing-amplification pathology; few large files and many large
    * files are both fine. */
  def report(spark: SparkSession, zoneDir: String,
             smallBytes: Long = 32L * 1024 * 1024,
             targetFiles: Int = 4): DataFrame = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    val tables = SchemaDiscovery.crawl(zoneDir, conf)
    val rows = SchemaDiscovery.inParallel(tables) { t =>
      val root = new Path(t.path)
      val fs = root.getFileSystem(conf)
      // leaf data files grouped by their k=v partition chain ("" = root)
      def leaves(dir: Path, part: Seq[String]): Seq[(String, Long)] =
        fs.listStatus(dir).toSeq.flatMap { s =>
          val n = s.getPath.getName
          if (n.startsWith(".") || n.startsWith("_")) Nil
          else if (s.isDirectory)
            leaves(s.getPath,
              if (n.contains("=")) part :+ n else part)
          else Seq((part.mkString("/"), s.getLen))
        }
      leaves(root, Nil).groupBy(_._1).toSeq.map { case (part, fsz) =>
        val sizes = fsz.map(_._2)
        val files = sizes.size
        val bytes = sizes.sum
        val avg = bytes / files
        val small = sizes.count(_ < smallBytes)
        Row(t.name, if (part.isEmpty) null else part, files, bytes, avg,
          small, files > targetFiles && avg < smallBytes)
      }
    }.flatten
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), ReportSchema)
      .orderBy("table_name", "partition")
  }

  /** B15 query face: the report over a planted two-table zone — one
    * right-sized table and one partitioned table written deliberately
    * fragmented (8 shards of a few KB per day), so the flag is
    * non-vacuously exercised in both directions. Thresholds scale to
    * the planted sizes; production uses the defaults. */
  def metaPartitionHealth(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // zone keyed by the SANITIZED full dir string, not a 32-bit hash:
    // abs(hashCode) collides across dirs (and Int.MinValue stays
    // negative under math.abs), and two sessions pointing at different
    // corpora must never overwrite each other's zone mid-read
    val zone = s"${sys.props("java.io.tmpdir")}/graft_health_zone_" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val daily = LakeWriter.withTransferredDate(
      graft.sources.Tables(s, dir, "events"), "ts")
    daily.groupBy(col(LakeWriter.PartitionCol))
      .agg(count(lit(1)).as("n_events"))
      .coalesce(1).write.mode("overwrite").parquet(s"$zone/healthy.parquet")
    daily.repartition(8).write.mode("overwrite")
      .partitionBy(LakeWriter.PartitionCol).parquet(s"$zone/fragmented")
    report(s, zone, smallBytes = 1L * 1024 * 1024, targetFiles = 4)
  }
}
