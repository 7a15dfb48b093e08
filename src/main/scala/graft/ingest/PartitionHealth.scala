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
    * fragmented, so the flag is non-vacuously exercised in both
    * directions. SQL-CHECKED (round-11 promotion, the B14 planted-break
    * posture): the zone's file LAYOUT is a deterministic function of
    * the events table — per day, `2 + n%7` files of `100 + (n+i)%1000`
    * bytes each (mixed above/below the 600-byte small cut), plus one
    * healthy single-file table sized from the corpus total — so DuckDB
    * replays files/bytes/avg/small/flag from the events counts alone,
    * while the operator under test (the REAL Hadoop-FS crawl + leaf
    * listing + grouping arithmetic) runs unchanged. The spec keeps the
    * real-parquet loop: compactPartition clears the exact flag the
    * report raised on genuinely fragmented Spark writes. Thresholds
    * scale to the planted sizes; production uses the defaults. */
  def metaPartitionHealth(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.hadoop.fs.Path
    // zone keyed by the SANITIZED full dir string, not a 32-bit hash:
    // abs(hashCode) collides across dirs (and Int.MinValue stays
    // negative under math.abs), and two sessions pointing at different
    // corpora must never overwrite each other's zone mid-read
    val zone = s"${sys.props("java.io.tmpdir")}/graft_health_zone_" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_")
    // per-day event counts: a days-scale collect (the A40 argument —
    // bounded by the calendar however large the corpus)
    val days = LakeWriter.withTransferredDate(
        graft.sources.Tables(s, dir, "events"), "ts")
      .groupBy(col(LakeWriter.PartitionCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val conf = s.sessionState.newHadoopConf()
    val root = new Path(zone)
    val fs = root.getFileSystem(conf)
    fs.delete(root, true)
    def plant(p: Path, size: Long): Unit = {
      val out = fs.create(p, true)
      val chunk = Array.fill[Byte](8192)('x'.toByte)
      var left = size
      while (left > 0) {
        val w = math.min(left, 8192L).toInt; out.write(chunk, 0, w); left -= w
      }
      out.close()
    }
    val total = days.map(_._2).sum
    plant(new Path(root, "healthy/part-00000.bin"), 4096L + total % 1000L)
    days.foreach { case (day, n) =>
      val k = (2L + n % 7L).toInt
      (0 until k).foreach { i =>
        plant(new Path(root, s"fragmented/day=$day/part-0000$i.bin"),
          100L + (n + i) % 1000L)
      }
    }
    report(s, zone, smallBytes = 600L, targetFiles = 4)
  }

  /** The B15 oracle: the planted layout's (files, bytes) replayed from
    * the events day counts, then the identical flag arithmetic. */
  val healthOracle: String =
    """WITH days AS (
      |  SELECT strftime(ts,'%Y-%m-%d') AS day, count(*)::BIGINT AS n
      |  FROM events GROUP BY 1),
      |tot AS (SELECT coalesce(sum(n), 0)::BIGINT AS t FROM days),
      |ff AS (
      |  SELECT day, (100 + (n + i) % 1000)::BIGINT AS bytes
      |  FROM days, unnest(generate_series(0, (2 + n % 7)::INT - 1)) AS u(i)),
      |frag AS (
      |  SELECT 'fragmented' AS table_name, 'day='||day AS "partition",
      |         count(*)::INT AS files, sum(bytes)::BIGINT AS bytes,
      |         (sum(bytes)::BIGINT // count(*))::BIGINT AS avg_bytes,
      |         sum(CASE WHEN bytes < 600 THEN 1 ELSE 0 END)::INT AS small_files,
      |         (count(*) > 4 AND (sum(bytes)::BIGINT // count(*)) < 600)
      |           AS needs_compaction
      |  FROM ff GROUP BY 2),
      |healthy AS (
      |  SELECT 'healthy' AS table_name, CAST(NULL AS VARCHAR) AS "partition",
      |         1::INT AS files, (4096 + t % 1000)::BIGINT AS bytes,
      |         (4096 + t % 1000)::BIGINT AS avg_bytes, 0::INT AS small_files,
      |         FALSE AS needs_compaction
      |  FROM tot)
      |SELECT * FROM frag UNION ALL SELECT * FROM healthy
      |ORDER BY table_name, "partition"""".stripMargin
}
