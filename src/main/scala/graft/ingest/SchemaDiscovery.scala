package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** Crawler + DDL-backup equivalents (SURVEY §2.B B9/B10).
  *
  * The reference runs Glue crawlers to infer lake schemas
  * (RUN_CRAWLER_JOB.PY:35–84 — start_crawler/poll/catalog loop) and weekly
  * exports `SHOW CREATE TABLE` DDL for every cataloged table
  * (OUTPUT_METADATA_DDL_WEEKLY_JOB.PY:51–79).
  *
  * Crawler-true: the zone DIRECTORY is the input — tables are whatever the
  * listing finds (the point of a crawler is cataloging tables it does NOT
  * already know), including `col=value` partitioned layouts whose partition
  * columns are emitted into the DDL's PARTITIONED BY clause. Schema
  * inference is parquet footer reads — a metadata operation over table
  * *paths* (O(tables), not O(data); each footer is one small ranged
  * request regardless of table size) — parallelized over a bounded thread
  * pool so a 10k-table zone crawls at pool speed, not sequentially.
  * Within one table, `spark.read.parquet(...).schema` already rides
  * Spark's own distributed machinery: past
  * `spark.sql.sources.parallelPartitionDiscovery.threshold` the
  * partition listing runs as a cluster job, so a million-partition table
  * never serializes on the driver.
  */
object SchemaDiscovery {

  /** One crawled table: leaf name, full path, partition columns (outermost
    * first) discovered from the `k=v` directory chain. */
  final case class CrawledTable(name: String, path: String, partitionCols: Seq[String])

  /** List the zone directory: a `{name}.parquet` entry is an
    * unpartitioned table; a plain directory is a table whose `k=v`
    * subdirectory chain (if any) carries its partition columns — the
    * reference's `TRANSFERRED_DATE=...` layout
    * (DATALAKE_TRANSFORMATION_S3_DAILY_JOB.PY:339, RUN_CRAWLER_JOB.PY
    * catalogs exactly these). Hidden/underscore entries are metadata
    * (_SUCCESS, _delta_log-style) and skipped.
    *
    * Listing goes through the Hadoop FileSystem API, so the zone can be
    * any lake URI (file:, hdfs:, s3a:) — a crawler bound to
    * `java.io.File` only catalogs a laptop. The walk is O(tables +
    * partition depth): the chain probe descends ONE `k=v` branch per
    * level, never enumerating sibling partitions beyond a listing. */
  def crawl(zoneDir: String,
            hadoopConf: org.apache.hadoop.conf.Configuration =
              new org.apache.hadoop.conf.Configuration()): Seq[CrawledTable] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(zoneDir)
    val fs = root.getFileSystem(hadoopConf)
    if (!fs.exists(root)) return Seq.empty
    val entries = fs.listStatus(root).sortBy(_.getPath.getName)
    def partChain(dir: Path): Seq[String] =
      fs.listStatus(dir)
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .sortBy(_.getPath.getName).headOption match {
        case Some(p) =>
          p.getPath.getName.split("=").head +: partChain(p.getPath)
        case None => Nil
      }
    entries.toSeq.flatMap { f =>
      val n = f.getPath.getName
      if (n.startsWith(".") || n.startsWith("_")) None
      else if (n.toLowerCase.endsWith(".parquet"))
        Some(CrawledTable(n.substring(0, n.length - ".parquet".length),
          f.getPath.toString, Nil))
      else if (f.isDirectory)
        Some(CrawledTable(n, f.getPath.toString, partChain(f.getPath)))
      else None
    }
  }

  /** Bounded-pool parallel map for footer reads (driver-side metadata
    * work; the pool keeps a 10k-table crawl from serializing). */
  private[ingest] def inParallel[A, B](items: Seq[A], parallelism: Int = 8)(f: A => B): Seq[B] =
    if (items.isEmpty) Seq.empty
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(parallelism, items.size))
      try {
        import scala.concurrent.{Await, ExecutionContext, Future}
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        Await.result(Future.sequence(items.map(a => Future(f(a)))),
          scala.concurrent.duration.Duration.Inf)
      } finally pool.shutdown()
    }

  /** The [[discover]] output schema — shared with
    * [[LakeCatalog.columnsFrame]] so catalog snapshots and live crawls
    * diff through [[schemaDrift]] without reshaping. */
  private[ingest] val columnsFrameSchema: StructType = columnsSchema
  private lazy val columnsSchema = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("column_name", StringType, nullable = false),
    StructField("ordinal", IntegerType, nullable = false),
    StructField("data_type", StringType, nullable = false),
    StructField("nullable", BooleanType, nullable = false),
    StructField("is_partition", BooleanType, nullable = false)))

  /** Footer-read schema of one crawled table, or None when the path
    * holds no data files at all (an all-empty partitioned write leaves
    * just _SUCCESS — no footers to read). Crawler-true: a data-less
    * prefix is not a table; Glue crawlers skip it rather than fail the
    * crawl, and so do we. */
  private def schemaOf(spark: SparkSession, t: CrawledTable): Option[StructType] =
    try Some(spark.read.parquet(t.path).schema)
    catch {
      case e: org.apache.spark.sql.AnalysisException
        if e.getCondition == "UNABLE_TO_INFER_SCHEMA" => None
    }

  /** Crawl `zoneDir` and infer every discovered table's schema → one row
    * per column (partition columns flagged). */
  def discover(spark: SparkSession, zoneDir: String): DataFrame = {
    val tables = crawl(zoneDir, spark.sessionState.newHadoopConf())
    val rows = inParallel(tables) { t =>
      schemaOf(spark, t).toSeq.flatMap { schema =>
        val parts = t.partitionCols.toSet
        schema.fields.zipWithIndex.map { case (f, i) =>
          Row(t.name, f.name, i, f.dataType.sql.toLowerCase, f.nullable,
            parts.contains(f.name))
        }.toSeq
      }
    }.flatten
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), columnsSchema)
  }

  /** Spark SQL DDL for one table (the `SHOW CREATE TABLE` shape).
    * Partition columns appear in PARTITIONED BY, not the column list —
    * the Hive/Glue external-table convention the reference's catalog
    * stores (OUTPUT_METADATA_DDL_WEEKLY_JOB.PY:62–66). */
  def ddlFor(table: String, schema: StructType,
             partitionCols: Seq[String] = Nil): String = {
    val partSet = partitionCols.toSet
    val cols = schema.fields.filterNot(f => partSet.contains(f.name))
      .map(f => s"  ${f.name} ${f.dataType.sql.toLowerCase}" +
        (if (f.nullable) "" else " NOT NULL"))
      .mkString(",\n")
    val partClause =
      if (partitionCols.isEmpty) ""
      else {
        val typed = partitionCols.map { p =>
          schema.fields.find(_.name == p)
            .map(f => s"$p ${f.dataType.sql.toLowerCase}").getOrElse(p)
        }
        s"\nPARTITIONED BY (${typed.mkString(", ")})"
      }
    s"CREATE TABLE $table (\n$cols\n)\nUSING parquet$partClause"
  }

  /** DDL export for every crawled table under `zoneDir` → (table_name, ddl). */
  def exportDdl(spark: SparkSession, zoneDir: String): DataFrame = {
    val rows = inParallel(crawl(zoneDir, spark.sessionState.newHadoopConf())) { t =>
      schemaOf(spark, t).map(sch => Row(t.name, ddlFor(t.name, sch, t.partitionCols)))
    }.flatten
    val schema = StructType(Seq(
      StructField("table_name", StringType, nullable = false),
      StructField("ddl", StringType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** The weekly DDL-backup run (OUTPUT_METADATA_DDL_WEEKLY_JOB.PY:75–89):
    * loop the zone ("database") list, export every table's generated
    * DDL into a TIMESTAMPED backup prefix (`backup/<path>_<now>`
    * semantics, ref L72), isolating failures PER TABLE — one unreadable
    * table records an error and the sweep continues (the ref's bare
    * try/except around each tableDict). Each zone's surviving
    * (table_name, ddl) set lands at `backupRoot/ddl_<timestamp>/<zone>`
    * with ErrorIfExists (a backup never clobbers an earlier one — the
    * ZoneSync.backupConfig rule). Returns the run report:
    * (zone, table_name, status, detail). */
  def backupDdl(spark: SparkSession, zones: Seq[(String, String)],
                backupRoot: String, timestamp: String): DataFrame = {
    val report = zones.flatMap { case (zoneName, dir) =>
      val tables = crawl(dir, spark.sessionState.newHadoopConf())
      if (tables.isEmpty)
        Seq(Row(zoneName, "", "empty_zone", s"no tables under $dir"))
      else {
        val perTable = inParallel(tables) { t =>
          try Right(t.name ->
            ddlFor(t.name, spark.read.parquet(t.path).schema, t.partitionCols))
          catch { case e: Throwable =>
            Left(t.name -> Option(e.getMessage).getOrElse(e.getClass.getName))
          }
        }
        val ok = perTable.collect { case Right(r) => r }
        if (ok.nonEmpty) {
          val ddlSchema = StructType(Seq(
            StructField("table_name", StringType, nullable = false),
            StructField("ddl", StringType, nullable = false)))
          spark.createDataFrame(
              spark.sparkContext.parallelize(ok.map(r => Row(r._1, r._2)), 1),
              ddlSchema)
            .write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
            .parquet(s"$backupRoot/ddl_$timestamp/$zoneName")
        }
        perTable.map {
          case Right((name, _)) => Row(zoneName, name, "ok", "")
          case Left((name, err)) => Row(zoneName, name, "failed", err.take(200))
        }
      }
    }
    val reportSchema = StructType(Seq(
      StructField("zone", StringType, nullable = false),
      StructField("table_name", StringType, nullable = false),
      StructField("status", StringType, nullable = false),
      StructField("detail", StringType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(report, 1), reportSchema)
  }

  /** A zone the catalog does NOT know: a derived table plus a partitioned
    * `TRANSFERRED_DATE=` layout, written (tiny, deterministic) next to the
    * testdata so the crawler demonstrably discovers tables outside any
    * hardcoded list. Idempotent per sfDir. */
  private def supplementalZone(s: SparkSession, dir: String): String = {
    // sanitized-full-dir key, not abs(hashCode) — same collision
    // rationale as PartitionHealth.metaPartitionHealth's zone
    val zone = s"${sys.props("java.io.tmpdir")}/graft_crawl_zone_" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val daily = LakeWriter.withTransferredDate(graft.sources.Tables(s, dir, "events"), "ts")
      .groupBy(org.apache.spark.sql.functions.col(LakeWriter.PartitionCol))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_events"))
    daily.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$zone/daily_totals.parquet")
    daily.coalesce(1).write.mode(SaveMode.Overwrite)
      .partitionBy(LakeWriter.PartitionCol)
      .parquet(s"$zone/events_daily")
    zone
  }

  /** B9 query: crawl the testdata zone (tables found by LISTING, no
    * catalog) plus a supplemental zone holding an unknown table and a
    * partitioned layout; one row per discovered column. */
  def metaSchemaDiscovery(s: SparkSession, dir: String): DataFrame =
    discover(s, dir).unionAll(discover(s, supplementalZone(s, dir)))
      .orderBy("table_name", "ordinal")

  /** B10 query: DDL export for every crawled table (partitioned layouts
    * carry PARTITIONED BY), deterministically ordered. */
  def metaDdlExport(s: SparkSession, dir: String): DataFrame =
    exportDdl(s, dir).unionAll(exportDdl(s, supplementalZone(s, dir)))
      .orderBy("table_name")

  /** B14: schema DRIFT between two discovery snapshots — the report the
    * reference's daily re-crawl implicitly produces by overwriting the
    * Glue catalog, made EXPLICIT so an upstream contract break (a feed
    * dropping a column, widening a type, flipping nullability, or
    * moving a column out of the partition layout) pages someone instead
    * of silently re-cataloging. Inputs are two [[discover]]-shaped
    * frames (one row per column); output is one row per drifted column:
    * `added` / `removed` / `type_changed` / `nullability_changed` /
    * `partitioning_changed` (first match wins, in that severity order),
    * with the old/new type carried for the report. A brand-new table
    * surfaces as all-`added` rows. Catalog frames are metadata-scale,
    * so the full-outer join is trivially bounded. */
  def schemaDrift(oldCols: DataFrame, newCols: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    def side(df: DataFrame, tag: String) =
      df.select(col("table_name"), col("column_name"),
        col("data_type").as(s"type_$tag"), col("nullable").as(s"null_$tag"),
        col("is_partition").as(s"part_$tag"))
    side(oldCols, "old")
      .join(side(newCols, "new"), Seq("table_name", "column_name"), "full_outer")
      .withColumn("change",
        when(col("type_old").isNull, "added")
          .when(col("type_new").isNull, "removed")
          .when(col("type_old") =!= col("type_new"), "type_changed")
          .when(col("null_old") =!= col("null_new"), "nullability_changed")
          .when(col("part_old") =!= col("part_new"), "partitioning_changed")
          .otherwise("unchanged"))
      .where(col("change") =!= "unchanged")
      .select(col("table_name"), col("column_name"), col("change"),
        col("type_old"), col("type_new"))
      .orderBy(col("table_name"), col("column_name"))
  }

  /** B14 query face: the drift between the standing discovery snapshot
    * and a re-crawl with PLANTED upstream contract breaks (the corpus
    * itself is static, so the breaks are synthesized the way
    * text_redact plants contacts — the operator under test is the
    * diff): `events` loses `props`, `user_id` degrades to string, and
    * `ingest_ts` appears; everything else must NOT drift. */
  def metaSchemaDrift(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val standing = discover(s, dir)
    val recrawl = standing
      .where(!(col("table_name") === "events" && col("column_name") === "props"))
      .withColumn("data_type",
        when(col("table_name") === "events" && col("column_name") === "user_id",
          lit("string")).otherwise(col("data_type")))
      .unionAll(s.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row("events", "ingest_ts", 99, "timestamp",
            true, false)),
        standing.schema))
    schemaDrift(standing, recrawl)
  }
}
