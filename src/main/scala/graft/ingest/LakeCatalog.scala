package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType, StructField, StringType, BooleanType}

/** Persistent catalog face (the reference's Glue catalog, Spark-first).
  *
  * The reference's crawler exists to produce a catalog that OUTLIVES the
  * job (RUN_CRAWLER_JOB.PY:35–77): every later job and every Athena query
  * attaches to that external catalog rather than re-inferring schemas.
  * The Spark-native equivalent here keeps the same split:
  *
  *  - [[persist]] = the crawler run: crawl a zone ([[SchemaDiscovery.crawl]]),
  *    infer each table's schema once (footer reads), and write the result
  *    AS A TABLE ON THE LAKE — name, location, lossless schema JSON,
  *    partition columns, and executable DDL. The catalog is durable data,
  *    exactly like Glue's service: it survives any session or cluster
  *    restart by construction, and a 10k-table catalog is still one tiny
  *    parquet file.
  *  - [[attach]] = the Glue connector: ANY session (a fresh one included)
  *    reads the catalog table and registers each entry into its session
  *    catalog via generated `CREATE TABLE ... USING parquet LOCATION`
  *    DDL — schemas come from the CATALOG, not from re-crawling the data
  *    (zero footer reads at attach time, the point of having a catalog),
  *    and partitioned layouts are recovered with `MSCK REPAIR TABLE`.
  *    After attach, `spark.sql` runs the reference's ANSI statements on
  *    the zone unchanged.
  *
  * A Derby-backed Hive metastore would persist session-side registration
  * too, but `spark.sql.catalogImplementation` is a static per-JVM conf —
  * the lake-resident catalog is both the portable design (any number of
  * independent clusters attach to the same catalog, like Glue) and the
  * testable one.
  */
object LakeCatalog {

  val CatalogSchema: StructType = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("location", StringType, nullable = false),
    StructField("schema_json", StringType, nullable = false),
    StructField("partition_cols", StringType, nullable = false), // comma-joined, "" = none
    StructField("ddl", StringType, nullable = false),
    StructField("is_partitioned", BooleanType, nullable = false)))

  /** Spark datasource DDL for an attachable EXTERNAL table: all columns
    * (partition columns included) in the column list, partition columns
    * named in PARTITIONED BY — the `USING` dialect, unlike
    * [[SchemaDiscovery.ddlFor]]'s Hive/Glue backup shape which excludes
    * them from the list. Identifiers are backtick-quoted. */
  def attachDdl(table: String, schema: StructType, partitionCols: Seq[String],
                location: String): String = {
    val cols = schema.fields
      .map(f => s"  `${f.name}` ${f.dataType.sql.toLowerCase}")
      .mkString(",\n")
    val partClause =
      if (partitionCols.isEmpty) ""
      else s"\nPARTITIONED BY (${partitionCols.map(p => s"`$p`").mkString(", ")})"
    s"CREATE TABLE IF NOT EXISTS $table (\n$cols\n)\nUSING parquet$partClause\nLOCATION '$location'"
  }

  /** Crawler run: crawl `zoneDir`, infer schemas (bounded-pool parallel
    * footer reads, once per table), write the catalog table to
    * `catalogPath`. Overwrites — the crawler owns the catalog, re-runs
    * refresh it (the reference re-crawls daily). Returns tables cataloged. */
  def persist(spark: SparkSession, zoneDir: String, catalogPath: String): Int = {
    val tables = SchemaDiscovery.crawl(zoneDir, spark.sessionState.newHadoopConf())
    val rows = SchemaDiscovery.inParallel(tables) { t =>
      val schema = spark.read.parquet(t.path).schema
      Row(t.name, t.path, schema.json, t.partitionCols.mkString(","),
        attachDdl(t.name, schema, t.partitionCols, t.path),
        t.partitionCols.nonEmpty)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), CatalogSchema)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(catalogPath)
    rows.size
  }

  /** The persisted catalog as a frame (for inspection / SQL over the
    * catalog itself, Glue's `information_schema` face). */
  def read(spark: SparkSession, catalogPath: String): DataFrame =
    spark.read.schema(CatalogSchema).parquet(catalogPath)

  /** The catalog exploded to one row per COLUMN, in the
    * [[SchemaDiscovery.discover]] shape — so a stored catalog can feed
    * [[SchemaDiscovery.schemaDrift]] directly as the "what we promised
    * yesterday" side. Metadata-scale: the JSON parse is a driver loop
    * over one row per table. */
  def columnsFrame(spark: SparkSession, catalogPath: String): DataFrame = {
    val rows = read(spark, catalogPath).collect().toSeq.flatMap { e =>
      val schema = DataType.fromJson(e.getAs[String]("schema_json"))
        .asInstanceOf[StructType]
      val parts = e.getAs[String]("partition_cols")
        .split(",").filter(_.nonEmpty).toSet
      schema.fields.zipWithIndex.map { case (f, i) =>
        Row(e.getAs[String]("table_name"), f.name, i,
          f.dataType.sql.toLowerCase, f.nullable, parts.contains(f.name))
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      SchemaDiscovery.columnsFrameSchema)
  }

  /** Attach every cataloged table into `database` of this session's
    * catalog. Schemas and locations come from the catalog table alone —
    * no listing or footer read of the data zone happens here; partitioned
    * tables additionally run partition recovery (a listing of THEIR
    * partition directories only, the MSCK contract). The collect is
    * metadata-scale (one row per table). Idempotent: CREATE TABLE IF NOT
    * EXISTS. Returns the qualified names attached. */
  def attach(spark: SparkSession, catalogPath: String,
             database: String = "default"): Seq[String] = {
    if (database != "default")
      spark.sql(s"CREATE DATABASE IF NOT EXISTS `$database`")
    val entries = read(spark, catalogPath)
      .collect().sortBy(_.getAs[String]("table_name"))
    entries.toSeq.map { e =>
      val name = e.getAs[String]("table_name")
      val qualified = s"`$database`.`$name`"
      val schema = DataType.fromJson(e.getAs[String]("schema_json"))
        .asInstanceOf[StructType]
      val parts = e.getAs[String]("partition_cols").split(",").filter(_.nonEmpty).toSeq
      spark.sql(attachDdl(qualified, schema, parts, e.getAs[String]("location")))
      if (parts.nonEmpty) spark.sql(s"MSCK REPAIR TABLE $qualified")
      qualified
    }
  }
}
