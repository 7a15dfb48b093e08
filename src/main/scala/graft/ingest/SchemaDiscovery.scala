package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Crawler + DDL-backup equivalents (SURVEY §2.B B9/B10).
  *
  * The reference runs Glue crawlers to infer lake schemas
  * (RUN_CRAWLER_JOB.PY:35–84 — start_crawler/poll/catalog loop) and weekly
  * exports `SHOW CREATE TABLE` DDL for every cataloged table
  * (OUTPUT_METADATA_DDL_WEEKLY_JOB.PY:51–79).
  *
  * Spark-first: "crawling" is parquet footer reads — a metadata operation
  * over table *paths* (O(tables), not O(data)), so a driver-side loop over
  * the catalog is the right scale shape; each footer read costs one small
  * ranged request regardless of table size. DDL generation is pure
  * schema-to-string.
  */
object SchemaDiscovery {

  private val columnsSchema = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("column_name", StringType, nullable = false),
    StructField("ordinal", IntegerType, nullable = false),
    StructField("data_type", StringType, nullable = false),
    StructField("nullable", BooleanType, nullable = false)))

  /** Infer every table's schema under `zoneDir` → one row per column. */
  def discover(spark: SparkSession, zoneDir: String,
               tables: Seq[String] = Tables.all): DataFrame = {
    val rows = tables.flatMap { t =>
      val schema = spark.read.parquet(s"$zoneDir/$t.parquet").schema
      schema.fields.zipWithIndex.map { case (f, i) =>
        Row(t, f.name, i, f.dataType.sql.toLowerCase, f.nullable)
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), columnsSchema)
  }

  /** Spark SQL DDL for one table (the `SHOW CREATE TABLE` shape). */
  def ddlFor(table: String, schema: StructType,
             partitionCols: Seq[String] = Nil): String = {
    val cols = schema.fields
      .map(f => s"  ${f.name} ${f.dataType.sql.toLowerCase}" +
        (if (f.nullable) "" else " NOT NULL"))
      .mkString(",\n")
    val partClause =
      if (partitionCols.isEmpty) ""
      else s"\nPARTITIONED BY (${partitionCols.mkString(", ")})"
    s"CREATE TABLE $table (\n$cols\n)\nUSING parquet$partClause"
  }

  /** DDL export for every table under `zoneDir` → (table_name, ddl). */
  def exportDdl(spark: SparkSession, zoneDir: String,
                tables: Seq[String] = Tables.all): DataFrame = {
    val rows = tables.map { t =>
      Row(t, ddlFor(t, spark.read.parquet(s"$zoneDir/$t.parquet").schema))
    }
    val schema = StructType(Seq(
      StructField("table_name", StringType, nullable = false),
      StructField("ddl", StringType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** B9 query: schema discovery rows, deterministically ordered. */
  def metaSchemaDiscovery(s: SparkSession, dir: String): DataFrame =
    discover(s, dir).orderBy("table_name", "ordinal")

  /** B10 query: DDL export rows, deterministically ordered. */
  def metaDdlExport(s: SparkSession, dir: String): DataFrame =
    exportDdl(s, dir).orderBy("table_name")
}
