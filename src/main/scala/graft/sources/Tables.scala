package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storing-zone read path: thin, pushdown-friendly parquet catalog.
  *
  * The reference reads cataloged parquet through Glue/Athena
  * (DATALAKE_TRANSFORMATION_S3_DAILY_JOB.PY:240 reads back parquet with
  * mergeSchema; RUN_CRAWLER_JOB.PY catalogs it). Here a table is simply
  * `{zone}/{name}.parquet`; Catalyst handles column pruning and filter
  * pushdown to the scan, which is what makes the 100 TB case work — no
  * driver-side file listing loops like the reference's boto3 walk.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables whose `ts` column is parquet TIMESTAMP(NANOS) in the driver
    * testdata. The ns→µs normalization is scoped to this set so a future
    * table with a genuine BIGINT column named `ts` is left untouched. */
  private val nanosTsTables = Set("events")

  def apply(spark: SparkSession, zoneDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$zoneDir/$name.parquet")
    if (nanosTsTables(name)) normalizeNanos(df) else df
  }

  /** Register every lake table as a temp view, making the zone a plain
    * `spark.sql` catalog — the migration path for the reference's users,
    * whose query surface IS SQL (Athena/Presto over the cataloged
    * storing zone, README.md step 7): point this at the zone and their
    * ANSI SQL runs on Spark unchanged. SqlCatalogSpec proves several of
    * the oracle queries verbatim-equal to the DataFrame faces. */
  def registerAll(spark: SparkSession, zoneDir: String): Unit =
    all.foreach(n => apply(spark, zoneDir, n).createOrReplaceTempView(n))

  /** Parquet TIMESTAMP(NANOS) columns arrive as BIGINT epoch-nanos under
    * `spark.sql.legacy.parquet.nanosAsLong=true` (Spark has no ns
    * timestamp type). Normalize them back to µs TimestampType so every
    * downstream operator sees one timestamp type. (Integer division is
    * fine here: the testdata carries no pre-1970 timestamps, where
    * truncation toward zero would differ from flooring.) */
  private def normalizeNanos(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.LongType
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case None => df
    }
  }

  /** mergeSchema read: the reference's layout-changed merge path
    * (DATALAKE_TRANSFORMATION_S3_DAILY_JOB.PY:240). */
  def mergedSchema(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
