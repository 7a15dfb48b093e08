package graft.ingest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

import graft.SparkSpec

class LakeCatalogSpec extends SparkSpec {

  test("persist writes a durable catalog; a fresh session attaches and runs SQL unchanged") {
    val cat = tmpDir("graft_cat") + "/catalog"
    // crawler session: persists the catalog FILE, registers nothing
    val crawler = spark.newSession()
    val n = LakeCatalog.persist(crawler, sfDir, cat)
    assert(n >= 9, s"testdata zone should catalog all driver tables, got $n")

    // fresh session: empty temp-view namespace — every table must come
    // from the catalog file alone (the restart simulation: nothing
    // session-bound survives into `fresh`)
    val fresh = spark.newSession()
    val attached = LakeCatalog.attach(fresh, cat, database = "graft_zone")
    assert(attached.size == n)

    try {
      // the reference's SQL users run their ANSI statements unchanged
      val viaSql = fresh.sql(
        """SELECT c_nationkey, count(*) AS n_cust, round(sum(c_acctbal), 2) AS bal
          |FROM graft_zone.customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
        .collect().toSeq
      val viaDf = fresh.read.parquet(s"$sfDir/customer.parquet")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("bal"))
        .orderBy(col("c_nationkey"))
        .collect().toSeq
      assert(viaSql == viaDf)

      // the attached schema is the CATALOG's schema (no re-inference)
      val entry = LakeCatalog.read(fresh, cat)
        .where(col("table_name") === "customer").head()
      val catalogSchema = DataType.fromJson(entry.getAs[String]("schema_json"))
        .asInstanceOf[StructType]
      assert(fresh.table("graft_zone.customer").schema == catalogSchema)

      // idempotent: a second attach (new job on the same cluster) is a no-op
      assert(LakeCatalog.attach(fresh, cat, database = "graft_zone") == attached)
    } finally fresh.sql("DROP DATABASE IF EXISTS graft_zone CASCADE")
  }

  test("partitioned layouts attach with recovered partitions and prune on them") {
    val zone = tmpDir("graft_cat_zone")
    val cat = tmpDir("graft_cat2") + "/catalog"
    import spark.implicits._
    val src = Seq(
      (1L, "a", "2024-01-01"), (2L, "b", "2024-01-01"),
      (3L, "c", "2024-01-02"), (4L, "d", "2024-01-03"))
      .toDF("id", "payload", "day")
    src.write.partitionBy("day").parquet(s"$zone/events_daily")

    val crawler = spark.newSession()
    assert(LakeCatalog.persist(crawler, zone, cat) == 1)
    val entry = LakeCatalog.read(crawler, cat).head()
    assert(entry.getAs[Boolean]("is_partitioned"))
    assert(entry.getAs[String]("partition_cols") == "day")

    val fresh = spark.newSession()
    LakeCatalog.attach(fresh, cat, database = "graft_part")
    try {
      assert(fresh.sql("SELECT count(*) FROM graft_part.events_daily").head().getLong(0) == 4L)
      val pruned = fresh.sql(
        "SELECT id FROM graft_part.events_daily WHERE day = '2024-01-01' ORDER BY id")
      assert(pruned.as[Long].collect().toSeq == Seq(1L, 2L))
      // partition pruning must reach the scan: only one partition read
      val scanned = pruned.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numFiles")).map(_.value)
      assert(scanned.forall(_ <= 1), s"expected one partition's files, got $scanned")
    } finally fresh.sql("DROP DATABASE IF EXISTS graft_part CASCADE")
  }
}
