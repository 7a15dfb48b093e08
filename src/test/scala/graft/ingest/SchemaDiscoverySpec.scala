package graft.ingest

import org.apache.spark.sql.types._

import graft.SparkSpec

class SchemaDiscoverySpec extends SparkSpec {
  import spark.implicits._

  test("crawl finds tables by listing, including partitioned layouts") {
    val zone = tmpDir("crawler-zone")
    Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-02"))
      .toDF("id", "v", "TRANSFERRED_DATE")
      .write.parquet(s"$zone/alpha.parquet")
    Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-02"))
      .toDF("id", "v", "TRANSFERRED_DATE")
      .write.partitionBy("TRANSFERRED_DATE").parquet(s"$zone/beta")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$zone/_manifest.json"), "{}")

    val found = SchemaDiscovery.crawl(zone)
    assert(found.map(_.name) == Seq("alpha", "beta"),
      "tables come from the listing (no catalog), metadata files skipped")
    assert(found.find(_.name == "alpha").get.partitionCols.isEmpty)
    assert(found.find(_.name == "beta").get.partitionCols == Seq("TRANSFERRED_DATE"))
  }

  test("backupDdl sweeps zones into a timestamped prefix, isolating bad tables") {
    val zoneA = tmpDir("ddl-zone-a")
    val zoneB = tmpDir("ddl-zone-b")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$zoneA/good_a.parquet")
    Seq((2L, "b", "2024-01-01")).toDF("id", "v", "TRANSFERRED_DATE")
      .write.partitionBy("TRANSFERRED_DATE").parquet(s"$zoneA/part_a")
    Seq((3L, "c")).toDF("id", "v").write.parquet(s"$zoneB/good_b.parquet")
    // a table directory that is not parquet — must fail alone
    val bad = java.nio.file.Paths.get(s"$zoneB/broken.parquet")
    java.nio.file.Files.createDirectory(bad)
    java.nio.file.Files.writeString(bad.resolve("part-0.parquet"), "not parquet")

    val root = tmpDir("ddl-backup")
    val report = SchemaDiscovery.backupDdl(spark,
        Seq("za" -> zoneA, "zb" -> zoneB), root, "20240101_090000")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(report.contains(("za", "good_a", "ok")))
    assert(report.contains(("za", "part_a", "ok")))
    assert(report.contains(("zb", "good_b", "ok")))
    assert(report.exists { case (z, t, s) => z == "zb" && t == "broken" && s == "failed" },
      s"the unreadable table must fail alone: $report")
    // both zones' surviving DDL landed under the timestamped prefix
    val za = spark.read.parquet(s"$root/ddl_20240101_090000/za")
      .as[(String, String)].collect().toMap
    assert(za.keySet == Set("good_a", "part_a"))
    assert(za("part_a").contains("PARTITIONED BY") && za("good_a").contains("CREATE"))
    val zb = spark.read.parquet(s"$root/ddl_20240101_090000/zb")
      .as[(String, String)].collect().toMap
    assert(zb.keySet == Set("good_b"), "the broken table is absent, not fatal")
    // a backup never clobbers an earlier one (same timestamp refuses)
    assertThrows[Exception](SchemaDiscovery.backupDdl(spark,
      Seq("za" -> zoneA), root, "20240101_090000"))
  }

  test("discover emits one row per column with inferred types and partition flags") {
    val zone = tmpDir("crawler-zone2")
    Seq((1L, 1.5, "2024-01-01")).toDF("id", "amt", "TRANSFERRED_DATE")
      .write.partitionBy("TRANSFERRED_DATE").parquet(s"$zone/orders")
    val d = SchemaDiscovery.discover(spark, zone).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(3), r.getBoolean(5)))
    assert(d.contains(("orders", "id", "bigint", false)))
    assert(d.contains(("orders", "amt", "double", false)))
    val part = d.find(_._2 == "TRANSFERRED_DATE").get
    assert(part._4, "partition column flagged")
  }

  test("discover over the testdata zone needs no table list") {
    val d = SchemaDiscovery.discover(spark, sfDir)
    val rows = d.collect().map(r => (r.getString(0), r.getString(1), r.getString(3)))
    assert(rows.contains(("region", "r_regionkey", "int")))
    assert(rows.contains(("region", "r_name", "string")))
    assert(rows.map(_._1).distinct.length == 10, "all ten testdata tables crawled")
  }

  test("B9/B10 discover a table outside the catalog plus a partitioned layout") {
    val b9 = SchemaDiscovery.metaSchemaDiscovery(spark, sfDir).collect()
    val tables = b9.map(_.getString(0)).distinct.toSet
    assert(tables.contains("daily_totals"), "table not in any hardcoded list")
    assert(tables.contains("events_daily"))
    assert(b9.exists(r => r.getString(0) == "events_daily" &&
      r.getString(1) == "TRANSFERRED_DATE" && r.getBoolean(5)))

    val b10 = SchemaDiscovery.metaDdlExport(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(b10("events_daily").contains("PARTITIONED BY (TRANSFERRED_DATE"))
    assert(!b10("events_daily").matches("(?s).*\\(\n[^)]*TRANSFERRED_DATE[^)]*\n\\).*"),
      "partition column must not also appear in the column list")
    assert(b10("daily_totals").contains("USING parquet"))
    assert(!b10("daily_totals").contains("PARTITIONED BY"))
  }

  test("ddlFor renders types, nullability and typed partitioning") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("day", StringType)))
    val ddl = SchemaDiscovery.ddlFor("t1", schema, Seq("day"))
    assert(ddl.contains("CREATE TABLE t1"))
    assert(ddl.contains("id bigint NOT NULL"))
    assert(ddl.contains("USING parquet"))
    assert(ddl.contains("PARTITIONED BY (day string)"))
    assert(!ddl.contains("  day string"), "partition col lives only in PARTITIONED BY")
  }

  test("schemaDrift diffs two REAL evolved zones column by column") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val v1 = tmpDir("zone-v1"); val v2 = tmpDir("zone-v2")
    // v1: orders(id, amount int, note) + a stable table
    Seq((1L, 10, "a")).toDF("id", "amount", "note")
      .write.parquet(s"$v1/orders.parquet")
    Seq((1L, "x")).toDF("id", "tag").write.parquet(s"$v1/stable.parquet")
    // v2: amount WIDENED to bigint, note DROPPED, day ADDED; stable untouched
    Seq((1L, 10L, "2024-01-01")).toDF("id", "amount", "day")
      .write.parquet(s"$v2/orders.parquet")
    Seq((1L, "x")).toDF("id", "tag").write.parquet(s"$v2/stable.parquet")

    val drift = SchemaDiscovery.schemaDrift(
        SchemaDiscovery.discover(spark, v1), SchemaDiscovery.discover(spark, v2))
      .select("table_name", "column_name", "change")
      .as[(String, String, String)].collect().toSet
    assert(drift == Set(
      ("orders", "amount", "type_changed"),
      ("orders", "note", "removed"),
      ("orders", "day", "added")),
      s"exactly the planted drift, nothing from the stable table: $drift")
  }

  test("B14 query face reports exactly the planted contract breaks") {
    import spark.implicits._
    val got = SchemaDiscovery.metaSchemaDrift(spark, sfDir)
      .select("table_name", "column_name", "change")
      .as[(String, String, String)].collect().toSet
    assert(got == Set(
      ("events", "props", "removed"),
      ("events", "user_id", "type_changed"),
      ("events", "ingest_ts", "added")), s"$got")
  }
}
