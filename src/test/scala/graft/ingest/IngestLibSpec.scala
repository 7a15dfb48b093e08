package graft.ingest

import graft.SparkSpec

/** Library-module invariants: Ledger, CsvIngest, SchemaEvolution,
  * ZoneSync, Watermark — the write/plan paths not exercised by the
  * oracle-checked queries. */
class IngestLibSpec extends SparkSpec {
  import spark.implicits._

  test("Ledger.record + pending round-trip") {
    val ledgerPath = tmpDir("ledger") + "/keys"
    val all = Seq("f1", "f2", "f3", "f4").toDF("key")
    Ledger.record(Seq("f1", "f3").toDF("key"), "key", ledgerPath)
    val processed = spark.read.parquet(ledgerPath)
    val pending = Ledger.pending(all, processed, "key").as[String].collect().toSet
    assert(pending == Set("f2", "f4"))
    // append more processed keys; pending shrinks
    Ledger.record(Seq("f2").toDF("key"), "key", ledgerPath)
    val p2 = Ledger.pending(all, spark.read.parquet(ledgerPath), "key")
      .as[String].collect().toSet
    assert(p2 == Set("f4"))
  }

  test("meta_expectations: every planted violation class fires with exact counts") {
    import org.apache.spark.sql.functions._
    val rows = IngestQueries.metaExpectations(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet == Set("pk_orders_unique", "fk_lineitem_orders",
      "fk_orders_customer", "dom_discount_range", "dom_quantity_positive",
      "dom_customer_name"))
    // every planted class must actually fire — an all-zero gate is vacuous
    rows.foreach { case (c, (v, t0)) =>
      assert(v > 0, s"$c found no violations"); assert(v < t0, s"$c flagged everything")
    }
    // exact recounts for the two join-shaped checks
    val keys = graft.sources.Tables(spark, sfDir, "orders")
      .select(col("o_orderkey")).as[Long].collect().toSet
    val landed = keys.filter(_ % 107 != 0)
    assert(rows("pk_orders_unique")._1 == landed.count(_ % 101 == 0).toLong)
    val liOrphans = graft.sources.Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey")).as[Long].collect()
      .count(k => !landed.contains(k)).toLong
    assert(rows("fk_lineitem_orders")._1 == liOrphans)
  }

  test("CsvIngest.readCsv applies headers and the type dictionary") {
    val dir = tmpDir("csv")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part.csv"), "1,hello,2024-01-02\n2,world,2024-02-03\n")
    val df = CsvIngest.readCsv(spark, dir, Seq("id", "name", "day"), Seq(4, 1, 6))
    assert(df.schema.map(f => f.name -> f.dataType.sql).toSeq ==
      Seq("id" -> "BIGINT", "name" -> "STRING", "day" -> "DATE"))
    val r = df.orderBy("id").collect()
    assert(r.length == 2 && r(0).getLong(0) == 1L && r(0).getString(1) == "hello")
  }

  test("CsvIngest.configFor picks the layout live on the file date") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val config = Seq(
      ("orders", d("2020-01-01"), d("2023-01-01"), "v1"),
      ("orders", d("2023-01-01"), d("9999-12-31"), "v2"),
      ("other", d("2020-01-01"), d("9999-12-31"), "x")
    ).toDF("table", "start_date", "end_date", "layout")
    assert(CsvIngest.configFor(config, "orders", d("2022-06-15"))
      .select("layout").as[String].collect().toSeq == Seq("v1"))
    assert(CsvIngest.configFor(config, "orders", d("2023-01-01"))
      .select("layout").as[String].collect().toSeq == Seq("v2"),
      "END date is exclusive, START inclusive (ref L295)")
    assert(CsvIngest.configFor(config, "orders", d("2019-12-31")).count() == 0)
  }

  test("CsvIngest rejects header/type-count mismatches") {
    val df = Seq(("1", "x")).toDF("a", "b")
    assertThrows[IllegalArgumentException](CsvIngest.withHeaders(df, Seq("only_one")))
    assertThrows[IllegalArgumentException](CsvIngest.castByTypeList(df, Seq(4)))
  }

  test("SchemaEvolution.mergeLayouts null-fills missing columns") {
    val oldL = Seq((1L, 9.0)).toDF("k", "v")
    val newL = Seq((2L, 8.0, "p")).toDF("k", "v", "extra")
    val merged = SchemaEvolution.mergeLayouts(Seq(oldL, newL))
    assert(merged.columns.toSet == Set("k", "v", "extra"))
    assert(merged.where("extra IS NULL").count() == 1)
    assertThrows[IllegalArgumentException](SchemaEvolution.mergeLayouts(Nil))
  }

  test("ZoneSync.plan splits copy/delete disjointly") {
    val src = Seq("a", "b", "c").toDF("key")
    val dst = Seq("b", "c", "d").toDF("key")
    val p = ZoneSync.plan(src, dst, "key")
    assert(p.toCopy.as[String].collect().toSet == Set("a"))
    assert(p.toDelete.as[String].collect().toSet == Set("d"))
  }

  test("ZoneSync.execute streams the apply: missing+changed copied, dest-only deleted, idempotent") {
    import java.nio.file.{Files, Paths}
    val src = tmpDir("zs-src"); val dst = tmpDir("zs-dst")
    Files.writeString(Paths.get(s"$src/a.parquet"), "aaaa")
    Files.createDirectories(Paths.get(s"$src/sub"))
    Files.writeString(Paths.get(s"$src/sub/b.parquet"), "bbbb")
    Files.writeString(Paths.get(s"$src/c.parquet"), "cc")
    Files.writeString(Paths.get(s"$dst/c.parquet"), "stale-longer") // same key, new size
    Files.writeString(Paths.get(s"$dst/gone.parquet"), "zz")        // dest-only
    val (copied, deleted) = ZoneSync.execute(spark, src, dst)
    assert((copied, deleted) == ((3L, 1L)), s"got ($copied, $deleted)")
    assert(Files.readString(Paths.get(s"$dst/c.parquet")) == "cc")
    assert(Files.readString(Paths.get(s"$dst/sub/b.parquet")) == "bbbb")
    assert(!Files.exists(Paths.get(s"$dst/gone.parquet")))
    // second run finds the zones converged
    assert(ZoneSync.execute(spark, src, dst) == ((0L, 0L)))
  }

  test("Watermark.newerThanMax keeps only rows above the ingested max") {
    val source = Seq(1L, 5L, 9L, 12L).toDF("k")
    val ingested = Seq(1L, 5L).toDF("k")
    assert(Watermark.newerThanMax(source, ingested, "k")
      .as[Long].collect().toSet == Set(9L, 12L))
  }

  test("Watermark.newerThanMax first run (empty ingested) keeps everything") {
    // the reference's literal `key > (SELECT max(key)...)` silently
    // returns ZERO rows against an empty catalog (null comparison) —
    // a library caller's day one must ingest the full source instead
    val source = Seq(1L, 5L, 9L).toDF("k")
    val ingested = Seq.empty[Long].toDF("k")
    assert(Watermark.newerThanMax(source, ingested, "k")
      .as[Long].collect().toSet == Set(1L, 5L, 9L),
      "an empty standing table means first run, not 'nothing is newer'")
  }

  test("Watermark.fullRefresh replaces the destination snapshot") {
    val dst = tmpDir("refresh") + "/table"
    Watermark.fullRefresh(Seq(1L, 2L).toDF("k"), dst)
    Watermark.fullRefresh(Seq(7L).toDF("k"), dst)
    assert(spark.read.parquet(dst).as[Long].collect().toSeq == Seq(7L))
  }

  test("ZoneSync.backupConfig snapshots config and refuses to clobber") {
    val root = tmpDir("confbak")
    val config = Seq(("orders", "g1", "daily")).toDF("table", "group", "feq")
    val dest = ZoneSync.backupConfig(config, root, "20240101_120000")
    assert(dest == s"$root/conf_20240101_120000")
    assert(spark.read.parquet(dest).count() == 1)
    // same timestamp again must fail rather than overwrite a backup
    assertThrows[Exception](ZoneSync.backupConfig(config, root, "20240101_120000"))
  }

  test("ZoneSync.userZonePath mirrors the reference layout") {
    assert(ZoneSync.userZonePath("bkt", "data", "g1", "daily", "orders") ==
      "bkt/data/g1/daily/orders")
  }

  test("FilenameRouter parses the reference filename convention") {
    val files = Seq("ORDERS_20240102_153000.CSV.GZ", "garbage.txt").toDF("fname")
    val routed = FilenameRouter.route(files)
      .select("fname", "table_name", "route_status").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(routed.exists { case (f, t, s) => f.startsWith("ORDERS") && t == "ORDERS" && s == "OK" })
    assert(routed.exists { case (f, _, s) => f == "garbage.txt" && s == "IRREGULAR" })
  }
}
