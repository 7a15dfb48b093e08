package graft.ingest

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Integration: the orchestrated daily pipeline over two consecutive
  * days (plus a third with an induced mid-pipeline failure), asserting
  * each zone's state after every day. */
class DailyRunSpec extends SparkSpec {

  private val configs = Map(
    "ORDERS" -> IngestJob.TableConfig(Seq("id", "amount", "day"), Seq(4, 2, 6)),
    "CUST" -> IngestJob.TableConfig(Seq("id", "name"), Seq(4, 1)))

  private def drop(dir: String, name: String, lines: String): Unit =
    Files.writeString(Paths.get(s"$dir/$name"), lines)

  private def rel(root: String): Set[String] = {
    def walk(f: java.io.File, prefix: String): Seq[String] =
      Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap { c =>
        val p = if (prefix.isEmpty) c.getName else s"$prefix/${c.getName}"
        if (c.isDirectory) walk(c, p) else Seq(p)
      }
    walk(new java.io.File(root), "").toSet
  }

  test("two consecutive days: ingest → publish → sync → catalog, zones verified") {
    val landing = tmpDir("dr-landing"); val storing = tmpDir("dr-storing")
    val ledger = tmpDir("dr-ledger") + "/processed"
    val publish = tmpDir("dr-publish"); val user = tmpDir("dr-user")
    val catalog = tmpDir("dr-catalog") + "/catalog"

    // ---- day 1
    drop(landing, "ORDERS_20240101_080000.CSV", "1,10.5,2024-01-01\n2,20.0,2024-01-01\n")
    drop(landing, "CUST_20240101_090000.CSV", "7,alice\n")
    val d1 = DailyRun.run(spark, landing, storing, ledger, configs, publish, user, catalog)
    assert(d1.ok, s"day 1 must be clean: ${d1.failed}")
    assert(d1.ingest.get.processed == Map("ORDERS" -> 2L, "CUST" -> 1L))
    assert(d1.snapshots == Map("ORDERS" -> 1L, "CUST" -> 1L))
    assert(Snapshots.read(spark, s"$publish/ORDERS").count() == 2)
    // user zone mirrors the storing zone file-for-file
    assert(rel(s"$user/ORDERS") == rel(s"$storing/ORDERS"))
    assert(rel(s"$user/CUST") == rel(s"$storing/CUST"))
    assert(d1.cataloged == 2)
    // the persistent catalog serves SQL over the user zone in a fresh session
    val fresh = spark.newSession()
    LakeCatalog.attach(fresh, catalog, database = "graft_daily")
    try {
      assert(fresh.sql("SELECT count(*) FROM graft_daily.ORDERS").head().getLong(0) == 2)
      assert(fresh.sql("SELECT count(*) FROM graft_daily.CUST").head().getLong(0) == 1)
    } finally fresh.sql("DROP DATABASE IF EXISTS graft_daily CASCADE")

    // ---- day 2: one new ORDERS file; CUST unchanged
    drop(landing, "ORDERS_20240102_080000.CSV", "3,30.0,2024-01-02\n")
    val d2 = DailyRun.run(spark, landing, storing, ledger, configs, publish, user, catalog)
    assert(d2.ok, s"day 2 must be clean: ${d2.failed}")
    assert(d2.ingest.get.processed == Map("ORDERS" -> 1L))
    assert(d2.ingest.get.skippedAsProcessed == 2, "day-1 files ledger-skip")
    assert(d2.snapshots == Map("ORDERS" -> 2L, "CUST" -> 2L))
    assert(Snapshots.read(spark, s"$publish/ORDERS").count() == 3)
    // time travel: day 1's published version still reads as day 1
    assert(Snapshots.read(spark, s"$publish/ORDERS", version = Some(1L)).count() == 2)
    // sync moved only the changed files: CUST was untouched upstream
    assert(d2.synced("CUST") == ((0L, 0L)), s"unchanged table re-synced: ${d2.synced}")
    val (copied, _) = d2.synced("ORDERS")
    assert(copied >= 1 && copied < rel(s"$storing/ORDERS").size,
      s"sync must copy the new day's files only (copied=$copied)")
    assert(rel(s"$user/ORDERS") == rel(s"$storing/ORDERS"))
    assert(spark.read.parquet(s"$user/ORDERS").count() == 3)

    // ---- day 3: induced sync failure on ORDERS; the rest of the day proceeds
    FsUtil.deleteRecursively(new java.io.File(s"$user/ORDERS"))
    Files.writeString(Paths.get(s"$user/ORDERS"), "not a directory")
    drop(landing, "CUST_20240103_090000.CSV", "8,bob\n")
    val d3 = DailyRun.run(spark, landing, storing, ledger, configs, publish, user, catalog)
    assert(!d3.ok)
    assert(d3.failed.map(_.name) == Seq("sync:ORDERS"), s"only the broken leg fails: ${d3.failed}")
    assert(d3.ingest.get.processed == Map("CUST" -> 1L), "ingest leg unaffected")
    assert(d3.snapshots == Map("ORDERS" -> 3L, "CUST" -> 3L), "publish legs unaffected")
    assert(d3.synced.keySet == Set("CUST"), "the healthy sync leg completed")
    assert(spark.read.parquet(s"$user/CUST").count() == 2)
    // report frame is queryable
    val rep = d3.reportFrame(spark)
    assert(rep.where(org.apache.spark.sql.functions.col("status") === "failed").count() == 1)
  }

  test("value-audit legs gate promotion on the A39 fence, isolated per leg") {
    val landing = tmpDir("dra-landing"); val storing = tmpDir("dra-storing")
    val ledger = tmpDir("dra-ledger") + "/processed"
    val publish = tmpDir("dra-publish"); val user = tmpDir("dra-user")
    val catalog = tmpDir("dra-catalog") + "/catalog"

    // day 1: well-behaved amounts -> audit leg ok
    drop(landing, "ORDERS_20240101_080000.CSV",
      (1 to 20).map(i => s"$i,${10 + i % 3}.0,2024-01-01").mkString("\n") + "\n")
    val d1 = DailyRun.run(spark, landing, storing, ledger, configs, publish, user,
      catalog, valueAudits = Seq(("ORDERS", "amount")))
    assert(d1.ok, s"clean day must pass its audit: ${d1.failed}")
    val audit1 = d1.legs.find(_.name == "audit:ORDERS.amount").get
    assert(audit1.status == "ok" && audit1.detail.contains("anomalies=0"))

    // day 2: a mis-scaled feed (cents-vs-dollars on a few rows) -> the
    // audit leg fails with the rate in its error; every OTHER leg of the
    // day still completes (per-leg isolation)
    drop(landing, "ORDERS_20240102_080000.CSV",
      "21,1200.0,2024-01-02\n22,9900.0,2024-01-02\n23,11.0,2024-01-02\n")
    val d2 = DailyRun.run(spark, landing, storing, ledger, configs, publish, user,
      catalog, valueAudits = Seq(("ORDERS", "amount")))
    assert(!d2.ok)
    assert(d2.failed.map(_.name) == Seq("audit:ORDERS.amount"),
      s"only the audit leg may fail: ${d2.failed}")
    assert(d2.failed.head.error.get.contains("anomaly_bp="))
    assert(d2.snapshots.contains("ORDERS") && d2.cataloged == 1,
      "publish/sync/catalog legs must complete despite the failed audit")
  }

  test("schema-drift leg: catalog-vs-zone breaks are reported, optionally gating") {
    import spark.implicits._
    val landing = tmpDir("drs-landing"); val storing = tmpDir("drs-storing")
    val ledger = tmpDir("drs-ledger") + "/processed"
    val publish = tmpDir("drs-publish"); val user = tmpDir("drs-user")
    val catalog = tmpDir("drs-catalog") + "/catalog"

    drop(landing, "ORDERS_20240101_080000.CSV", "1,10.5,2024-01-01\n")
    val d1 = DailyRun.run(spark, landing, storing, ledger, configs, publish, user, catalog)
    assert(d1.ok)
    assert(d1.legs.find(_.name == "schema_drift").get.detail.contains("first run"),
      "no prior catalog is a defined first-run outcome")

    // a table the catalog never promised appears in the user zone
    Seq((1L, "x")).toDF("id", "tag").write.parquet(s"$user/SURPRISE")
    val d2 = DailyRun.run(spark, landing, storing, ledger, configs, publish, user, catalog)
    assert(d2.ok, s"default posture reports, never gates: ${d2.failed}")
    val leg2 = d2.legs.find(_.name == "schema_drift").get
    assert(leg2.detail.contains("drifted=2") && leg2.detail.contains("added=2"),
      s"the surprise table's two columns must read as added: $leg2")
    assert(d2.cataloged == 2, "the crawler then re-catalogs the zone, surprise included")

    // day 3: the surprise table vanishes; the HARD gate fails its leg
    // (removed columns), every other leg still completes, and the
    // catalog refresh is WITHHELD so the drift baseline survives
    FsUtil.deleteRecursively(new java.io.File(s"$user/SURPRISE"))
    drop(landing, "ORDERS_20240103_080000.CSV", "2,11.0,2024-01-03\n")
    val d3 = DailyRun.run(spark, landing, storing, ledger, configs, publish, user,
      catalog, failOnSchemaDrift = true)
    assert(d3.failed.map(_.name) == Seq("schema_drift"), s"${d3.failed}")
    assert(d3.failed.head.error.get.contains("removed=2"))
    assert(d3.cataloged == 0 &&
      d3.legs.find(_.name == "catalog").get.status == "skipped",
      "the tripped gate withholds the catalog refresh")

    // day 4: NOTHING acknowledged — the same gate must trip again (the
    // break can't alarm once and silently self-clear)
    val d4 = DailyRun.run(spark, landing, storing, ledger, configs, publish, user,
      catalog, failOnSchemaDrift = true)
    assert(d4.failed.map(_.name) == Seq("schema_drift"),
      s"unacknowledged drift keeps reporting: ${d4.failed}")

    // day 5: the operator acknowledges by running report-only — the
    // drift is reported one last time and the catalog re-baselines
    val d5 = DailyRun.run(spark, landing, storing, ledger, configs, publish, user,
      catalog)
    assert(d5.ok, s"report-only acknowledgment run: ${d5.failed}")
    assert(d5.legs.find(_.name == "schema_drift").get.detail.contains("removed=2"))
    assert(d5.cataloged == 1, "acknowledgment re-baselines the catalog")

    // day 6: baseline caught up — the hard gate passes again
    val d6 = DailyRun.run(spark, landing, storing, ledger, configs, publish, user,
      catalog, failOnSchemaDrift = true)
    assert(d6.ok, s"steady state must pass the hard gate: ${d6.failed}")
    assert(d6.legs.find(_.name == "schema_drift").get.detail == "no drift")
  }

  test("a present-but-unreadable catalog fails the drift leg and is preserved") {
    import java.nio.file.{Files, Paths}
    val landing = tmpDir("drc-landing"); val storing = tmpDir("drc-storing")
    val ledger = tmpDir("drc-ledger") + "/processed"
    val publish = tmpDir("drc-publish"); val user = tmpDir("drc-user")
    val catalog = tmpDir("drc-catalog") + "/catalog"

    // corruption stand-in: a garbage FILE where the catalog parquet
    // directory should be — readable-path checks pass, the read throws
    Files.writeString(Paths.get(catalog), "not parquet")
    drop(landing, "ORDERS_20240101_080000.CSV", "1,10.5,2024-01-01\n")
    val d = DailyRun.run(spark, landing, storing, ledger, configs, publish, user, catalog)
    assert(d.failed.map(_.name) == Seq("schema_drift"),
      s"corruption must NOT read as a first run: ${d.legs}")
    assert(d.legs.find(_.name == "catalog").get.status == "skipped",
      "the refresh is withheld so the corrupt bytes stay recoverable")
    assert(new String(Files.readAllBytes(Paths.get(catalog))) == "not parquet",
      "evidence preserved on disk")
  }
}
