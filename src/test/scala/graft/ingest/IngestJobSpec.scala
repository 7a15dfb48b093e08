package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.{col => spark_col}

import graft.SparkSpec

/** Integration: the whole daily transformation run, twice — the second
  * run must be incremental (ledger-gated) and idempotent. */
class IngestJobSpec extends SparkSpec {

  private val configs = Map(
    "ORDERS" -> IngestJob.TableConfig(Seq("id", "amount", "day"), Seq(4, 2, 6)),
    "CUST" -> IngestJob.TableConfig(Seq("id", "name"), Seq(4, 1)))

  private def drop(dir: String, name: String, lines: String): Unit =
    Files.writeString(Paths.get(s"$dir/$name"), lines)

  test("full run: route, parse, partition, ledger; second run incremental") {
    val landing = tmpDir("ij-landing"); val storing = tmpDir("ij-storing")
    val ledger = tmpDir("ij-ledger") + "/processed"

    drop(landing, "ORDERS_20240101_080000.CSV", "1,10.5,2024-01-01\n2,20.0,2024-01-01\n")
    drop(landing, "ORDERS_20240102_080000.CSV", "3,30.0,2024-01-02\n")
    drop(landing, "CUST_20240101_090000.CSV", "7,alice\n")
    drop(landing, "UNKNOWN_20240101_080000.CSV", "x\n")  // no config
    drop(landing, "garbage.txt", "zzz\n")                   // bad name
    drop(landing, "ORDERS_20240101_230000.CSV", "1,2\n")    // wrong width

    val r1 = IngestJob.run(spark, landing, storing, ledger, configs)
    assert(r1.processed == Map("ORDERS" -> 3L, "CUST" -> 1L))
    assert(r1.skippedAsProcessed == 0)
    val fails = r1.failures.select("fname", "status").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(fails == Set(
      ("UNKNOWN_20240101_080000.CSV", FailureClassifier.OutOfConfig),
      ("garbage.txt", FailureClassifier.Irregular),
      ("ORDERS_20240101_230000.CSV", FailureClassifier.Unmatch)))
    assert(r1.processedFiles == 3 && r1.failureCounts == Map(
      FailureClassifier.OutOfConfig -> 1L, FailureClassifier.Irregular -> 1L,
      FailureClassifier.Unmatch -> 1L))

    // the failure ledger persisted with header detail (ref FAILED_TO_CONVERT)
    val led1 = FailureLedger.read(spark, s"$storing/${FailureLedger.TableName}")
    assert(led1.count() == 3)
    val unm = led1.where(spark_col("status") === FailureClassifier.Unmatch).collect()
    assert(unm.length == 1)
    val u = unm.head
    assert(u.getAs[String]("fname") == "ORDERS_20240101_230000.CSV")
    assert(u.getAs[Int]("header_cnt") == 2, "found width recorded")
    assert(u.getAs[String]("meta_header_list") == "id,amount,day")
    assert(u.getAs[Int]("meta_header_cnt") == 3, "expected width recorded")
    assert(led1.where(spark_col("status") =!= FailureClassifier.Unmatch)
      .where(spark_col("header_cnt").isNull && spark_col("meta_header_list") === "")
      .count() == 2, "non-UNMATCH rows blank the header detail")

    // storing zone: partitioned by the filename's business date
    val orders = spark.read.parquet(s"$storing/ORDERS")
    assert(orders.count() == 3)
    assert(orders.select("TRANSFERRED_DATE").distinct().count() == 2)
    assert(orders.schema("amount").dataType.typeName == "float")

    // run 2: one new file; everything else ledger-skipped
    drop(landing, "ORDERS_20240103_080000.CSV", "4,40.0,2024-01-03\n")
    val r2 = IngestJob.run(spark, landing, storing, ledger, configs)
    assert(r2.processed == Map("ORDERS" -> 1L))
    assert(r2.skippedAsProcessed == 3,
      "only the three WRITTEN round-1 files skip via the ledger")
    assert(r2.failures.count() == 3,
      "failed files are never ledgered — they reclassify until fixed or removed")
    val after = spark.read.parquet(s"$storing/ORDERS")
    assert(after.count() == 4, "day-3 file appends; days 1-2 untouched")

    // run 3: nothing new written; the three failures keep retrying
    val r3 = IngestJob.run(spark, landing, storing, ledger, configs)
    assert(r3.processed.isEmpty && r3.skippedAsProcessed == 4)
    assert(r3.failures.count() == 3)

    // a failure heals: config for UNKNOWN arrives -> the file ingests
    val healed = configs + ("UNKNOWN" -> IngestJob.TableConfig(Seq("v"), Seq(1)))
    val r4 = IngestJob.run(spark, landing, storing, ledger, healed)
    assert(r4.processed == Map("UNKNOWN" -> 1L),
      "an OUTOFCONFIG file must retry once its config lands")

    // ledger accumulated every run's failures: 3 + 3 + 3 + 2 (UNKNOWN healed)
    val led4 = FailureLedger.read(spark, s"$storing/${FailureLedger.TableName}")
    assert(led4.count() == 11, "append-only error history across runs")
    val byStatus = led4.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus == Map(
      FailureClassifier.Unmatch -> 4L, FailureClassifier.Irregular -> 4L,
      FailureClassifier.OutOfConfig -> 3L))
  }

  test("duplicated config headers reject the row; its files fail OUTOFCONFIG and retry") {
    import spark.implicits._
    val landing = tmpDir("ij3-landing"); val storing = tmpDir("ij3-storing")
    val ledger = tmpDir("ij3-ledger") + "/processed"
    def d(s: String) = java.sql.Date.valueOf(s)

    drop(landing, "ORDERS_20240110_080000.CSV", "1,10.5\n")
    drop(landing, "CUST_20240110_080000.CSV", "7,alice\n")

    // ORDERS config row has a duplicated header column (ref :222–231)
    val bad = Seq(
      ("ORDERS", d("2020-01-01"), d("9999-12-31"), "id,amount,id", "4,2,4"),
      ("CUST", d("2020-01-01"), d("9999-12-31"), "id,name", "4,1"))
      .toDF("table", "start_date", "end_date", "headers", "type_codes")
    val r1 = IngestJob.runWithConfigTable(spark, landing, storing, ledger, bad)
    assert(r1.invalidConfigTables == Seq("ORDERS"))
    assert(r1.processed == Map("CUST" -> 1L), "valid tables still ingest")
    val fails = r1.failures.select("fname", "status").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(fails == Set(("ORDERS_20240110_080000.CSV", FailureClassifier.OutOfConfig)),
      "files of the rejected config row get a queryable failure record")
    assert(r1.report.contains("DUPLICATED COLUMNS IN ENTRY: ORDERS"))

    // config fixed -> the file ingests on the next run (never ledgered)
    val good = Seq(
      ("ORDERS", d("2020-01-01"), d("9999-12-31"), "id,amount", "4,2"),
      ("CUST", d("2020-01-01"), d("9999-12-31"), "id,name", "4,1"))
      .toDF("table", "start_date", "end_date", "headers", "type_codes")
    val r2 = IngestJob.runWithConfigTable(spark, landing, storing, ledger, good)
    assert(r2.invalidConfigTables.isEmpty)
    assert(r2.processed == Map("ORDERS" -> 1L))
  }

  test("empty file flushes to the processed ledger once and never re-reports") {
    // ref DATALAKE_TRANSFORMATION_S3_DAILY_JOB.PY:314–322, the
    // 2019.06.21 "EMPTY FILES FLUSH TO PROCESSED LIST" change: a
    // zero-column file is appended to the processed list and skipped
    // forever — it must NOT classify UNMATCH and spam the failure
    // ledger on every later run.
    val landing = tmpDir("ij4-landing"); val storing = tmpDir("ij4-storing")
    val ledger = tmpDir("ij4-ledger") + "/processed"

    drop(landing, "ORDERS_20240101_080000.CSV", "1,10.5,2024-01-01\n")
    drop(landing, "ORDERS_20240102_080000.CSV", "") // empty placeholder

    val r1 = IngestJob.run(spark, landing, storing, ledger, configs)
    assert(r1.processed == Map("ORDERS" -> 1L))
    assert(r1.failures.count() == 0, "an empty file is not a failure")
    val led = spark.read.parquet(ledger).collect().map(_.getString(0)).toSet
    assert(led == Set("ORDERS_20240101_080000.CSV", "ORDERS_20240102_080000.CSV"),
      "the ledger holds both the written file AND the empty one")

    // run 2: both files ledger-skip; the empty marker never re-reports
    val r2 = IngestJob.run(spark, landing, storing, ledger, configs)
    assert(r2.skippedAsProcessed == 2)
    assert(r2.processed.isEmpty && r2.failures.count() == 0,
      "no daily failure spam from the empty marker")
  }

  test("a run with ONLY an empty file still ledgers it") {
    // regression guard for the old `if (groups.nonEmpty)` record gate:
    // with nothing written, the empty file must still be consumed once
    val landing = tmpDir("ij5-landing"); val storing = tmpDir("ij5-storing")
    val ledger = tmpDir("ij5-ledger") + "/processed"
    drop(landing, "ORDERS_20240105_080000.CSV", "")
    val r1 = IngestJob.run(spark, landing, storing, ledger, configs)
    assert(r1.processed.isEmpty && r1.failures.count() == 0)
    val r2 = IngestJob.run(spark, landing, storing, ledger, configs)
    assert(r2.skippedAsProcessed == 1, "consumed exactly once")
  }

  test("quoted field containing commas classifies OK, not UNMATCH") {
    // width measurement shares the ingest CSV parse's quote
    // conventions: `"10,5",...` is ONE field; `""` escapes stay inside
    // their field; an actually-overwide row still trips UNMATCH
    val landing = tmpDir("ij6-landing"); val storing = tmpDir("ij6-storing")
    val ledger = tmpDir("ij6-ledger") + "/processed"

    drop(landing, "CUST_20240101_080000.CSV",
      "7,\"alice, smith\"\n8,bob\n")
    drop(landing, "CUST_20240102_080000.CSV", "9,a,b\n") // genuinely 3-wide
    // doubled quotes inside a quoted field: the width check must agree
    // with the parse that this is still ONE 2-wide row
    drop(landing, "CUST_20240103_080000.CSV", "10,\"x, \"\"y\"\"\"\n")

    val r1 = IngestJob.run(spark, landing, storing, ledger, configs)
    assert(r1.processed == Map("CUST" -> 3L),
      "the quoted comma-bearing files ingest")
    val fails = r1.failures.select("fname", "status").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(fails == Set(("CUST_20240102_080000.CSV", FailureClassifier.Unmatch)),
      "real width mismatches still classify UNMATCH")
    // the quoted value parsed intact (comma inside the field) through
    // the SAME conventions the width scan measured with
    val cust = spark.read.parquet(s"$storing/CUST")
      .where(spark_col("id") === 7).select("name").collect()
    assert(cust.map(_.getString(0)).toSeq == Seq("alice, smith"))
  }

  test("RunSummary.report formats the reference's completion-mail shape") {
    import spark.implicits._
    val s = IngestJob.RunSummary(
      processed = Map("ORDERS" -> 3L), skippedAsProcessed = 2L,
      failures = Seq.empty[FailureLedger.Record].toDF(),
      processedFiles = 2L,
      failureCounts = Map(FailureClassifier.Unmatch -> 1L,
        FailureClassifier.Irregular -> 4L),
      invalidConfigTables = Nil,
      startTime = "2024-01-01 08:00:00", endTime = "2024-01-01 08:05:00")
    val r = s.report
    assert(r ==
      """DATALAKE TRANSFORMATION PROCESS COMPLETED
        |--------------------------------------------------------------------
        |  PROCESSED_FILES_NUMBERS   :   2
        |  UNMATCH_FILES_NUMBERS     :   1
        |  OUTCONFIG_FILES_NUMBERS   :   0
        |  IRREGULAR_FILES_NUMBERS   :   4
        |  JOB_STATUS                :   COMPLETED
        |  JOB_START_TIME            :   2024-01-01 08:00:00
        |  JOB_END_TIME              :   2024-01-01 08:05:00
        |--------------------------------------------------------------------
        |FOR EXCEPTION FILE DETAIL, QUERY THE FAILURE LEDGER:
        |  SELECT fname, header_cnt, meta_header_cnt, status FROM FAILED_TO_CONVERT WHERE start_exec_time >= '2024-01-01 08:00:00'""".stripMargin)
  }

  test("config table with validity windows parses a layout change in one run") {
    import spark.implicits._
    val landing = tmpDir("ij2-landing"); val storing = tmpDir("ij2-storing")
    val ledger = tmpDir("ij2-ledger") + "/processed"
    def d(s: String) = java.sql.Date.valueOf(s)

    // ORDERS layout changes on 2024-02-01: (id, amount) -> (id, amount, note)
    val config = Seq(
      ("ORDERS", d("2020-01-01"), d("2024-02-01"), "id,amount", "4,2"),
      ("ORDERS", d("2024-02-01"), d("9999-12-31"), "id,amount,note", "4,2,1"))
      .toDF("table", "start_date", "end_date", "headers", "type_codes")

    drop(landing, "ORDERS_20240115_080000.CSV", "1,10.5\n")        // old layout
    drop(landing, "ORDERS_20240215_080000.CSV", "2,20.5,rush\n")   // new layout
    drop(landing, "ORDERS_20190101_080000.CSV", "0,0.0\n")         // before any window

    val r = IngestJob.runWithConfigTable(spark, landing, storing, ledger, config)
    assert(r.processed == Map("ORDERS" -> 2L))
    val fails = r.failures.select("fname", "status").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(fails == Set(("ORDERS_20190101_080000.CSV", FailureClassifier.OutOfConfig)))

    val merged = spark.read.option("mergeSchema", "true").parquet(s"$storing/ORDERS")
    assert(merged.count() == 2)
    assert(merged.columns.toSet == Set("id", "amount", "note", "TRANSFERRED_DATE"))
    val note = merged.where($"id" === 2L).select("note").as[String].head()
    assert(note == "rush")
    assert(merged.where($"id" === 1L).select("note").head().isNullAt(0),
      "old-layout rows null-fill the new column")
  }

  test("zero-byte files skip as EMPTY; whitespace-only files classify UNMATCH") {
    // the degenerate files a real landing zone accumulates (truncated
    // uploads, heartbeat artifacts): a zero-byte marker is the
    // reference's EMPTY processed-skip (L314–322); a newline-only file
    // still has (1-wide) rows, so it is a genuine header mismatch
    val landing = tmpDir("ije-landing"); val storing = tmpDir("ije-storing")
    val ledger = tmpDir("ije-ledger") + "/processed"
    drop(landing, "ORDERS_20240101_080000.CSV", "")          // zero-byte
    drop(landing, "ORDERS_20240101_080001.CSV", "\n\n\n")    // only newlines
    drop(landing, "ORDERS_20240101_080002.CSV", "1,10.5,2024-01-01\n")
    val r = IngestJob.run(spark, landing, storing, ledger, configs)
    assert(r.processed == Map("ORDERS" -> 1L), "the healthy file still lands")
    val fails = r.failures.select("fname", "status").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(fails == Set(
      ("ORDERS_20240101_080001.CSV", FailureClassifier.Unmatch)),
      s"only the newline-only file is a failure: $fails")
    // re-run: the healthy AND the empty file skip; the UNMATCH retries
    val r2 = IngestJob.run(spark, landing, storing, ledger, configs)
    assert(r2.processed.isEmpty && r2.skippedAsProcessed == 2,
      "written + empty files ledger; failures retry by design")
  }
}
