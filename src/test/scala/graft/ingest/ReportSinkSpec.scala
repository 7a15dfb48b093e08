package graft.ingest

import java.nio.file.{Files, Paths}
import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The notification seam (ReportSink) and the connection-name resolver:
  * hooks fire with the right payloads at the right times, a throwing
  * sink never fails a run, and JDBC reads resolve credentials by name. */
class ReportSinkSpec extends SparkSpec {

  /** Records every hook invocation; optionally throws from both. */
  private final class Recorder(explode: Boolean = false) extends ReportSink {
    val completions = scala.collection.mutable.Buffer[(String, String)]()
    val failures = scala.collection.mutable.Buffer[(String, Seq[org.apache.spark.sql.Row])]()
    override def onComplete(job: String, report: String): Unit = {
      completions += ((job, report))
      if (explode) sys.error("sink transport down")
    }
    override def onFailure(job: String, detail: DataFrame): Unit = {
      failures += ((job, detail.collect().toSeq))
      if (explode) sys.error("sink transport down")
    }
  }

  private def drop(dir: String, name: String, lines: String): Unit =
    Files.writeString(Paths.get(s"$dir/$name"), lines)

  private val configs = Map(
    "ORDERS" -> IngestJob.TableConfig(Seq("id", "amount", "day"), Seq(4, 2, 6)))

  test("a clean ingest fires onComplete only; a failing one adds onFailure") {
    val landing = tmpDir("rs-landing"); val storing = tmpDir("rs-storing")
    val ledger = tmpDir("rs-ledger") + "/processed"
    drop(landing, "ORDERS_20240101_080000.CSV", "1,10.5,2024-01-01\n")
    val clean = new Recorder()
    IngestJob.run(spark, landing, storing, ledger, configs, clean)
    assert(clean.completions.map(_._1) == Seq("ingest"))
    assert(clean.completions.head._2.contains("PROCESSED_FILES_NUMBERS"))
    assert(clean.failures.isEmpty, "no failures -> no onFailure")

    // an unroutable file classifies UNMATCH -> onFailure with its row
    drop(landing, "garbage.txt", "nope\n")
    val failing = new Recorder()
    IngestJob.run(spark, landing, storing, ledger, configs, failing)
    assert(failing.completions.map(_._1) == Seq("ingest"))
    assert(failing.failures.map(_._1) == Seq("ingest"))
    val detail = failing.failures.head._2
    assert(detail.exists(_.getAs[String]("fname") == "garbage.txt"),
      s"failure detail must carry the failed file: $detail")
  }

  test("a throwing sink never fails the run") {
    val landing = tmpDir("rs2-landing"); val storing = tmpDir("rs2-storing")
    val ledger = tmpDir("rs2-ledger") + "/processed"
    drop(landing, "garbage.txt", "boom\n")
    val angry = new Recorder(explode = true)
    val summary = IngestJob.run(spark, landing, storing, ledger, configs, angry)
    assert(angry.completions.nonEmpty && angry.failures.nonEmpty,
      "both hooks attempted")
    assert(summary.failureCounts.values.sum == 1L,
      "the run completed and reported despite the sink throwing")
  }

  test("RdsSweep notifies per sweep and resolves the connection by name") {
    val url = "jdbc:derby:memory:sinkspec;create=true"
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE T1 (ID BIGINT PRIMARY KEY, NAME VARCHAR(10))")
    (1 to 3).foreach(i => st.execute(s"INSERT INTO T1 VALUES ($i, 'n$i')"))
    st.close(); conn.close()

    // the secret-store adapter: name -> (url, props); unknown names fail
    val resolver: String => (String, Properties) = {
      case "lake_rds" => (url, new Properties())
      case other => sys.error(s"no such connection: $other")
    }
    import spark.implicits._
    val config = Seq(
      ("T1", "N", null: String, null: java.lang.Long),
      ("ABSENT", "N", null: String, null: java.lang.Long))
      .toDF("TABLE", "PARTITIONED", "PARTITIONKEY", "NUM_PARTITIONS")

    // by-name single-table read
    assert(RdsIngest.read(spark, "lake_rds", resolver, "T1").count() == 3)
    intercept[RuntimeException](RdsIngest.read(spark, "nope", resolver, "T1"))

    // by-name sweep (resolver overload), then the sink-carrying run
    val dest = tmpDir("rs-sweep")
    val byName = RdsSweep.run(spark, "lake_rds", resolver, config, dest)
    assert(byName.where("status = 'ok'").count() == 1)

    val rec = new Recorder()
    val report = RdsSweep.run(spark, url, config, tmpDir("rs-sweep2"),
      new Properties(), rec)
    assert(report.count() == 2)
    assert(rec.completions.map(_._1) == Seq("rds_sweep"))
    assert(rec.completions.head._2.contains("T1: ok"))
    assert(rec.failures.map(_._1) == Seq("rds_sweep"))
    assert(rec.failures.head._2.map(_.getAs[String]("table_name")) == Seq("ABSENT"),
      "onFailure carries exactly the failed legs")
  }

  test("DailyRun notifies once on the composed day") {
    val landing = tmpDir("rs3-landing"); val storing = tmpDir("rs3-storing")
    val ledger = tmpDir("rs3-ledger") + "/processed"
    val publish = tmpDir("rs3-publish"); val user = tmpDir("rs3-user")
    val catalog = tmpDir("rs3-catalog") + "/catalog"
    drop(landing, "ORDERS_20240101_080000.CSV", "1,10.5,2024-01-01\n")
    val rec = new Recorder()
    val day = DailyRun.run(spark, landing, storing, ledger, configs,
      publish, user, catalog, rec)
    assert(day.ok)
    // the inner ingest leg got no sink — exactly ONE notification, the
    // orchestration-level one
    assert(rec.completions.map(_._1) == Seq("daily_run"))
    assert(rec.completions.head._2.contains("ingest: ok"))
    assert(rec.failures.isEmpty)
  }
}
