package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The reference's orchestrated daily pipeline as ONE composition — what
  * Step Functions chains across jobs (reference README architecture:
  * transformation → sync → crawler; ThreadPool fan-outs at
  * DATALAKE_TRANSFORMATION_S3_DAILY_JOB.PY:392 and SYNC_..._JOB.PY:119):
  *
  *   1. `ingest`      — the landing→storing transformation run
  *                      ([[IngestJob.run]]: route, ledger gate, parse,
  *                      partitioned write, failure ledger);
  *   2. `publish:<t>` — snapshot-commit each storing table
  *                      ([[Snapshots.write]], append=false): the day's
  *                      consistent, time-travelable version — readers
  *                      never see the half-written day;
  *   3. `sync:<t>`    — storing→user zone `sync --delete` execution
  *                      ([[ZoneSync.execute]]);
  *   4. `catalog`     — crawler refresh of the user zone into the
  *                      persistent catalog ([[LakeCatalog.persist]]).
  *
  * PER-LEG FAILURE ISOLATION, the Step Functions catch-per-state
  * semantics: each leg (and each table within the publish/sync legs)
  * try/catches into a [[Leg]] record and the day continues — one broken
  * table must not hold the rest of the lake a day behind. The legs frame
  * is the run's queryable report, alongside [[IngestJob.RunSummary]]'s
  * failure ledger.
  */
object DailyRun {

  final case class Leg(name: String, status: String, detail: String, error: Option[String])

  final case class DayResult(
      legs: Seq[Leg],
      ingest: Option[IngestJob.RunSummary],
      snapshots: Map[String, Long],          // table -> committed version
      synced: Map[String, (Long, Long)],     // table -> (copied, deleted)
      cataloged: Int) {
    def ok: Boolean = legs.forall(_.status == "ok")
    def failed: Seq[Leg] = legs.filter(_.status == "failed")
    def reportFrame(spark: SparkSession): DataFrame = {
      val schema = StructType(Seq(
        StructField("leg", StringType, nullable = false),
        StructField("status", StringType, nullable = false),
        StructField("detail", StringType, nullable = false),
        StructField("error", StringType, nullable = true)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          legs.map(l => Row(l.name, l.status, l.detail, l.error.orNull)), 1),
        schema)
    }
  }

  private def attempt[A](name: String, legs: scala.collection.mutable.Buffer[Leg])
                        (body: => (String, A)): Option[A] =
    try {
      val (detail, a) = body
      legs += Leg(name, "ok", detail, None)
      Some(a)
    } catch {
      case e: Throwable =>
        legs += Leg(name, "failed", "",
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(300)))
        None
    }

  /** Data tables currently in the storing zone (the failure ledger is
    * operational state, not a synced data table). */
  private def storingTables(storingDir: String): Seq[String] =
    Option(new java.io.File(storingDir).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName)
      .filterNot(_ == FailureLedger.TableName).sorted.toSeq

  def run(spark: SparkSession,
          landingDir: String, storingDir: String, ledgerPath: String,
          configs: Map[String, IngestJob.TableConfig],
          publishRoot: String, userZoneRoot: String,
          catalogPath: String,
          sink: ReportSink = ReportSink.Silent,
          valueAudits: Seq[(String, String)] = Nil,
          auditMaxBp: Long = 500,
          failOnSchemaDrift: Boolean = false): DayResult = {
    val legs = scala.collection.mutable.Buffer[Leg]()

    val summary = attempt("ingest", legs) {
      val s = IngestJob.run(spark, landingDir, storingDir, ledgerPath, configs)
      (s"files=${s.processedFiles} skipped=${s.skippedAsProcessed} " +
        s"failures=${s.failureCounts.values.sum}", s)
    }

    val tables = storingTables(storingDir)
    val snapshots = tables.flatMap { t =>
      attempt(s"publish:$t", legs) {
        val v = Snapshots.write(
          spark.read.parquet(s"$storingDir/$t"), s"$publishRoot/$t", append = false)
        (s"v$v", t -> v)
      }
    }.toMap

    val synced = tables.flatMap { t =>
      attempt(s"sync:$t", legs) {
        val (c, d) = ZoneSync.execute(spark, s"$storingDir/$t", s"$userZoneRoot/$t")
        (s"copied=$c deleted=$d", t -> ((c, d)))
      }
    }.toMap

    // value-audit legs (the A39 fence as a promotion gate, the B13
    // expectations posture applied to VALUES): each audited (table,
    // column) computes its Tukey outer fence over the day's storing
    // table and fails its OWN leg when the anomaly rate clears
    // `auditMaxBp` — a mis-scaled feed is flagged in the day report
    // while the rest of the lake still promotes (per-leg isolation)
    valueAudits.foreach { case (t, c) =>
      attempt(s"audit:$t.$c", legs) {
        import org.apache.spark.sql.functions._
        val v = spark.read.parquet(s"$storingDir/$t")
          .select(col(c).cast("double").as("v")).where(col("v").isNotNull)
        val st = v.agg(count(lit(1)).as("n"),
            percentile(col("v"), lit(0.25)).as("q25"),
            percentile(col("v"), lit(0.75)).as("q75"))
          .collect()(0)
        val n = st.getLong(0)
        // empty table / all-null column: percentile returns null — a
        // defined no-data outcome for the leg, not a fence computation
        if (n == 0 || st.isNullAt(1) || st.isNullAt(2)) {
          ("no rows to audit", ())
        } else {
          val (q25, q75) = (st.getDouble(1), st.getDouble(2))
          val fence = q75 + (q75 - q25) * 3
          val anomalies = v.where(col("v") > fence).count()
          val bp = anomalies * 10000 / math.max(n, 1L)
          require(bp <= auditMaxBp,
            s"anomaly_bp=$bp exceeds $auditMaxBp (fence=$fence, $anomalies of $n rows)")
          (s"anomalies=$anomalies of $n (bp=$bp, fence=$fence)", ())
        }
      }
    }

    // schema-drift audit (the B14 report as a promotion gate): BEFORE
    // the crawler overwrites the catalog, diff yesterday's promise (the
    // stored catalog) against today's user zone — an upstream contract
    // break lands in the day report instead of being silently
    // re-cataloged. First run (no catalog yet) is a defined outcome.
    // `failOnSchemaDrift` turns the report into a hard gate; the
    // default posture reports (schema evolution is often intended).
    // When the gate trips, the catalog refresh below is withheld, so
    // the SAME drift keeps failing every day until an operator
    // acknowledges it (a report-only run re-catalogs) — a contract
    // break can't alarm once and silently self-clear.
    attempt("schema_drift", legs) {
      // "first run" means the catalog PATH does not exist — nothing
      // else. A present-but-unreadable catalog (corruption, transient
      // FS error) must FAIL this leg, not masquerade as a first run:
      // the subsequent catalog refresh would overwrite the possibly-
      // recoverable baseline (and it is withheld below when this leg
      // fails, precisely to preserve that evidence).
      val p = new org.apache.hadoop.fs.Path(catalogPath)
      val hadCatalog =
        p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p) &&
          !LakeCatalog.read(spark, catalogPath).isEmpty
      if (!hadCatalog) ("first run - no prior catalog", ())
      else {
        val drift = SchemaDiscovery.schemaDrift(
            LakeCatalog.columnsFrame(spark, catalogPath),
            SchemaDiscovery.discover(spark, userZoneRoot))
          .collect() // metadata-scale: one row per drifted column
        val byChange = drift.groupBy(_.getAs[String]("change"))
          .map { case (c, rs) => s"$c=${rs.length}" }.toSeq.sorted
        if (failOnSchemaDrift)
          require(drift.isEmpty,
            s"schema drift: ${byChange.mkString(" ")} " +
              drift.take(5).map(r => s"${r.getAs[String]("table_name")}." +
                r.getAs[String]("column_name")).mkString("(", ", ", ")"))
        (if (drift.isEmpty) "no drift"
         else s"drifted=${drift.length} ${byChange.mkString(" ")}", ())
      }
    }

    // The catalog refresh is WITHHELD when the drift leg failed — for
    // both failure modes deliberately: a tripped hard gate keeps
    // re-reporting the same drift every day until an operator
    // acknowledges it (re-running report-only re-catalogs), instead of
    // alarming exactly once and self-clearing; an unreadable catalog
    // keeps its bytes on disk for recovery instead of being overwritten.
    val driftFailed = legs.exists(l =>
      l.name == "schema_drift" && l.status == "failed")
    val cataloged =
      if (driftFailed) {
        legs += Leg("catalog", "skipped",
          "refresh withheld: schema_drift leg failed - prior baseline preserved",
          None)
        0
      } else attempt("catalog", legs) {
        val n = LakeCatalog.persist(spark, userZoneRoot, catalogPath)
        (s"tables=$n", n)
      }.getOrElse(0)

    val result = DayResult(legs.toSeq, summary, snapshots, synced, cataloged)
    // the orchestration-level notification seam (the reference notifies
    // per job; the composed day notifies once, on the leg report)
    ReportSink.safely(sink.onComplete("daily_run",
      s"DAILY RUN ${result.failed.size} failed / ${result.legs.size} legs\n" +
        result.legs.map(l => s"${l.name}: ${l.status}" +
          l.error.map(e => s" ($e)").getOrElse("")).mkString("\n")))
    if (!result.ok)
      ReportSink.safely(sink.onFailure("daily_run",
        result.reportFrame(spark)
          .where(org.apache.spark.sql.functions.col("status") === "failed")))
    result
  }
}
