package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's daily transformation job as one library call
  * (DATALAKE_TRANSFORMATION_S3_DAILY_JOB.PY end-to-end): landing-zone
  * CSVs → routed by filename → ledger-filtered to the unprocessed set →
  * parsed/cast per table config → partitioned parquet in the storing
  * zone → ledger updated → failure report.
  *
  * Spark-first differences from the reference:
  *  - routing/classification is a DataFrame over file names, not a
  *    driver loop; per-table parsing reads ALL of a table's pending
  *    files in one scan (the reference spawns a ThreadPool thread per
  *    file, L392);
  *  - the processed ledger is a parquet table + anti-join, not a JSON
  *    list in driver memory (L370–405);
  *  - the partition column comes from each file's business date
  *    (`_metadata.file_name`, L339) so one run can carry many dates, and
  *    the dynamic-overwrite writer makes re-runs idempotent per date.
  */
object IngestJob {

  final case class TableConfig(headers: Seq[String], typeCodes: Seq[Int])

  final case class RunSummary(
      processed: Map[String, Long],   // table -> rows written
      skippedAsProcessed: Long,       // files the ledger filtered out
      failures: DataFrame,            // FAILED_TO_CONVERT-shaped rows for this run
      processedFiles: Long = 0L,      // files successfully written this run
      failureCounts: Map[String, Long] = Map.empty, // status -> file count
      invalidConfigTables: Seq[String] = Nil,       // config rows rejected (dup headers)
      startTime: String = "",
      endTime: String = "") {

    /** Formatted completion report — the reference's summary-mail body
      * reshaped (send_completed_mail, DATALAKE_TRANSFORMATION_S3_DAILY
      * _JOB.PY:183–215): per-class file counts, job status + timing, and
      * the SQL an operator runs for failure detail. Transport (SNS/mail)
      * is out of scope; the string is the artifact. */
    def report: String = {
      def line(k: String, v: Any) = f"  $k%-26s:   $v"
      val sep = "-" * 68
      val status =
        if (invalidConfigTables.isEmpty) "COMPLETED"
        else "COMPLETED WITH ERRORS: DUPLICATED COLUMNS IN ENTRY: " +
          invalidConfigTables.mkString(", ")
      Seq(
        "DATALAKE TRANSFORMATION PROCESS COMPLETED",
        sep,
        line("PROCESSED_FILES_NUMBERS", processedFiles),
        line("UNMATCH_FILES_NUMBERS", failureCounts.getOrElse(FailureClassifier.Unmatch, 0L)),
        line("OUTCONFIG_FILES_NUMBERS", failureCounts.getOrElse(FailureClassifier.OutOfConfig, 0L)),
        line("IRREGULAR_FILES_NUMBERS", failureCounts.getOrElse(FailureClassifier.Irregular, 0L)),
        line("JOB_STATUS", status),
        line("JOB_START_TIME", startTime),
        line("JOB_END_TIME", endTime),
        sep,
        "FOR EXCEPTION FILE DETAIL, QUERY THE FAILURE LEDGER:",
        s"  SELECT fname, header_cnt, meta_header_cnt, status" +
          s" FROM ${FailureLedger.TableName}" +
          s" WHERE start_exec_time >= '$startTime'"
      ).mkString("\n")
    }
  }

  private def nowString(): String =
    java.time.LocalDateTime.now()
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))

  /** Run with a config TABLE carrying validity windows — the reference's
    * actual config shape (columns: table, start_date, end_date, headers
    * and type_codes as comma-joined strings; TRANSFORMATION L295). Each
    * landing file resolves the layout live on ITS business date, so one
    * run can parse the same table under two layouts across a layout
    * change. Files whose date no window covers fail OUTOFCONFIG. */
  def runWithConfigTable(spark: SparkSession, landingDir: String,
                         storingDir: String, ledgerPath: String,
                         config: DataFrame,
                         sink: ReportSink = ReportSink.Silent): RunSummary = {
    val parsed = config.select(col("table"), col("start_date"), col("end_date"),
      split(col("headers"), ",").as("headers"),
      transform(split(col("type_codes"), ","),
        c => trim(c).cast("int")).as("type_codes"))
    // reject config rows with duplicated header columns before anything is
    // parsed (ref :222–231 exits the whole job; here the bad row is dropped
    // so its files classify OUTOFCONFIG — a queryable failure record — and
    // retry once the config is fixed, while other tables still ingest).
    // Config is metadata-scale: collecting the offending NAMES is fine.
    val dup = size(array_distinct(col("headers"))) < size(col("headers"))
    val invalidTables = parsed.where(dup).select("table").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val summary = runWithLayouts(spark, landingDir, storingDir, ledgerPath,
      parsed.where(!dup)).copy(invalidConfigTables = invalidTables)
    // hooks fire HERE, on the final summary (the inner call got Silent):
    // a rejected config row is a failure condition too
    fireHooks(sink, summary)
    summary
  }

  /** Fire the [[ReportSink]] hooks for a finished run: completion
    * always, failure when the run recorded failed files or rejected
    * config rows. */
  private def fireHooks(sink: ReportSink, summary: RunSummary): Unit = {
    ReportSink.safely(sink.onComplete("ingest", summary.report))
    if (summary.failureCounts.values.sum > 0 || summary.invalidConfigTables.nonEmpty)
      ReportSink.safely(sink.onFailure("ingest", summary.failures))
  }

  /** One daily run with a static layout per table. */
  def run(spark: SparkSession, landingDir: String, storingDir: String,
          ledgerPath: String, configs: Map[String, TableConfig],
          sink: ReportSink = ReportSink.Silent): RunSummary = {
    import spark.implicits._
    val layouts = configs.toSeq
      .map { case (t, c) => (t, java.sql.Date.valueOf("0001-01-01"),
        java.sql.Date.valueOf("9999-12-31"), c.headers, c.typeCodes) }
      .toDF("table", "start_date", "end_date", "headers", "type_codes")
    runWithLayouts(spark, landingDir, storingDir, ledgerPath, layouts, sink)
  }

  /** Core run over a LAYOUTS frame: (table, start_date, end_date,
    * headers array<string>, type_codes array<int>) — config versions as
    * data, so layout resolution is a broadcast join, not a driver loop.
    *
    * The whole classification is ONE composed DataFrame: filename
    * routing → ledger anti-join → config-window join → width-scan join,
    * eagerly localCheckpoint'd so every consumer (failure ledger,
    * processed ledger, write groups, counts) reads the same executor-
    * resident snapshot without re-scanning the landing zone. The driver
    * materializes only (a) the candidate read set and the per-(table,
    * layout) group descriptors — the same file lists Spark's own
    * FileIndex plans any scan from — and (b) summary counts; per-file
    * classification detail and failure rows never pass through it. */
  def runWithLayouts(spark: SparkSession, landingDir: String, storingDir: String,
                     ledgerPath: String, layouts: DataFrame,
                     sink: ReportSink = ReportSink.Silent): RunSummary = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val startTime = nowString()

    // landing inventory: file NAMES only (metadata-scale listing)
    val names = Option(new java.io.File(landingDir).listFiles())
      .getOrElse(Array.empty).filter(_.isFile).map(_.getName).toSeq
    val files = names.toDF("fname")
    val routed = FilenameRouter.route(files)

    // ledger gate: only never-processed files move on
    val ledgerExists = new java.io.File(ledgerPath).exists()
    val processedLedger =
      if (ledgerExists) spark.read.parquet(ledgerPath)
      else Seq.empty[String].toDF("fname")
    val pending = Ledger.pending(routed, processedLedger, "fname")
    val skipped = routed.count() - pending.count()

    // layout resolution: broadcast the metadata-scale config; when
    // windows overlap, the latest-starting one wins (deterministic)
    val lay = layouts.select(col("table").as("__t"), col("start_date").as("__s"),
      col("end_date").as("__e"), col("headers").as("__hdrs"),
      col("type_codes").as("__codes"))
    val oneWindow = Window.partitionBy(col("fname"))
      .orderBy(col("__s").desc_nulls_last, col("__e").desc_nulls_last)
    val resolved = pending
      .join(broadcast(lay),
        col("table_name") === col("__t") && col("file_date").isNotNull &&
          col("__s") <= col("file_date") && col("file_date") < col("__e"), "left")
      .withColumn("__rn", row_number().over(oneWindow))
      .where(col("__rn") === 1)
      // the reference's classes, L102–107: bad name → IRREGULAR, no
      // config row covering the file's business date → OUTOFCONFIG
      .withColumn("__class",
        when(col("route_status") === "IRREGULAR" || col("file_date").isNull,
          lit(FailureClassifier.Irregular))
          .when(col("__hdrs").isNull, lit(FailureClassifier.OutOfConfig))
          .otherwise(lit("CANDIDATE")))

    // header-count validation per FILE (ref L313–318 UNMATCH): one
    // distributed text scan measures each candidate file's width before
    // any file is parsed with the wrong layout. The path list is the
    // scan's read set (what any FileIndex holds); widths stay a FRAME.
    // Width is QUOTE-AWARE with the same conventions the ingest's CSV
    // parse uses (delimiter `,`, quote `"`, `""` escapes): splitting a
    // line on the quote char alternates outside/inside-quote segments,
    // so only commas in even-indexed segments separate fields — a
    // quoted field containing commas no longer overcounts into UNMATCH.
    val candidatePaths = resolved.where(col("__class") === "CANDIDATE")
      .select("fname").as[String].collect().map(f => s"$landingDir/$f")
    val widths =
      if (candidatePaths.isEmpty) Seq.empty[(String, Int)].toDF("fname", "__w")
      else {
        val segs = split(col("value"), "\"", -1)
        val seps = aggregate(
          zip_with(segs, sequence(lit(0), size(segs) - 1),
            (s, i) => when(i % 2 === 0, size(split(s, ",", -1)) - 1).otherwise(0)),
          lit(0), (acc, x) => acc + x)
        spark.read.text(candidatePaths.toIndexedSeq: _*)
          .select(
            element_at(split(input_file_name(), "/"), -1).as("fname"),
            (seps + 1).as("__w"))
          .groupBy(col("fname")).agg(max(col("__w")).as("__w"))
      }

    // final classification, snapshotted once for all consumers. A
    // candidate with NO text rows is the reference's zero-column case
    // (L314–322, the 2019.06.21 "EMPTY FILES FLUSH TO PROCESSED LIST"
    // change): EMPTY, ledgered below as processed, never a failure —
    // an empty placeholder file must not retry (and re-report) forever.
    val classified = resolved.join(widths, Seq("fname"), "left")
      .withColumn("status",
        when(col("__class") =!= "CANDIDATE", col("__class"))
          .when(col("__w").isNull, lit(FailureClassifier.Empty))
          .when(col("__w") === size(col("__hdrs")), lit(FailureClassifier.Ok))
          .otherwise(lit(FailureClassifier.Unmatch)))
      .localCheckpoint(true)

    // FAILED_TO_CONVERT rows (ref :101–103): UNMATCH carries the found-
    // vs-expected header detail (:316), OUTOFCONFIG/IRREGULAR blank it
    // (:349–358); appended to the queryable ledger without ever leaving
    // the executors
    val failures = FailureLedger.shape(classified,
      fname = col("fname"),
      headerList = array_join(transform(sequence(lit(0), col("__w") - 1),
        i => concat(lit("_c"), i)), ","),
      headerCnt = col("__w"),
      metaHeaderList = array_join(col("__hdrs"), ","),
      metaHeaderCnt = size(col("__hdrs")),
      execTime = lit(startTime)).localCheckpoint(true)
    val failureCounts = failures.groupBy("status").count()
      .as[(String, Long)].collect().toMap
    FailureLedger.appendFrame(failures, s"$storingDir/${FailureLedger.TableName}")

    // group by (table, layout): across a layout change the same table
    // parses under two configs in one run; their business dates are
    // disjoint, so dynamic partition overwrite keeps both writes safe.
    // One driver row per GROUP (its read set), not per file.
    val groups = classified.where(col("status") === FailureClassifier.Ok)
      .groupBy(col("table_name"), col("__hdrs"), col("__codes"))
      .agg(collect_list(col("fname")).as("fnames"))
      .as[(String, Seq[String], Seq[Int], Seq[String])].collect()
    val written = groups
      .map { case (table, headers, codes, fnames) =>
        val paths = fnames.map(f => s"$landingDir/$f")
        // one scan for ALL of this group's files; each row's business
        // date derives from its source file's name (ref L339)
        val raw = spark.read.option("header", "false").csv(paths: _*)
        val typed = CsvIngest.castByTypeList(
          CsvIngest.withHeaders(raw, headers), codes)
          .withColumn(LakeWriter.PartitionCol,
            date_format(FilenameRouter.fileDate(
              element_at(split(input_file_name(), "/"), -1)), "yyyy-MM-dd"))
        // row count observed DURING the write pass — no second parse
        val obs = org.apache.spark.sql.Observation()
        LakeWriter.writePartitioned(typed.observe(obs, count(lit(1)).as("n")),
          s"$storingDir/$table", SaveMode.Overwrite)
        table -> obs.get("n").asInstanceOf[Long]
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap

    // record successfully written files PLUS empty files (the reference
    // appends both to PROCESSED_OBJECT_LIST — successes at L402–405,
    // zero-column files at L319–322): a failed file — e.g. OUTOFCONFIG
    // because its config row hasn't landed yet — must retry on a later
    // run, not be silently skipped forever, while an empty placeholder
    // is consumed exactly once
    val ledgerable = classified.where(col("status").isin(
      FailureClassifier.Ok, FailureClassifier.Empty))
    if (!ledgerable.isEmpty) {
      Ledger.record(ledgerable.select("fname"), "fname", ledgerPath)
    }
    val summary = RunSummary(written, skipped, failures,
      processedFiles = groups.map(_._4.length.toLong).sum,
      failureCounts = failureCounts,
      startTime = startTime, endTime = nowString())
    fireHooks(sink, summary)
    summary
  }
}
