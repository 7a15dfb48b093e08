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
      failures: DataFrame)            // (fname, status) for IRREGULAR/OUTOFCONFIG

  /** One daily run. `landingDir` holds `TABLE_YYYYMMDD_HHMMSS.CSV[.GZ]`
    * files; `configs` maps table name → layout. */
  def run(spark: SparkSession, landingDir: String, storingDir: String,
          ledgerPath: String, configs: Map[String, TableConfig]): RunSummary = {
    import spark.implicits._

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

    // failure classes the reference reports (L102–107): bad name, no config
    val classified = pending.withColumn("status",
      when(col("route_status") === "IRREGULAR", FailureClassifier.Irregular)
        .when(!col("table_name").isInCollection(
          if (configs.isEmpty) Seq("") else configs.keys.toSeq),
          FailureClassifier.OutOfConfig)
        .otherwise(FailureClassifier.Ok))
    val failures = classified.where(col("status") =!= FailureClassifier.Ok)
      .select(col("fname"), col("status"))

    val todo = classified.where(col("status") === FailureClassifier.Ok)
      .select(col("fname"), col("table_name"))
      .as[(String, String)].collect()        // metadata-scale: file names only

    // header-count validation per FILE (ref L313–318 UNMATCH): one
    // distributed text scan measures each pending file's width before
    // any file is parsed with the wrong layout
    val widthByFile: Map[String, Int] =
      if (todo.isEmpty) Map.empty
      else spark.read.text(todo.map(e => s"$landingDir/${e._1}"): _*)
        .select(
          element_at(split(input_file_name(), "/"), -1).as("fname"),
          (size(split(col("value"), ","))).as("w"))
        .groupBy(col("fname")).agg(max(col("w")).as("w"))
        .as[(String, Int)].collect().toMap
    val (matched, unmatched) = todo.partition { case (f, table) =>
      widthByFile.get(f).contains(configs(table).headers.length)
    }
    val unmatchDf = unmatched.map(_._1).toSeq.toDF("fname")
      .withColumn("status", lit(FailureClassifier.Unmatch))
    val allFailures = failures.unionByName(unmatchDf)

    val written = matched.groupBy(_._2).map { case (table, entries) =>
      val cfg = configs(table)
      val paths = entries.map(e => s"$landingDir/${e._1}")
      // one scan for ALL of this table's pending files; each row's
      // business date derives from its source file's name (ref L339)
      val raw = spark.read.option("header", "false").csv(paths: _*)
      val typed = CsvIngest.castByTypeList(
        CsvIngest.withHeaders(raw, cfg.headers), cfg.typeCodes)
        .withColumn(LakeWriter.PartitionCol,
          date_format(FilenameRouter.fileDate(
            element_at(split(input_file_name(), "/"), -1)), "yyyy-MM-dd"))
      LakeWriter.writePartitioned(typed, s"$storingDir/$table", SaveMode.Overwrite)
      table -> typed.count()
    }

    // record what this run consumed (parquet append — L402–405 scaled)
    if (todo.nonEmpty || !allFailures.isEmpty) {
      Ledger.record(pending.select("fname"), "fname", ledgerPath)
    }
    RunSummary(written.toMap, skipped, allFailures)
  }
}
