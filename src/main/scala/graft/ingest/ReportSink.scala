package graft.ingest

import org.apache.spark.sql.DataFrame

/** Where run outcomes go — the Spark-native seam for the reference's
  * notification side effects: the SNS publish on failure
  * (DATALAKE_TRANSFORMATION_S3_DAILY_JOB.PY:171–178) and the completion
  * mail (L183–215). Transport (SNS, mail, a webhook) is an infra
  * adapter outside this library's scope; what the library owns is WHEN
  * the hooks fire and WHAT they carry:
  *
  *  - [[onComplete]] fires exactly once per run, success or not, with
  *    the human-facing report artifact (the summary string the
  *    reference mails);
  *  - [[onFailure]] fires only when the run carries failures, with the
  *    QUERYABLE failure detail frame (the rows an operator would
  *    otherwise SELECT out of the failure ledger) — the SNS seam.
  *
  * Hooks run on the driver after the run's writes land; a sink that
  * throws is the operator's bug, not the run's — runs do not re-fail
  * because a notification could not be delivered (the reference's bare
  * try/except around send_sns), so callers wrap flaky transports
  * themselves if they need retries.
  */
trait ReportSink {
  /** Once per run: `job` names the run ("ingest", "rds_sweep",
    * "daily_run"), `report` is its formatted summary artifact. */
  def onComplete(job: String, report: String): Unit = ()

  /** Only when the run has failures: `detail` is the failure frame
    * (shape depends on the job — IngestJob's failure-ledger rows,
    * RdsSweep's failed report legs, DailyRun's failed leg rows). */
  def onFailure(job: String, detail: DataFrame): Unit = ()
}

object ReportSink {
  /** The default: notifications disabled. */
  object Silent extends ReportSink

  /** Guard a sink so its exceptions never fail the run (the library
    * calls sinks through this). */
  private[ingest] def safely(body: => Unit): Unit =
    try body catch { case _: Throwable => () }
}
