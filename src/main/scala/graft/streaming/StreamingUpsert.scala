package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ingest.{Merge, Snapshots}

/** Continuous CDC — a change STREAM maintained as a queryable
  * latest-state table (SURVEY §2.D).
  *
  * Composition of two library pieces: each micro-batch folds into the
  * current state with [[Merge.upsert]] (latest change per key wins,
  * deletes drop, unseen keys insert) and publishes through
  * [[Snapshots.write]] — a CAS-committed manifest, so readers always see
  * a complete consistent version, batches that race with readers never
  * tear, and every batch leaves a time-travelable snapshot behind
  * (replayed micro-batches after a restart re-commit idempotently: the
  * merge of the same changes into the resulting state is a fixpoint, so
  * at-least-once delivery still yields exactly-once STATE).
  *
  * Scale: per batch this is the upsert's two key-shuffles over
  * state + changes; state files are rewritten per batch (the simple
  * copy-on-write treatment — a production table would partition the
  * state and rewrite only touched partitions via dynamic overwrite,
  * LakeWriter's path).
  */
object StreamingUpsert {

  /** The foreachBatch sink: apply one CDC micro-batch to `table`. */
  def upsertSink(table: String, key: String, opCol: String = "op",
                 seqCol: String = "seq", deleteOp: String = "D")
      : (DataFrame, Long) => Unit = { (batch, _) =>
    val base =
      if (Snapshots.versions(table).nonEmpty)
        Snapshots.read(batch.sparkSession, table)
      else batch.drop(opCol, seqCol).where(org.apache.spark.sql.functions.lit(false))
    val merged = Merge.upsert(base, batch, key, opCol, seqCol, deleteOp)
    Snapshots.write(merged, table, append = false)
    ()
  }

  /** Attach the sink to a change stream. */
  def start(changes: DataFrame, table: String, key: String,
            checkpointDir: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(upsertSink(table, key))
      .start()
}
