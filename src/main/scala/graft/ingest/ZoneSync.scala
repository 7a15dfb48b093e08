package graft.ingest

import org.apache.spark.sql.DataFrame

/** Storing-zone → user-zone sync planning.
  *
  * Reference (SYNC_BUCKET_STORING_TO_USER_DAILY_JOB.PY:100–116) shells out
  * to `aws s3 sync --delete` per table: destination gains missing source
  * files and destination-only files are deleted.
  *
  * Spark-first: the sync *plan* is two anti-joins over the key sets —
  * `toCopy` (in source, not destination) and `toDelete` (in destination,
  * not source). On object keys this is metadata-scale; on row-level sync
  * it is the same plan over primary keys, still only shuffling keys.
  */
object ZoneSync {
  final case class Plan(toCopy: DataFrame, toDelete: DataFrame)

  def plan(source: DataFrame, destination: DataFrame, keyCol: String): Plan = {
    val s = source.select(keyCol)
    val d = destination.select(keyCol)
    Plan(
      toCopy = s.join(d, Seq(keyCol), "left_anti"),
      toDelete = d.join(s, Seq(keyCol), "left_anti"))
  }
}
