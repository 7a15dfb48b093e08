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

  /** User-zone destination path per sync-config row (the reference's
    * `{user_bucket}/{first}/{group}/{feq}/{table}` layout,
    * SYNC_BUCKET_STORING_TO_USER_DAILY_JOB.PY:112–116; layout-changed
    * tables sync from their `_LAYOUTCHANGED` source directory, :110). */
  def userZonePath(userBucket: String, firstFolder: String, group: String,
                   feq: String, table: String): String =
    s"$userBucket/$firstFolder/$group/$feq/$table"

  /** Timestamped snapshot of the sync configuration (the reference's
    * `backupConfig`, SYNC_..._JOB.PY:95–98: `aws s3 sync config/ →
    * backup/conf_{now}/`). A distributed copy of the config frame —
    * the timestamp comes from the caller so runs are reproducible. */
  def backupConfig(config: DataFrame, backupRoot: String, timestamp: String): String = {
    val dest = s"$backupRoot/conf_$timestamp"
    config.write.mode(org.apache.spark.sql.SaveMode.ErrorIfExists).parquet(dest)
    dest
  }
}
