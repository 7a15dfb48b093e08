package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Recursive relative-key listing of a directory tree (Hadoop FS, so
    * any lake URI): (relative path, length). Metadata-scale — the same
    * listing `aws s3 sync` itself performs. */
  private def listKeys(fs: org.apache.hadoop.fs.FileSystem,
                       root: org.apache.hadoop.fs.Path): Seq[(String, Long)] = {
    if (!fs.exists(root)) return Seq.empty
    val base = root.toUri.getPath.stripSuffix("/")
    val it = fs.listFiles(root, true)
    val out = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    while (it.hasNext) {
      val f = it.next()
      out += ((f.getPath.toUri.getPath.stripPrefix(base).stripPrefix("/"), f.getLen))
    }
    out.toSeq
  }

  /** EXECUTE a `sync --delete` of one table directory (the reference's
    * shell-out, SYNC_..._JOB.PY:100–116, as a library call): the copy and
    * delete sets come from the [[plan]] anti-joins over the two listings,
    * plus sync's size heuristic (same key, different length → re-copy).
    * The file moves are driver-side metadata work exactly like the
    * reference's CLI — per-object copies over the FileSystem API — but
    * the key sets are STREAMED from the plan one partition at a time
    * (`toLocalIterator`), never fully materialized on the driver: at a
    * 100 TB zone the out-of-sync set can be ~10⁷ keys, and the driver
    * only ever holds one partition's worth while applying. Order stays
    * deterministic (global sort before iteration). Returns
    * (copied, deleted). */
  def execute(spark: SparkSession, sourceDir: String, destDir: String): (Long, Long) = {
    import org.apache.hadoop.fs.{FileUtil, Path}
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val srcRoot = new Path(sourceDir); val dstRoot = new Path(destDir)
    val fs = srcRoot.getFileSystem(conf)
    val src = listKeys(fs, srcRoot); val dst = listKeys(fs, dstRoot)
    val p = plan(src.toDF("key", "len"), dst.toDF("key", "len"), "key")
    val dstLen = dst.toMap
    val changed = src.filter { case (k, len) => dstLen.get(k).exists(_ != len) }.map(_._1)
    // missing-at-destination (anti-join) ∪ same-key-different-size: the
    // two sets are disjoint by construction, so the union is dup-free
    val toCopy = p.toCopy.select(col("key")).union(changed.toDF("key"))
      .orderBy(col("key")).as[String].toLocalIterator()
    var copied = 0L
    while (toCopy.hasNext) {
      val k = toCopy.next()
      FileUtil.copy(fs, new Path(srcRoot, k), fs, new Path(dstRoot, k),
        false, true, conf)
      copied += 1
    }
    val toDelete = p.toDelete.select(col("key")).orderBy(col("key"))
      .as[String].toLocalIterator()
    var deleted = 0L
    while (toDelete.hasNext) {
      fs.delete(new Path(dstRoot, toDelete.next()), false)
      deleted += 1
    }
    (copied, deleted)
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
