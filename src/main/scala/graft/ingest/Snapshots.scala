package graft.ingest

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-committed tables: snapshot isolation + time travel over
  * plain parquet.
  *
  * The reference's readers trust S3 directory listing, so a reader
  * racing a writer sees half-written data, and a failed job leaves a
  * corrupt prefix. The table-format answer (what Iceberg/Delta do,
  * distilled): data files are IMMUTABLE and anonymous; what defines the
  * table is a versioned MANIFEST listing its live files, published
  * atomically. Readers resolve one manifest and read exactly those
  * files — a consistent snapshot no concurrent writer can disturb —
  * and any historical version stays readable until explicitly expired.
  *
  * Layout: `{table}/data/{uuid}/part-*.parquet` (one fresh uuid dir per
  * commit), `{table}/_manifests/v{N}.manifest` (one line per live data
  * dir). Publication is write-temp + atomic rename; the current version
  * is the highest N present.
  */
object Snapshots {

  private def manifestDir(table: String): Path = Paths.get(table, "_manifests")

  private def manifestPath(table: String, v: Long): Path =
    manifestDir(table).resolve(s"v$v.manifest")

  /** All committed versions, ascending. */
  def versions(table: String): Seq[Long] = {
    val dir = manifestDir(table).toFile
    if (!dir.isDirectory) Seq.empty
    else dir.listFiles.map(_.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong }
      .sorted.toSeq
  }

  private def liveDirs(table: String, v: Long): Seq[String] =
    Files.readAllLines(manifestPath(table, v)).toArray.toSeq.map(_.toString)
      .filter(_.nonEmpty)

  /** Commit `df` to the table. `append=true` keeps the previous
    * version's files live; false replaces them (logically — old files
    * remain on disk for time travel until [[expireBefore]]). Returns
    * the new version. */
  def write(df: DataFrame, table: String, append: Boolean = true): Long = {
    val commitId = java.util.UUID.randomUUID().toString
    val dataDir = s"$table/data/$commitId"
    df.write.parquet(dataDir)
    Files.createDirectories(manifestDir(table))

    // optimistic-concurrency publication: re-resolve the head, stage a
    // writer-unique temp, and claim the next version with a hard link —
    // link() atomically FAILS if the target exists, so racing committers
    // serialize (loser re-reads the new head and retries against it)
    var committed = -1L
    while (committed < 0) {
      val prior = versions(table)
      val prev: Seq[String] =
        if (append && prior.nonEmpty) liveDirs(table, prior.last) else Seq.empty
      val next = prior.lastOption.getOrElse(0L) + 1
      val tmp = manifestDir(table).resolve(s".v$next-$commitId.tmp")
      Files.writeString(tmp, (prev :+ dataDir).mkString("\n"))
      try {
        Files.createLink(manifestPath(table, next), tmp)
        committed = next
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => // lost the race
      } finally Files.deleteIfExists(tmp)
    }
    committed
  }

  /** Read a snapshot: the latest version, or a pinned historical one. */
  def read(spark: SparkSession, table: String,
           version: Option[Long] = None): DataFrame = {
    val vs = versions(table)
    require(vs.nonEmpty, s"no committed snapshots under $table")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"unknown snapshot v$v (have ${vs.mkString(",")})")
    spark.read.parquet(liveDirs(table, v): _*)
  }

  /** Expire history: delete manifests < `keepFrom` and any data dir no
    * surviving manifest references. Readers of retained versions are
    * unaffected (their files are still listed, hence still live). The
    * CURRENT version can never be expired — a runaway retention bound
    * must not destroy the live table. */
  def expireBefore(table: String, keepFrom: Long): Seq[Long] = {
    val vs = versions(table)
    require(vs.isEmpty || keepFrom <= vs.last,
      s"refusing to expire the current snapshot v${vs.lastOption.getOrElse(0L)}")
    val (drop, keep) = vs.partition(_ < keepFrom)
    val stillLive = keep.flatMap(liveDirs(table, _)).toSet
    val doomed = drop.flatMap(liveDirs(table, _)).toSet -- stillLive
    doomed.foreach(d => FsUtil.deleteRecursively(new java.io.File(d)))
    drop.foreach(v => Files.deleteIfExists(manifestPath(table, v)))
    drop
  }

  /** Remove orphans: data dirs referenced by NO manifest (failed commits
    * that died between the data write and publication) and stale temp
    * files. Safe concurrently with readers — only never-published dirs
    * are touched. Returns the deleted data dirs. */
  def vacuum(table: String): Seq[String] = {
    val referenced = versions(table).flatMap(liveDirs(table, _)).toSet
    val dataRoot = Paths.get(table, "data").toFile
    val orphans = Option(dataRoot.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .map(d => s"$table/data/${d.getName}")
      .filterNot(referenced)
    orphans.foreach(d => FsUtil.deleteRecursively(new java.io.File(d)))
    Option(manifestDir(table).toFile.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".tmp")).foreach(_.delete())
    orphans.toSeq.sorted
  }
}
