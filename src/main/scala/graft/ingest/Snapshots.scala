package graft.ingest

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

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
    val prior = versions(table)
    val prev: Seq[String] =
      if (append && prior.nonEmpty) liveDirs(table, prior.last) else Seq.empty
    val next = prior.lastOption.getOrElse(0L) + 1
    val tmp = manifestDir(table).resolve(s".v$next.tmp")
    Files.writeString(tmp, (prev :+ dataDir).mkString("\n"))
    // atomic publication: the manifest appears fully-written or not at all
    Files.move(tmp, manifestPath(table, next), StandardCopyOption.ATOMIC_MOVE)
    next
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
    * unaffected (their files are still listed, hence still live). */
  def expireBefore(table: String, keepFrom: Long): Seq[Long] = {
    val (drop, keep) = versions(table).partition(_ < keepFrom)
    val stillLive = keep.flatMap(liveDirs(table, _)).toSet
    val doomed = drop.flatMap(liveDirs(table, _)).toSet -- stillLive
    doomed.foreach { d =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
      }
      rm(new java.io.File(d))
    }
    drop.foreach(v => Files.deleteIfExists(manifestPath(table, v)))
    drop
  }
}
