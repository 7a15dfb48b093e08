package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted-model/index store for the inline-trainer faces.
  *
  * The `*_cached` query faces split train-time from serve-time the way
  * production does: the model (rotation, codebooks, posting lists, LM
  * tables, tercile cuts, merge table) is trained ONCE, written here as
  * plain parquet keyed by (scale-factor dir, artifact name), and every
  * later invocation scores against the persisted artifact. The
  * inline faces (sim_search_opq_rot, sim_search_ivfpq, …) keep
  * measuring worst-case train+score; the cached faces measure the
  * RECURRING cost — the number that actually regresses when a scoring
  * plan degrades, instead of being drowned by inline training.
  * Bench pre-builds artifacts for `*_cached` entries before the timed
  * sweep, so their timings are pure serve-path.
  *
  * Self-healing: a face finding its artifacts missing trains and
  * persists them in the same invocation, then STILL scores via the
  * persisted copy — cold and warm runs take the identical scoring
  * path, which is what makes the equality specs (cached face ==
  * inline face) meaningful.
  */
object ArtifactStore {

  /** Test seam: lets specs point the store at a fresh directory to
    * exercise the cold (train+persist) and warm (load-only) paths
    * deterministically. */
  @volatile private[graft] var rootOverride: Option[String] = None

  /** Override with SPARK_GRAFT_ARTIFACTS; defaults under java.io.tmpdir
    * so repeated local runs share warm artifacts. */
  private def root: String = rootOverride.getOrElse(
    sys.env.getOrElse("SPARK_GRAFT_ARTIFACTS",
      System.getProperty("java.io.tmpdir", "/tmp") + "/graft_artifacts"))

  def path(dir: String, name: String): String =
    s"$root/${new java.io.File(dir).getName}/$name"

  /** All named artifacts present (parquet _SUCCESS markers). */
  def has(s: SparkSession, dir: String, names: String*): Boolean = {
    val conf = s.sessionState.newHadoopConf()
    names.forall { n =>
      val p = new org.apache.hadoop.fs.Path(path(dir, n), "_SUCCESS")
      p.getFileSystem(conf).exists(p)
    }
  }

  def save(df: DataFrame, dir: String, name: String): Unit =
    df.write.mode("overwrite").parquet(path(dir, name))

  /** Remove named artifacts outright (recursive). Used by multi-
    * artifact writers that must invalidate a validator BEFORE
    * rewriting what it vouches for, so no crash window can leave a
    * stale validator pointing at fresh data (round-14 ADVICE on the
    * manifest-delta prev card). */
  def delete(s: SparkSession, dir: String, names: String*): Unit = {
    val conf = s.sessionState.newHadoopConf()
    names.foreach { n =>
      val p = new org.apache.hadoop.fs.Path(path(dir, n))
      p.getFileSystem(conf).delete(p, true)
    }
  }

  def load(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(path(dir, name))

  /** A driver-side square matrix as a (i, row) frame, for parquet. */
  def matrixDf(s: SparkSession, m: Array[Array[Double]]): DataFrame = {
    import s.implicits._
    m.zipWithIndex.map { case (row, i) => (i, row.toSeq) }.toSeq.toDF("i", "row")
  }

  def loadMatrix(s: SparkSession, dir: String, name: String): Array[Array[Double]] =
    load(s, dir, name).orderBy(col("i")).collect()
      .map(_.getAs[scala.collection.Seq[Double]]("row").toArray)
}
