package graft.ops

import breeze.linalg.{eigSym, DenseMatrix}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** C61: PCA over the embedding corpus — the standalone
  * reduce/whiten face of the machinery C38b uses for its rotation.
  * Training-data pipelines run this constantly: cheap dimensionality
  * reduction before clustering/dedup, and whitening (per-component
  * unit variance) which measurably improves cosine retrieval on
  * anisotropic sentence embeddings (Su et al., "Whitening Sentence
  * Representations", 2021 — public preprint).
  *
  * Scale shape: the model is learned from TWO driver-sized artifacts —
  * the mean vector and the D×D covariance — each produced by ONE
  * partial-aggregated pass over the corpus ([[Opq.crossMatrix]]'s
  * D rows × D sum-columns spelling; never a pair join, never a
  * per-row D² explode). The eigensolve is a 64×64 LAPACK call on the
  * driver; applying the transform is a narrow per-row projection of k
  * native dot products against broadcast literal component columns.
  * Fit on a sample at 100 TB, transform everywhere — the C60 posture.
  *
  * Everything reported is SIGN-INVARIANT (eigenvalue shares, squared
  * projections, reconstruction errors): LAPACK fixes eigenvector signs
  * only up to ±1, so no face may expose a raw first-moment projection.
  */
object Pca {

  /** Fitted model: mean, descending eigenvalues, and the matching
    * eigenvector columns (basis(i)(c) = component c's weight on dim i). */
  final case class Model(mean: Array[Double], eigenvalues: Array[Double],
      basis: Array[Array[Double]])

  /** One-pass fit: covariance from E[xxᵀ] − μμᵀ, then a driver-side
    * symmetric eigensolve; components ordered by descending eigenvalue
    * (ties to the lower natural index, like [[Opq.pcaAllocRotation]]). */
  def fit(unit: DataFrame, dim: Int): Model = {
    val n = unit.count().toDouble
    if (n == 0) // empty corpus: zero model, identity basis — callers
      return Model(Array.fill(dim)(0.0), Array.fill(dim)(0.0), // report no variance
        Array.tabulate(dim, dim)((i, c) => if (i == c) 1.0 else 0.0))
    val mu = unit
      .select((0 until dim).map(j => avg(col("e").getItem(j)).as(s"m$j")): _*)
      .collect()(0)
    val xx = Opq.crossMatrix(unit.select(col("e").as("a"), col("e").as("b")), dim)
    val cov = DenseMatrix.tabulate(dim, dim)((i, j) =>
      xx(i)(j) / n - mu.getDouble(i) * mu.getDouble(j))
    val es = eigSym(cov)
    val ord = (0 until dim).sortBy(i => (-es.eigenvalues(i), i))
    Model(
      Array.tabulate(dim)(mu.getDouble),
      ord.map(i => es.eigenvalues(i)).toArray,
      Array.tabulate(dim, dim)((i, c) => es.eigenvectors(i, ord(c))))
  }

  /** Project `e` onto the top `k` components (centered): narrow
    * per-row dots against broadcast literal columns. `whiten` divides
    * each coordinate by √λ so every kept component carries unit
    * corpus variance. */
  def project(v: DataFrame, m: Model, k: Int, whiten: Boolean = false): DataFrame = {
    val centered: Column = zip_with(col("e"), typedLit(m.mean.toSeq), (x, mu) => x - mu)
    v.select(col("vec_id"),
      array((0 until k).map { c =>
        val p = Vectors.dot(centered, typedLit(m.basis.map(_(c)).toSeq))
        if (whiten) p / math.sqrt(m.eigenvalues(c).max(1e-300)) else p
      }: _*).as("p"))
  }

  /** C61 query face: the corpus variance-explained curve — per
    * component, its share of total variance and the cumulative share
    * (integer basis points — sign-invariant and cross-engine stable),
    * for the top 16 components. The card a pipeline reads to pick its
    * reduction k. */
  def embedPca(s: SparkSession, dir: String): DataFrame = {
    val v = Vectors.withNorm(Tables(s, dir, "embeddings"), "embedding")
      .select(col("vec_id"), transform(col("e"), x => x / col("nrm")).as("e"))
    val m = fit(v, dim = 64)
    val total = m.eigenvalues.sum
    import s.implicits._
    if (total <= 0) // no variance to apportion (empty or single-point corpus)
      return Seq.empty[(Int, Long, Long)].toDF("component", "var_bp", "cum_bp")
    val rows = m.eigenvalues.take(16).zipWithIndex.scanLeft((0, 0L, 0.0)) {
      case ((_, _, acc), (ev, c)) => (c, (ev * 10000 / total).round, acc + ev)
    }.drop(1).map { case (c, bp, cum) =>
      (c, bp, (cum * 10000 / total).round)
    }
    import s.implicits._
    rows.toSeq.toDF("component", "var_bp", "cum_bp")
  }
}
