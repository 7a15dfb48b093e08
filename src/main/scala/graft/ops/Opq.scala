package graft.ops

import breeze.linalg.{eigSym, svd, DenseMatrix}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** C38b: FULL optimized product quantization — a learned orthogonal
  * rotation before the PQ split (Ge, He, Ke, Sun: "Optimized Product
  * Quantization", CVPR 2013), completing the ladder
  * C38 (natural axes) → C38a (axis permutation) → C38b (free rotation).
  *
  * A permutation can only re-deal the NATURAL dimensions; when the
  * corpus's variance lives in directions that are not axis-aligned
  * (correlated dims — every real embedding family after any linear
  * head), no permutation balances the subspaces. The paper's two
  * solutions, both here:
  *
  *  - OPQ-P ([[pcaAllocRotation]]): eigendecompose the corpus
  *    covariance and deal the PRINCIPAL directions into subspaces
  *    balancing Σ log λ (eigenvalue allocation) — the closed-form
  *    parametric solution under a Gaussian assumption.
  *  - OPQ-NP ([[refine]]): alternate (a) a warm-started Lloyd round on
  *    the rotated data with (b) the orthogonal-Procrustes rotation
  *    update R = UVᵀ from the SVD of Xᵀ X̂. Every step minimizes the
  *    SAME objective ‖XR − X̂‖²_F, so quantization error is monotone
  *    non-increasing — OpqSpec pins the descent curve, not just the
  *    final recall.
  *
  * Scale shape (100 TB): the rotation is learned driver-side from two
  * D×D matrices (covariance, cross-covariance), each produced by ONE
  * partial-aggregated corpus pass (D rows × D sum-columns — never a
  * row-pair join), exactly like the codebooks it would be trained on a
  * sample in production. Applying R is a narrow per-row projection of
  * D native [[graft.functions.VectorDot]] columns against broadcast
  * literal rotation columns; codes, ADC scan, and rescore are the C38
  * shapes unchanged. R itself is D² doubles (32 KB at D=64) — driver
  * metadata, like the codebooks.
  *
  * The eigen/SVD solves are 64×64 LAPACK calls (breeze, shipped with
  * Spark) — deterministic for a fixed input, so the whole face stays
  * reproducible run over run like every other ANN family here.
  */
object Opq {

  /** x′ = xR as a narrow projection: one native dot per output dim
    * against the broadcast literal rotation column. `r` is row-major
    * (r(i)(j) = R_ij), so column j is `r.map(_(j))`. */
  def rotate(v: DataFrame, r: Array[Array[Double]]): DataFrame =
    v.select(col("vec_id"),
      array(r.indices.map { j =>
        Vectors.dot(col("e"), typedLit(r.map(_(j)).toSeq))
      }: _*).as("e"))

  /** Reconstruction x̂ of each (rotated) vector from its codes: the
    * per-subspace codebook entries re-concatenated in subspace order —
    * a broadcast join on the tiny codebook, no corpus shuffle beyond
    * the per-vector regroup. */
  private[ops] def reconstruct(unit: DataFrame, cb: DataFrame,
      numSub: Int, subDim: Int): DataFrame =
    ProductQuant.assignCode(
        ProductQuant.subFrame(unit, numSub, subDim), ProductQuant.codebookArr(cb))
      .join(broadcast(cb), Seq("m", "code"))
      .groupBy(col("vec_id"))
      .agg(flatten(transform(array_sort(collect_list(struct(col("m"), col("cv")))),
        x => x.getField("cv"))).as("xhat"))

  /** S[i][j] = Σ_rows a_i · b_j over a frame with array columns `a`,`b`
    * — ONE partial-aggregated pass shaped (D rows × D sum-columns),
    * the scale-safe spelling of a D×D Gram/cross-covariance (never a
    * per-row D² explode, never a pair join). */
  private[ops] def crossMatrix(pairs: DataFrame, dim: Int): Array[Array[Double]] = {
    val aggs = (0 until dim).map(j => sum(col("ai") * col("b").getItem(j)).as(s"c$j"))
    val rows = pairs
      .select(posexplode(col("a")).as(Seq("i", "ai")), col("b"))
      .groupBy(col("i")).agg(aggs.head, aggs.tail: _*)
      .collect()
    val m = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      val i = r.getAs[Int]("i")
      var j = 0
      while (j < dim) { m(i)(j) = r.getDouble(j + 1); j += 1 }
    }
    m
  }

  /** Orthogonal Procrustes solve: argmin over orthogonal R of
    * ‖XR − X̂‖²_F is R = UVᵀ where XᵀX̂ = UΣVᵀ. */
  private[ops] def procrustes(m: Array[Array[Double]]): Array[Array[Double]] = {
    val dim = m.length
    val s = svd(DenseMatrix.tabulate(dim, dim)((i, j) => m(i)(j)))
    val r = s.leftVectors * s.rightVectors
    Array.tabulate(dim, dim)((i, j) => r(i, j))
  }

  /** OPQ-P: PCA + eigenvalue allocation. Principal directions (columns
    * of the returned R) are dealt greedily by descending eigenvalue
    * into the least-loaded subspace under Σ log λ — the same balance
    * criterion as [[ProductQuant.balancedPermutation]], applied to the
    * EIGEN basis instead of the natural one. */
  def pcaAllocRotation(unit: DataFrame, numSub: Int, subDim: Int,
      rows: Long = -1L): Array[Array[Double]] = {
    val dim = numSub * subDim
    val n = (if (rows >= 0) rows else unit.count()).toDouble
    if (n == 0) // empty corpus: no covariance to rotate by — identity
      return Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    val mu = unit
      .select((0 until dim).map(j => avg(col("e").getItem(j)).as(s"m$j")): _*)
      .collect()(0)
    val xx = crossMatrix(unit.select(col("e").as("a"), col("e").as("b")), dim)
    val cov = DenseMatrix.tabulate(dim, dim)((i, j) =>
      xx(i)(j) / n - mu.getDouble(i) * mu.getDouble(j))
    val es = eigSym(cov)
    val ord = (0 until dim).sortBy(i => (-es.eigenvalues(i), i))
    // weights indexed by rank r = position in ord (already descending)
    val logs = ord.map(i => math.log(es.eigenvalues(i).max(1e-300))).toIndexedSeq
    val shift = logs.min
    val ranks = ProductQuant.balancedBuckets(
      logs.map(_ - shift), numSub, subDim, order = logs.indices).flatten
    Array.tabulate(dim, dim)((i, j) => es.eigenvectors(i, ord(ranks(j))))
  }

  /** OPQ-NP sweeps from rotation `r0`: codebooks train once in the r0
    * space, then each sweep (1) rebuilds x̂ from the CURRENT codes,
    * (2) re-solves the rotation by Procrustes with x̂ fixed, (3) runs
    * one warm-started Lloyd round in the new space. All three
    * sub-steps are descent steps on ‖XR − X̂‖²_F, so the objective
    * never increases across sweeps. Returns the final (R, codebook). */
  def refine(unit: DataFrame, r0: Array[Array[Double]], numSub: Int, subDim: Int,
      k: Int, sweeps: Int, rows: Long = -1L): (Array[Array[Double]], DataFrame) = {
    val dim = numSub * subDim
    var r = r0
    var cb = ProductQuant.fit(rotate(unit, r), numSub, subDim, k, iters = 2,
      rows = rows)
    for (_ <- 1 to sweeps) {
      val xhat = reconstruct(rotate(unit, r), cb, numSub, subDim)
      r = procrustes(crossMatrix(
        unit.join(xhat, Seq("vec_id"))
          .select(col("e").as("a"), col("xhat").as("b")), dim))
      cb = ProductQuant.lloydRound(
          ProductQuant.subFrame(rotate(unit, r), numSub, subDim), cb)
        .localCheckpoint(true)
    }
    (r, cb)
  }

  /** The OPQ objective ‖XR − X̂‖²_F — one aggregated pass; OpqSpec
    * pins its monotone descent across [[refine]] sweeps. */
  def quantError(unit: DataFrame, r: Array[Array[Double]], cb: DataFrame,
      numSub: Int, subDim: Int): Double = {
    val rot = rotate(unit, r)
    rot.join(reconstruct(rot, cb, numSub, subDim), Seq("vec_id"))
      .select(sum(ProductQuant.l2(col("e"), col("xhat"))).as("err"))
      .collect()(0).getDouble(0)
  }

  /** C38b query face: rotated-PQ top-10 for the query set vec_id < 5 —
    * OPQ-P init + 2 OPQ-NP sweeps, then the shared C38 ADC scan +
    * exact rescore (cosine is rotation-invariant, so only the
    * candidate set differs from C38/C38a). Above-knee posture: the ONE
    * quantized-family rule (BASELINE round-15; see
    * [[IvfPq.simSearchIvfPq]]) — geometry-gated via the C87 audit, no
    * knee route (blob recall 1.00 at 512k/4M; the rotated full-corpus
    * scan's 104 s @4M envelope is the documented cost of rotation over
    * inline array columns). */
  def simSearchOpqRot(s: SparkSession, dir: String): DataFrame = {
    val numSub = 8; val subDim = 8
    val v = Vectors.withNorm(Tables(s, dir, "embeddings"), "embedding")
      .select(col("vec_id"), col("e"), col("nrm"))
    // materialize once + row-aware spread (round-15): every refine/
    // crossMatrix/reconstruct pass below re-scans these blocks, and a
    // single-rowgroup parquet input otherwise pins them all to ONE task
    // (measured 1.3 s single-task passes inside the 9 s face)
    val (unit0, n) = Vectors.materializeSpread(v
      .select(col("vec_id"), transform(col("e"), x => x / col("nrm")).as("e")))
    val (r, cb) =
      refine(unit0, pcaAllocRotation(unit0, numSub, subDim, rows = n),
        numSub, subDim, k = 16, sweeps = 2, rows = n)
    // learned-state exports for the oracle: the rotation (driver-side
    // data — the exported columns and the rotate() literals are the
    // same array) and the codebook (re-read so face and replay share
    // the frozen floats)
    graft.ops.VectorQueries.exportSide(rotColsDf(s, r), ProductQuant.OpqRotPath)
    graft.ops.VectorQueries.exportSide(cb, ProductQuant.OpqRotCbPath)
    ProductQuant.adcSearch(v, rotate(unit0, r),
      s.read.parquet(ProductQuant.OpqRotCbPath), numSub, subDim, cand = 100,
      rows = n)
  }

  /** The rotation exported column-wise: (j, c) with c = R's column j —
    * exactly the literal [[rotate]] dots each output dim against. */
  private def rotColsDf(s: SparkSession, r: Array[Array[Double]]): DataFrame = {
    import s.implicits._
    r.indices.map(j => (j, r.map(_(j)).toSeq)).toDF("j", "c")
  }

  /** C38c: the PERSISTED-ARTIFACT face of C38b — production trains the
    * rotation + codebook once (here: first invocation, self-healing)
    * and every search scores against the persisted model, so this
    * bench entry isolates the RECURRING cost the inline face drowns in
    * training. Identical results to [[simSearchOpqRot]] (training is
    * deterministic; OpqSpec pins frame equality cold and warm). */
  def simSearchOpqCached(s: SparkSession, dir: String): DataFrame = {
    val numSub = 8; val subDim = 8; val k = 16
    val v = Vectors.withNorm(Tables(s, dir, "embeddings"), "embedding")
      .select(col("vec_id"), col("e"), col("nrm"))
    // the WARM serve stays lazy (a count + checkpoint measurably taxes
    // it — round-15 A/B); only the cold BUILD branch materializes the
    // spread training frame
    val unit0 = v
      .select(col("vec_id"), transform(col("e"), x => x / col("nrm")).as("e"))
    if (!ArtifactStore.has(s, dir, "opq_rot", "opq_cb")) {
      val (u, n) = Vectors.materializeSpread(unit0)
      val (r, cb) =
        refine(u, pcaAllocRotation(u, numSub, subDim, rows = n),
          numSub, subDim, k, sweeps = 2, rows = n)
      ArtifactStore.save(ArtifactStore.matrixDf(s, r), dir, "opq_rot")
      ArtifactStore.save(cb, dir, "opq_cb")
    }
    val r = ArtifactStore.loadMatrix(s, dir, "opq_rot")
    val cb = ArtifactStore.load(s, dir, "opq_cb")
    // same oracle machinery as the inline face, over THIS face's own
    // exported copies of the stored model (so the replay never depends
    // on which face ran last)
    graft.ops.VectorQueries.exportSide(rotColsDf(s, r), ProductQuant.OpqCachedRotPath)
    graft.ops.VectorQueries.exportSide(cb, ProductQuant.OpqCachedCbPath)
    ProductQuant.adcSearch(v, rotate(unit0, r),
      s.read.parquet(ProductQuant.OpqCachedCbPath), numSub, subDim, cand = 100)
  }

  val simSearchOpqRotOracle: String = ProductQuant.pqOracle(
    ProductQuant.OpqRotCbPath, rotPath = Some(ProductQuant.OpqRotPath))
  val simSearchOpqCachedOracle: String = ProductQuant.pqOracle(
    ProductQuant.OpqCachedCbPath, rotPath = Some(ProductQuant.OpqCachedRotPath))

  /** Shared rotated-PQ search over any (vec_id, e, nrm) frame (spec
    * entry point — OpqSpec drives it with a mixed anisotropic corpus
    * no permutation can unscramble). */
  def opqTopK(v: DataFrame, numSub: Int = 8, subDim: Int = 8, k: Int = 16,
      sweeps: Int = 2, cand: Int = 100): DataFrame = {
    val unit0 = v
      .select(col("vec_id"), transform(col("e"), x => x / col("nrm")).as("e"))
      .localCheckpoint(true)
    val n = unit0.count()
    val (r, cb) =
      refine(unit0, pcaAllocRotation(unit0, numSub, subDim, rows = n),
        numSub, subDim, k, sweeps, rows = n)
    ProductQuant.adcSearch(v, rotate(unit0, r), cb, numSub, subDim, cand)
  }
}
