package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Product quantization (PQ) ANN — C38, the fourth search family beside
  * brute force (C6), LSH (C7), and IVF (C16).
  *
  * PQ is the MEMORY story for corpus-scale similarity search (Jégou,
  * Douze, Schmid: "Product Quantization for Nearest Neighbor Search",
  * IEEE TPAMI 2011): split each vector into M subspaces, learn a small
  * per-subspace codebook (k-means over subvectors), and store each
  * vector as M codebook indices. Here 64 float dims (256 B) become
  * M=8 codes (8 B at k=16) — a 32× compression, which is what lets a
  * 100 TB embedding corpus's index live in cluster memory while the
  * float vectors stay in cold parquet.
  *
  * Search is asymmetric distance computation (ADC): the query computes
  * its exact distance to every codebook entry ONCE (M×k doubles), and a
  * candidate's approximate distance is then M map lookups + a sum over
  * its codes — the corpus scan never touches a float vector. The short
  * candidate list is exact-rescored from the raw vectors, like the
  * other ANN families.
  *
  * Everything is deterministic (seed codebooks = the k lowest vec_ids'
  * subvectors, argmin ties break to the lowest code id), so results are
  * reproducible run over run — rows-only oracle, recall spec-bounded in
  * PqSpec like C7/C16.
  *
  * Plan shape at 100 TB: training and encoding are the C22 k-means
  * shapes per subspace — broadcast codebooks, narrow per-row argmin, a
  * (m, code, dim) partial-agg update — with all M subspaces trained in
  * ONE frame (the subspace id is just another key column; M passes
  * would scan the corpus M times). The ADC scan is a broadcast of the
  * (tiny) query distance tables over the codes frame — one narrow
  * projection; the only shuffles are the top-k windows on the
  * (query-bounded) candidate list.
  */
object ProductQuant {

  /** Squared L2 between two equal-length double arrays, accumulated in
    * array order (codegen'd higher-order functions, no UDF). */
  private[ops] def l2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** (vec_id, m, sv): each vector split into `numSub` subvectors of
    * `subDim` dims — a narrow generate + slice, no shuffle. */
  private[ops] def subFrame(v: DataFrame, numSub: Int, subDim: Int): DataFrame =
    v.select(col("vec_id"),
        explode(array((0 until numSub).map(lit): _*)).as("m"), col("e"))
      .select(col("vec_id"), col("m"),
        slice(col("e"), col("m") * subDim + 1, lit(subDim)).as("sv"))

  /** Codebook rows (m, code, cv) folded into one broadcast-ready row
    * per subspace. */
  private[ops] def codebookArr(cb: DataFrame): DataFrame =
    cb.groupBy(col("m")).agg(collect_list(struct(col("code"), col("cv"))).as("cb"))

  /** Per-row nearest codebook entry: argmin over squared L2, ties to the
    * lowest code id (struct ordering compares distance first, then
    * code) — a narrow projection once the codebook is broadcast. */
  private[ops] def assignCode(subs: DataFrame, cbArr: DataFrame): DataFrame =
    subs.join(broadcast(cbArr), Seq("m"))
      .withColumn("best", array_min(transform(col("cb"),
        c => struct(l2(col("sv"), c.getField("cv")).as("d"),
          c.getField("code").as("code")))))
      .select(col("vec_id"), col("m"), col("sv"), col("best.code").as("code"))

  /** Train per-subspace codebooks: Lloyd's under squared L2, all M
    * subspaces in one frame. Seeds are the `k` lowest vec_ids'
    * subvectors (deterministic, like [[KMeans.fit]]); the codebook
    * frame is the ONLY thing that iterates and is localCheckpoint'ed
    * each round so the corpus plan never deepens. Returns (m, code, cv). */
  def fit(v0: DataFrame, numSub: Int, subDim: Int, k: Int, iters: Int,
          rows: Long = -1L): DataFrame = {
    require(numSub >= 1 && subDim >= 1 && k >= 1 && iters >= 1)
    // see Vectors.ensureParallelism: iterative fit, spread once up front
    // (row-aware when the caller already counted the corpus)
    val v = Vectors.ensureParallelism(v0, rows)
    val subs = subFrame(v, numSub, subDim)
    val seeds = v.orderBy(col("vec_id")).limit(k)
    var cb = subFrame(seeds, numSub, subDim)
      .select(col("m"), col("vec_id").as("code"), col("sv").as("cv"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) cb = lloydRound(subs, cb).localCheckpoint(true)
    cb
  }

  /** One Lloyd round in code space: reassign every subvector to its
    * nearest codebook entry, then recompute each entry as its assigned
    * mean. Both halves are monotone in Σ‖sv − cv‖², which is what lets
    * [[Opq.refine]] warm-start codebooks across rotation updates and
    * keep the OPQ objective non-increasing. */
  private[ops] def lloydRound(subs: DataFrame, cb: DataFrame): DataFrame =
    assignCode(subs, codebookArr(cb))
      .select(col("m"), col("code"), posexplode(col("sv")).as(Seq("dim", "comp")))
      .groupBy(col("m"), col("code"), col("dim"))
      .agg(avg(col("comp")).as("cmean"))
      .groupBy(col("m"), col("code"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("cmean")))),
        x => x.getField("cmean")).as("cv"))

  /** Encode the corpus: (vec_id, codes) with codes in subspace order —
    * the 8-byte (one byte-aligned code per subspace) representation the
    * ADC scan reads. */
  def encode(v: DataFrame, cb: DataFrame, numSub: Int, subDim: Int): DataFrame =
    assignCode(subFrame(v, numSub, subDim), codebookArr(cb))
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("m"), col("code")))),
        x => x.getField("code")).as("codes"))

  /** C38a: balanced dimension allocation — the OPQ idea (Ge, He, Ke,
    * Sun: "Optimized Product Quantization", CVPR 2013) restricted to
    * its permutation family: REORDER the dimensions so every subspace
    * carries an equal share of the corpus's log-variance mass (the
    * paper's eigenvalue-allocation criterion, applied to the natural
    * axes — no rotation matrix, so encode stays a pure slice and the
    * "rotation" ships as 64 ints, not a 64×64 matrix). When variance
    * is concentrated in a few dims (every real text-embedding family),
    * a contiguous split hands one codebook all the hard dims and
    * starves the rest; dealing them greedily (descending variance,
    * into the least-loaded non-full bucket) balances quantization
    * error across subspaces. On an isotropic corpus it is a no-op by
    * construction (all buckets equal) — PqSpec pins both regimes.
    *
    * The variance pass is ONE partial-aggregated scan (at 100 TB: run
    * it on the same sample that trains the codebooks); the collect is
    * `dim` rows. Shifting log-var by its min makes weights ≥0, which
    * the least-loaded greedy needs (raw log-variances are negative and
    * would invert "least loaded"); capacity-equal buckets make the
    * shift a uniform offset that cancels in the balance. */
  def balancedPermutation(unit: DataFrame, numSub: Int, subDim: Int): Seq[Int] = {
    val vars = unit
      .select(posexplode(col("e")).as(Seq("dim", "x")))
      .groupBy(col("dim")).agg(var_pop(col("x")).as("v"))
      .collect().map(r => (r.getAs[Int]("dim"), r.getAs[Double]("v")))
    if (vars.isEmpty) return Nil // empty corpus: no variances, no permutation
    require(vars.length == numSub * subDim,
      s"dim ${vars.length} != $numSub*$subDim")
    val logs = vars.map { case (i, v) => i -> math.log(v.max(1e-300)) }.toMap
    val shift = logs.values.min
    balancedBuckets(IndexedSeq.tabulate(vars.length)(i => logs(i) - shift),
      numSub, subDim,
      order = vars.sortBy { case (i, v) => (-v, i) }.map(_._1)).flatten
  }

  /** Greedy balanced allocation shared by the permutation face above and
    * [[Opq.pcaAllocRotation]]'s eigenvalue allocation: deal items in
    * `order` (callers pass descending weight, ties to the lower index)
    * into `numSub` capacity-`subDim` buckets, always into the
    * least-loaded non-full bucket (ties to the lower bucket).
    * `weights(i)` must be ≥0 — negative weights would invert "least
    * loaded". Returns the bucket contents in deal order. */
  private[ops] def balancedBuckets(weights: IndexedSeq[Double], numSub: Int,
      subDim: Int, order: Seq[Int]): Seq[Seq[Int]] = {
    require(weights.forall(_ >= 0.0), "balancedBuckets needs non-negative weights")
    val buckets = Array.fill(numSub)(Vector.empty[Int])
    val sums = Array.fill(numSub)(0.0)
    order.foreach { i =>
      val b = (0 until numSub).filter(buckets(_).size < subDim)
        .minBy(b => (sums(b), b))
      buckets(b) :+= i
      sums(b) += weights(i)
    }
    buckets.toIndexedSeq
  }

  /** Reorder each vector's components by `perm` — a narrow projection
    * (array of getItem picks), no shuffle. */
  def permute(v: DataFrame, perm: Seq[Int]): DataFrame =
    v.select(col("vec_id"),
      array(perm.map(i => col("e").getItem(i)): _*).as("e"))

  /** C38 query face: PQ-ADC top-10 for the query set vec_id < 5.
    *
    * Vectors are L2-normalized BEFORE quantization so squared L2 is a
    * monotone proxy for cosine (‖a−b‖² = 2−2·cos on unit vectors) —
    * ADC candidate order then agrees with the cosine ranking the exact
    * rescore (and every other ANN family here) reports. Candidates:
    * top-100 by ADC distance per query; rescore: exact cosine from the
    * raw vectors (a broadcast of the 5×100 candidate list — the corpus
    * never re-shuffles); report top-10. Above-knee posture: the ONE
    * quantized-family rule (BASELINE round-15; see
    * [[IvfPq.simSearchIvfPq]]) — geometry-gated via the C87 audit, no
    * knee route (blob-corpus recall 1.00 at 512k/4M under the sampled
    * fit). */
  def simSearchPq(s: SparkSession, dir: String): DataFrame = {
    val v = Vectors.withNorm(Tables(s, dir, "embeddings"), "embedding")
      .select(col("vec_id"), col("e"), col("nrm"))
    // materialize once + row-aware spread (round-15): the unit frame
    // feeds the fit, the full-corpus encode, and the query tables —
    // previously each consumer re-derived it from the (single-task) scan
    val (unit, n) = Vectors.materializeSpread(v.select(col("vec_id"),
      transform(col("e"), x => x / col("nrm")).as("e")))
    val cb0 = fit(unit, numSub = 8, subDim = 8, k = 16, iters = 2, rows = n)
    VectorQueries.exportSide(cb0, PqCbPath)
    adcSearch(v, unit, s.read.parquet(PqCbPath), numSub = 8, subDim = 8, rows = n)
  }

  /** C38 WITHOUT the oracle export — for composite callers (the recall
    * audit): a re-trained codebook's float means are only bit-identical
    * under the same plan, so the gate must never depend on a composite
    * face re-writing [[PqCbPath]] between the `sim_search_pq` dump and
    * its DuckDB replay (the simSearchIvfInline rationale). */
  private[ops] def simSearchPqInline(s: SparkSession, dir: String): DataFrame =
    pqTopK(Vectors.withNorm(Tables(s, dir, "embeddings"), "embedding")
      .select(col("vec_id"), col("e"), col("nrm")), balance = false)

  /** C38a query face: PQ with the balanced-permutation "rotation" —
    * same code size, same ADC scan; only the subspace composition
    * changes. The candidate set (and so recall) improves whenever the
    * corpus is anisotropic; the final rescore is exact cosine on the
    * UNPERMUTED vectors (cosine is permutation-invariant, so the two
    * faces rank identically given the same candidates). */
  def simSearchOpq(s: SparkSession, dir: String): DataFrame = {
    val v = Vectors.withNorm(Tables(s, dir, "embeddings"), "embedding")
      .select(col("vec_id"), col("e"), col("nrm"))
    // materialize once + row-aware spread (the simSearchPq rationale)
    val (unit0, n) = Vectors.materializeSpread(v.select(col("vec_id"),
      transform(col("e"), x => x / col("nrm")).as("e")))
    val perm = balancedPermutation(unit0, numSub = 8, subDim = 8)
    // the permutation is driver-side data: the exported table and the
    // permute() operand are the SAME Seq, so no recompute risk
    import s.implicits._
    VectorQueries.exportSide(
      perm.zipWithIndex.map { case (d, p) => (p, d) }.toDF("pos", "dim"),
      OpqPermPath)
    // empty corpus: no permutation was learnable — identity layout
    val unit = if (perm.isEmpty) unit0 else permute(unit0, perm)
    val cb0 = fit(unit, numSub = 8, subDim = 8, k = 16, iters = 2, rows = n)
    VectorQueries.exportSide(cb0, OpqCbPath)
    adcSearch(v, unit, s.read.parquet(OpqCbPath), numSub = 8, subDim = 8, rows = n)
  }

  /** Shared PQ/OPQ search over any (vec_id, e, nrm) frame (spec entry
    * point — PqSpec drives it with a constructed anisotropic corpus). */
  def pqTopK(v: DataFrame, balance: Boolean,
      numSub: Int = 8, subDim: Int = 8, k: Int = 16, cand: Int = 100): DataFrame = {
    // materialize once + row-aware spread (the simSearchPq rationale —
    // this is also the plan the recall audit's `pq` member runs)
    val (unit0, n) = Vectors.materializeSpread(v.select(col("vec_id"),
      transform(col("e"), x => x / col("nrm")).as("e")))
    val perm = if (balance) balancedPermutation(unit0, numSub, subDim) else Nil
    val unit = if (perm.isEmpty) unit0 else permute(unit0, perm)
    adcSearch(v, unit, fit(unit, numSub, subDim, k, iters = 2, rows = n),
      numSub, subDim, cand, rows = n)
  }

  /** ADC candidate scan + exact rescore over any already-transformed
    * (permuted/rotated) unit frame and trained codebook. The transform
    * only shapes the CANDIDATE set; the rescore reads the RAW vectors
    * in `v` (cosine is invariant under any orthogonal transform, so all
    * PQ faces rank identical candidates identically). Shared by the
    * permutation face above and [[Opq.opqTopK]]. */
  /** Corpus-adaptive ADC candidate budget: max(floor, n/80). A FIXED
    * cut is the classic ANN scale bug — the round-12 64k sweep measured
    * PQ recall@10 halving (0.52 → 0.26) as the corpus grew 8× past a
    * static 100-candidate budget, while IVF (whose cell count already
    * adapts) HELD. Scaling the budget with corpus size keeps the
    * rescore set a constant ~1.25% of the corpus: recall stays roughly
    * flat and the exact-rescore cost grows linearly with data like the
    * scan itself. Below n = 80·floor the rule is the old constant, so
    * every gate-SF result (and the sf1 decade) is bit-identical. */
  private[ops] def adaptiveCand(n: Long, floor: Int = 100): Int =
    math.max(floor, (n / 80L).toInt)

  private[ops] def adcSearch(v: DataFrame, unit: DataFrame, cb: DataFrame,
      numSub: Int, subDim: Int, cand: Int = 100, rows: Long = -1L): DataFrame = {
    // callers that already counted the (norm-filtered) corpus pass it —
    // unit and v hold the same rows, so the budget is identical and the
    // recount scan disappears (round-15 job-count trim)
    val candN = adaptiveCand(if (rows >= 0) rows else v.count(), cand)
    val codes = encode(unit, cb, numSub, subDim)
    // query-side distance tables: per subspace, map(code -> exact d²)
    val qtabs = assignCodeTables(subFrame(unit.where(col("vec_id") < 5),
      numSub, subDim), codebookArr(cb), numSub)
    val scored = codes.crossJoin(broadcast(qtabs))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("approx_d", aggregate(
        zip_with(col("codes"), col("dtabs"), (c, t) => element_at(t, c)),
        lit(0.0), (acc, x) => acc + x))
    val byAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_d"), col("vec_id"))
    val cands = scored.withColumn("crnk", row_number().over(byAdc))
      .where(col("crnk") <= candN)
      .select(col("query_id"), col("vec_id"))
    val q = v.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    val rescored = v.join(broadcast(cands), Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cosine",
        round(Vectors.cosine(col("qe"), col("e"), col("qn"), col("nrm")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    rescored.withColumn("rnk", rank().over(w)).where(col("rnk") <= 10)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("rnk"), col("vec_id"))
  }

  /** Per-query ADC tables: (query_id, dtabs) where dtabs(m) maps each
    * subspace-m code to the query subvector's exact squared L2 from
    * that codebook entry. */
  private def assignCodeTables(qsubs: DataFrame, cbArr: DataFrame,
      numSub: Int): DataFrame =
    qsubs.join(broadcast(cbArr), Seq("m"))
      .withColumn("dtab", map_from_entries(transform(col("cb"),
        c => struct(c.getField("code"), l2(col("sv"), c.getField("cv"))))))
      // a struct<m, map> is not orderable, so the per-subspace tables
      // assemble through a map keyed by m rather than an array_sort
      .groupBy(col("vec_id"))
      .agg(map_from_entries(collect_list(struct(col("m"), col("dtab")))).as("tmap"))
      .select(col("vec_id").as("query_id"),
        transform(sequence(lit(0), lit(numSub - 1)),
          i => element_at(col("tmap"), i)).as("dtabs"))

  /** Learned-state export paths for the round-11 PQ-family oracle
    * promotions (the [[VectorQueries.exportSide]] posture): the trained
    * per-subspace codebook (and, per face, the permutation / rotation)
    * is the ONLY engine-unreplayable piece — everything downstream
    * (subvector slicing, the argmin encode, the per-query ADC tables,
    * the ordered ADC fold, the candidate cut, exact rescore, rank)
    * replays in DuckDB. */
  private def sidePath(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_$name.parquet"
  val PqCbPath: String = sidePath("pq_cb")
  val OpqCbPath: String = sidePath("opq_cb")
  val OpqPermPath: String = sidePath("opq_perm")
  val OpqRotCbPath: String = sidePath("opqrot_cb")
  val OpqRotPath: String = sidePath("opqrot_rot")
  val OpqCachedCbPath: String = sidePath("opqcached_cb")
  val OpqCachedRotPath: String = sidePath("opqcached_rot")

  /** C38/C38a/C38b/C38c oracle: exported codebook (and permutation or
    * rotation) as data; the encode argmin's squared-L2 is spelled
    * `list_dot_product(diff, diff)` — the same left-to-right
    * 0.0-seeded accumulation of (x−y)² terms as the Spark fold — and
    * the ADC sum forces subspace order with an ordered ones-dot, so
    * every compared double is bit-identical across engines. */
  private[ops] def pqOracle(cbPath: String, permPath: Option[String] = None,
      rotPath: Option[String] = None): String = {
    val uVariant = (permPath, rotPath) match {
      case (Some(p), None) =>
        s"""perm AS (SELECT pos, dim FROM '$p/*.parquet'),
           |u AS (SELECT vec_id, list(e[dim+1] ORDER BY pos) AS e
           |      FROM u0, perm GROUP BY vec_id),""".stripMargin
      case (None, Some(r)) =>
        s"""rot AS (SELECT j, c FROM '$r/*.parquet'),
           |u AS (SELECT vec_id, list(list_dot_product(e, c) ORDER BY j) AS e
           |      FROM u0, rot GROUP BY vec_id),""".stripMargin
      case (None, None) => "u AS (SELECT vec_id, e FROM u0),"
      case _ => throw new IllegalArgumentException("perm XOR rot")
    }
    s"""WITH cb AS (SELECT m, code, cv FROM '$cbPath/*.parquet'),
       |v0 AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
       |       FROM embeddings),
       |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v0
       |      WHERE sqrt(list_dot_product(e, e)) > 0),
       |u0 AS (SELECT vec_id, list_transform(e, x -> x/nrm) AS e FROM n),
       |$uVariant
       |sv AS (SELECT vec_id, m, e[m*8+1 : m*8+8] AS sv
       |       FROM u, generate_series(0, 7) t(m)),
       |df2 AS (SELECT s.vec_id, s.m, c.code,
       |               list_transform(list_zip(s.sv, c.cv), z -> z[1]-z[2]) AS dl
       |        FROM sv s JOIN cb c ON s.m = c.m),
       |dd AS (SELECT vec_id, m, code, list_dot_product(dl, dl) AS d FROM df2),
       |enc AS (SELECT vec_id, m, code FROM (
       |          SELECT *, row_number() OVER (PARTITION BY vec_id, m
       |            ORDER BY d, code) AS rn FROM dd) WHERE rn = 1),
       |qd AS (SELECT vec_id AS query_id, m, code, d FROM dd WHERE vec_id < 5),
       |ad AS (SELECT q.query_id, e2.vec_id,
       |              list_dot_product(list(q.d ORDER BY q.m),
       |                [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]) AS approx_d
       |       FROM enc e2 JOIN qd q ON e2.m = q.m AND e2.code = q.code
       |       WHERE e2.vec_id <> q.query_id
       |       GROUP BY 1, 2),
       |cand AS (SELECT query_id, vec_id FROM (
       |           SELECT *, row_number() OVER (PARTITION BY query_id
       |             ORDER BY approx_d, vec_id) AS crk FROM ad)
       |         WHERE crk <= greatest(100, (SELECT count(*) FROM n) // 80)),
       |rs AS (SELECT c.query_id, c.vec_id,
       |              round(list_dot_product(qn.e, cn.e)/(qn.nrm*cn.nrm), 4) AS cosine
       |       FROM cand c JOIN n qn ON qn.vec_id = c.query_id
       |                   JOIN n cn ON cn.vec_id = c.vec_id),
       |r AS (SELECT *, rank() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC, vec_id) AS rnk FROM rs)
       |SELECT query_id, rnk, vec_id, cosine FROM r WHERE rnk <= 10
       |ORDER BY query_id, rnk, vec_id""".stripMargin
  }

  val simSearchPqOracle: String = pqOracle(PqCbPath)
  val simSearchOpqOracle: String = pqOracle(OpqCbPath, permPath = Some(OpqPermPath))
}
