package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** C76: MEMORY-BOUNDED semantic dedup — the C37 SemDeDup recipe with the
  * within-cluster pairwise compare run on PQ CODES instead of raw float
  * vectors (the §7.14 "LSH-bucketed semantic dedup over PQ codes" queue
  * item, realized with the stronger symmetric-distance form).
  *
  * Why: C37's within-cluster pair join shuffles full float vectors — at
  * D=64 that is 256 B per row, replicated G ways by the grid. At 100 TB
  * of embeddings the pair join's shuffle volume IS the cost. Here the
  * corpus is product-quantized once (M=16 residual codebooks, the C44
  * shapes), and the pair join carries only the M-long code array (16 B
  * of payload at k=64): a 16× shuffle reduction on the quadratic
  * stage, which is the difference between "fits the shuffle tier" and
  * "doesn't" at corpus scale. The float vectors are re-read ONLY for
  * the candidate list (an equi-join bounded by candidate count, never
  * Σ cluster²).
  *
  * How the approximate compare works: symmetric distance computation
  * (SDC, Jégou/Douze/Schmid TPAMI 2011 §III-A) — every pair of codebook
  * entries within a subspace has a precomputed squared-L2 table (M×k²
  * doubles, 512 KB here; broadcast like the codebooks), and a candidate
  * pair's approximate distance is M map lookups + a sum. On unit
  * vectors cos = 1 − d²/2, so the SDC gate `approx_cos ≥ τ − margin`
  * admits every pair whose quantization error stays inside `margin`;
  * the exact confirm (cosine from raw vectors) then removes the false
  * admits, so PRECISION is exact by construction and only recall rides
  * on the margin. Measured on the test corpus (M=16, k=64 residual
  * codes): no confirmed pair's approximate cosine sits more than 0.124
  * below τ=0.35 — margin 0.15 covers it — while the gate still removes
  * 55% of the quadratic stage at τ=0.35 and ~99% at a τ=0.6 near-dup
  * threshold. SemanticPqSpec pins card equality with C37 at both
  * thresholds plus the pruning; the margin-vs-recall trade is the
  * documented knob, exactly like the other ANN faces.
  *
  * Plan shape at 100 TB: k-means fit + PQ training are the C22/C38
  * sample-scale loops; cluster assignment and encoding are narrow
  * broadcast projections; the pair join is the C5 G×G grid on
  * (cluster, ga, gb) carrying codes only; SDC tables and the candidate
  * list are broadcast-tiny; the confirm is two equi-joins keyed on
  * vec_id. No stage holds floats through the quadratic part.
  */
object SemanticPq {

  /** Dense 0..k−1 code index per subspace — driver metadata derived
    * from the codebook alone (deterministic: ascending code id), so
    * any party holding the codebook derives the SAME remap; the
    * literal ships broadcast like the OPQ rotation. Raw PQ codes are
    * seed vec_ids (sparse longs); SDC lookups need ARRAY positions —
    * a MapType `element_at` is a linear scan, and paying ~2×k scanned
    * entries per pair per subspace was measured to dominate the whole
    * card at sf0.1 (22 s → the quadratic stage does the lookups). */
  private[ops] def codeRemap(cb: DataFrame, numSub: Int): Seq[Map[Long, Int]] = {
    val rows = cb.select(col("m"), col("code")).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    (0 until numSub).map { m =>
      rows.filter(_._1 == m).map(_._2).sorted.zipWithIndex.toMap
    }
  }

  /** Rewrite a coded frame's code arrays to dense indices (narrow
    * projection against the broadcast remap literal). */
  private[ops] def toDense(coded: DataFrame, remap: Seq[Map[Long, Int]]): DataFrame =
    coded.withColumn("codes",
      zip_with(col("codes"), typedLit(remap), (c, mp) => element_at(mp, c)))

  /** Per-pair-of-codes squared-L2 tables, one row: dtabs(m)(i)(j) is
    * the distance between subspace-m codebook entries with DENSE
    * indices i and j. M×k² doubles — broadcast metadata; array-indexed
    * so an SDC lookup is O(1), not a map scan. */
  private[ops] def sdcTables(cb: DataFrame, remap: Seq[Map[Long, Int]],
      numSub: Int): DataFrame = {
    val toIdx = typedLit(remap)
    val a = cb.select(col("m"),
      element_at(element_at(toIdx, col("m") + 1), col("code")).as("ia"),
      col("cv").as("cva"))
    val b = cb.select(col("m"),
      element_at(element_at(toIdx, col("m") + 1), col("code")).as("ib"),
      col("cv").as("cvb"))
    a.join(b, Seq("m"))
      .withColumn("d2", ProductQuant.l2(col("cva"), col("cvb")))
      .groupBy(col("m"), col("ia"))
      .agg(transform(array_sort(collect_list(struct(col("ib"), col("d2")))),
        x => x.getField("d2")).as("inner"))
      .groupBy(col("m"))
      .agg(transform(array_sort(collect_list(struct(col("ia"), col("inner")))),
        x => x.getField("inner")).as("mtab"))
      .agg(transform(array_sort(collect_list(struct(col("m"), col("mtab")))),
        x => x.getField("mtab")).as("dtabs"))
  }

  /** SDC approximate squared L2 between two DENSE code arrays: M O(1)
    * array picks + a sum (all codegen'd, no UDF). `private[graft]` so
    * the streaming face shares THIS gate rather than a copy that could
    * drift from the batch contract. */
  private[graft] def sdcDist(ca: org.apache.spark.sql.Column,
      cb: org.apache.spark.sql.Column,
      dtabs: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.SdcDist(ca, cb, dtabs)

  /** The pre-round-10 HOF spelling of [[sdcDist]], kept ONLY as the
    * independent reference implementation for SdcDistSpec's
    * value-identity pin: HigherOrderFunction expressions are
    * CodegenFallback, so this walks the lambda interpreter (with a
    * struct allocation per subspace) once per candidate pair — which
    * made it the dominant cost of the Σcell² stage at 64k vectors. */
  private[graft] def sdcDistHof(ca: org.apache.spark.sql.Column,
      cb: org.apache.spark.sql.Column,
      dtabs: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(
      zip_with(zip_with(ca, cb, (x, y) => struct(x.as("a"), y.as("b"))), dtabs,
        (p, t) => element_at(element_at(t, p.getField("a") + 1),
          p.getField("b") + 1)),
      lit(0.0), (acc, x) => acc + x)

  /** The build-stage products: learned centroids, residual codebook,
    * cluster assignments, coded corpus, SDC tables. `cents` + `cb` are
    * the persistable model ([[IncrementalIndex.writeVecIndex]] freezes
    * them so appended batches encode consistently). */
  private[ops] final case class Model(cents: DataFrame, cb: DataFrame,
      assigned: DataFrame, coded: DataFrame, dtabs: DataFrame)

  /** Shared build stage: learned clusters (the C37 assignment), unit
    * residuals vs the unit-normalized centroid, residual PQ codebook,
    * coded corpus, SDC tables.
    *
    * SAMPLE-TRAIN / ENCODE-ALL since round 14 (round-13 verdict item
    * 5): both iterative fits — the coarse k-means and the residual PQ
    * codebook — train on [[Vectors.trainSample]] of the corpus
    * (bit-identical below the cap, ~2^17 rows past it). The caller's k
    * is KEPT, not bounded by the sample (unlike [[IvfPq.buildIndex]],
    * whose bigger cells only raise probe recall): here cell size
    * drives the quadratic within-cell SDC pair stage, so shrinking k
    * would trade fit time for pair-stage time. At the cap, k =
    * adaptiveK(n) = n/512 gives the sample ~131 points per centroid at
    * n = 512k (inside FAISS's documented 39–256 useful range); past
    * that the per-centroid sample thins linearly — the documented
    * trade, with a larger cap or hierarchical coarse quantization as
    * the next lever.
    * ASSIGNMENT and ENCODING still touch every row exactly once — the
    * inherent index-build cost. The model is exported/persisted
    * learned state everywhere it is consumed, so downstream replay
    * (oracles, probes, appends) is unchanged in kind. `trainCap` is a
    * test seam. */
  private[ops] def buildModel(v: DataFrame, k: Int, iters: Int,
      numSub: Int, subDim: Int, pqK: Int, rows: Long = -1L,
      trainCap: Long = Vectors.TrainSampleCap): Model = {
    val (tv, tn) = Vectors.trainSample(v, rows, trainCap)
    val sampled = tn >= 0 && tn < rows
    val fit = KMeans.fit(tv, k = k, iters = iters, rows = tn)
    val assigned = assignWith(v, fit.centroids)
    val res = residualsOf(assigned, fit.centroids)
    // the codebook trains on the SAMPLE's residuals (recomputing the
    // sample's assignment is one extra cap-bounded argmax pass — cheap,
    // and keeps `res` a single full-corpus plan for the encode below)
    val trainRes =
      if (sampled) residualsOf(assignWith(tv, fit.centroids), fit.centroids)
      else res
    val cb = ProductQuant.fit(trainRes.select(col("vec_id"), col("e")),
      numSub, subDim, pqK, iters = 2, rows = tn).localCheckpoint(true)
    val remap = codeRemap(cb, numSub)
    val coded = toDense(
      ProductQuant.encode(res.select(col("vec_id"), col("e")), cb, numSub, subDim),
      remap)
      .join(assigned.select(col("vec_id"), col("cluster")), Seq("vec_id"))
    Model(fit.centroids, cb, assigned, coded, sdcTables(cb, remap, numSub))
  }

  /** Back-compat tuple face used by the card and specs. */
  private[ops] def build(v: DataFrame, k: Int, iters: Int,
      numSub: Int, subDim: Int, pqK: Int,
      rows: Long = -1L): (DataFrame, DataFrame, DataFrame) = {
    val m = buildModel(v, k, iters, numSub, subDim, pqK, rows)
    (m.assigned, m.coded, m.dtabs)
  }

  /** Broadcast-argmax cluster assignment against given centroids. */
  private[ops] def assignWith(v: DataFrame, cents: DataFrame): DataFrame = {
    val centsArr = cents.agg(array_sort(collect_list(
      struct(col("cluster"), col("ce"), col("cn")))).as("cents"))
    v.crossJoin(broadcast(centsArr))
      .select(col("vec_id"), col("e"), col("nrm"),
        graft.functions.NearestCentroids(col("e"), col("cents"), 1)
          .getItem(0).as("cluster"))
  }

  /** Unit-sphere residuals vs the UNIT-normalized centroid (d² = 2−2cos
    * on the sphere; any fixed per-cluster vector cancels in ua−ub, the
    * unit one keeps residuals near zero). The centroid attaches via a
    * BROADCAST HASH JOIN on the cluster id — still shuffle-free, but
    * unlike the previous `element_at(map_from_entries(transform(...)))`
    * spelling it does not rebuild a k-entry map PER ROW: at 512k
    * vectors × k=1000 that allocation was the single hottest stage of
    * the C76 build (measured 268 s of the 1930 s wall this round); the
    * per-row arithmetic (x/nrm − ce/cn elementwise) is unchanged, so
    * the oracle replay is too. */
  private[ops] def residualsOf(assigned: DataFrame, cents: DataFrame): DataFrame = {
    val uc = cents.select(col("cluster"),
      transform(col("ce"), x => x / col("cn")).as("__uce"))
    assigned
      .join(broadcast(uc), Seq("cluster"))
      .select(col("vec_id"), col("cluster"),
        zip_with(transform(col("e"), x => x / col("nrm")), col("__uce"),
          (x, y) => x - y).as("e"))
  }

  /** Encode a (vec_id, e, nrm) frame with a FROZEN model: assign
    * against stored centroids, code the residuals with the stored
    * codebook, remap to dense indices (the remap re-derives
    * deterministically from the codebook, so stored and freshly-encoded
    * codes always agree). Returns (vec_id, cluster, codes) — the
    * append path of [[IncrementalIndex]]'s vector index. */
  private[ops] def encodeWith(v: DataFrame, cents: DataFrame, cb: DataFrame,
      numSub: Int, subDim: Int): DataFrame = {
    val assigned = assignWith(v, cents)
    toDense(ProductQuant.encode(
        residualsOf(assigned, cents).select(col("vec_id"), col("e")),
        cb, numSub, subDim),
      codeRemap(cb, numSub))
      .join(assigned.select(col("vec_id"), col("cluster")), Seq("vec_id"))
  }

  /** The model collapsed to broadcast-literal columns + driver arrays —
    * what a STREAMING face embeds at plan time (model fixed at start,
    * refresh = restart), and what the drift baseline writer shares.
    * `cvs(m)` is subspace m's codebook in DENSE index order (ascending
    * code id — the [[codeRemap]] order, so literal-coded vectors agree
    * with the stored codes table); `dtabs` the SDC tables computed in
    * plain Scala from the same codebooks. */
  private[graft] final case class LitModel(centsArr: Column,
      unitCentMap: Column, cvs: Seq[Seq[Seq[Double]]],
      dtabs: Seq[Seq[Seq[Double]]])

  private[graft] def literalModel(cents: DataFrame, cb: DataFrame,
      numSub: Int): LitModel = {
    val centRows = cents.orderBy(col("cluster")).collect().map { r =>
      (r.getAs[Long]("cluster"),
        r.getAs[scala.collection.Seq[Double]]("ce").toSeq,
        r.getAs[Double]("cn"))
    }
    // an EMPTY standing index (first batch against a brand-new corpus)
    // still needs TYPED literals — a bare array()/map() is array<null>
    // and fails NearestCentroids' type check at analysis
    val centsArr =
      if (centRows.isEmpty)
        array().cast("array<struct<cluster:bigint,ce:array<double>,cn:double>>")
      else array(centRows.map { case (cl, ce, cn) =>
        struct(lit(cl).as("cluster"), typedLit(ce).as("ce"), lit(cn).as("cn"))
      }: _*)
    val unitCentMap =
      if (centRows.isEmpty) typedLit(Map.empty[Long, Seq[Double]])
      else map(centRows.flatMap { case (cl, ce, cn) =>
        Seq(lit(cl), typedLit(ce.map(_ / cn)))
      }: _*)
    val cbRows = cb.collect().map { r =>
      (r.getAs[Int]("m"), r.getAs[Long]("code"),
        r.getAs[scala.collection.Seq[Double]]("cv").toSeq)
    }
    val cvs: Seq[Seq[Seq[Double]]] = (0 until numSub).map { m =>
      cbRows.filter(_._1 == m).sortBy(_._2).map(_._3).toSeq
    }
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    LitModel(centsArr, unitCentMap, cvs,
      cvs.map(es => es.map(a => es.map(b => d2(a, b)))))
  }

  /** ONE stateless narrow projection per row against the literal model:
    * adds `cluster`, dense `codes`, and the per-vector residual
    * quantization error `qerr` = Σ_m min‖sv_m − cv‖² (the argmin
    * distances the coder computes anyway — the staleness signal
    * [[graft.streaming.StreamingVectors.driftStream]] monitors).
    * Works on streaming and batch frames alike. */
  private[graft] def litAssignCode(df: DataFrame, lm: LitModel,
      numSub: Int, subDim: Int): DataFrame = {
    val withRes = df
      // get(), not [0]: against an EMPTY centroid set (first deploy,
      // round-12 degenerate sweep) nearest_centroids returns [] and an
      // ANSI index access would kill the intake query; a null cluster
      // flows to defined null codes/qerr instead (and joins/flags drop
      // it naturally downstream)
      .withColumn("cluster",
        get(graft.functions.NearestCentroids(col("e"), lm.centsArr, 1), lit(0)))
      .withColumn("__r", zip_with(
        transform(col("e"), x => x / col("nrm")),
        element_at(lm.unitCentMap, col("cluster")),
        (x, y) => x - y))
    val best = (0 until numSub).map { m =>
      val sv = slice(col("__r"), m * subDim + 1, subDim)
      array_min(transform(typedLit(lm.cvs(m)),
        (cv, i) => struct(ProductQuant.l2(sv, cv).as("d"), i.as("i"))))
    }
    withRes
      .withColumn("codes", array(best.map(_.getField("i")): _*))
      .withColumn("qerr", best.map(_.getField("d")).reduce(_ + _))
      .drop("__r")
  }

  /** C79 probe core: batch vectors vs a standing coded corpus under a
    * frozen model. SDC candidates form ONLY within the batch vector's
    * cluster (equi-join on cluster — the posting-list shape); exact
    * confirm touches `standing`'s floats only for the candidate rows.
    * Same-cluster SDC stays exact-in-expectation here because BOTH
    * sides subtract the same stored centroid — the cancellation
    * argument is unchanged by freezing. The default margin is WIDER
    * than the in-corpus card's (0.25 vs 0.15): batch vectors quantize
    * against a codebook that never saw them, so their error runs above
    * the training-set measurement (observed: one batch near-pair at
    * margin 0.15 on the test corpus). Returns (vec_id, n_near,
    * best_cos) for batch vectors near-duplicating HISTORY; batch-
    * internal duplication is deliberately silent (the C36/C74
    * incremental contract). */
  private[ops] def probeAgainst(batch: DataFrame, standing: DataFrame,
      cents: DataFrame, cb: DataFrame, codes: DataFrame,
      numSub: Int, subDim: Int, tau: Double, margin: Double): DataFrame = {
    val bcoded = encodeWith(batch, cents, cb, numSub, subDim)
    val cut = 2.0 * (1.0 - tau + margin)
    val cand = bcoded
      .select(col("vec_id").as("b_id"), col("cluster"), col("codes").as("codes_b"))
      .join(codes.select(col("vec_id").as("s_id"), col("cluster"),
        col("codes").as("codes_s")), Seq("cluster"))
      .crossJoin(broadcast(sdcTables(cb, codeRemap(cb, numSub), numSub)))
      .where(sdcDist(col("codes_b"), col("codes_s"), col("dtabs")) <= cut)
      .select(col("b_id"), col("s_id"))
    val cos = Vectors.cosine(col("be"), col("se"), col("bn"), col("sn"))
    cand
      .join(batch.select(col("vec_id").as("b_id"), col("e").as("be"),
        col("nrm").as("bn")), Seq("b_id"))
      .join(standing.select(col("vec_id").as("s_id"), col("e").as("se"),
        col("nrm").as("sn")), Seq("s_id"))
      .withColumn("cos", cos)
      .where(col("cos") >= tau)
      .groupBy(col("b_id"))
      .agg(count(lit(1)).as("n_near"), round(max(col("cos")), 4).as("best_cos"))
      .select(col("b_id").as("vec_id"), col("n_near"), col("best_cos"))
  }

  /** Candidate near-dup pairs from codes alone: the C5 grid join on
    * (cluster, ga, gb) carrying (vec_id, codes), gated by the SDC
    * distance. Exposed so the spec can measure the pruning. Returns
    * (cluster, vec_a, vec_b). */
  private[ops] def candidatePairs(coded: DataFrame, dtabs: DataFrame,
      tau: Double, margin: Double, grid: Int): DataFrame = {
    val cells = array((0 until grid).map(lit): _*)
    val a = coded.select(col("vec_id").as("vec_a"), col("cluster"),
        col("codes").as("codes_a"))
      .withColumn("ga", pmod(hash(col("vec_a")), lit(grid)))
      .withColumn("gb", explode(cells))
    val b = coded.select(col("vec_id").as("vec_b"), col("cluster"),
        col("codes").as("codes_b"))
      .withColumn("gb", pmod(hash(col("vec_b")), lit(grid)))
      .withColumn("ga", explode(cells))
    // unit vectors: cos ≥ τ − margin  ⇔  d² ≤ 2(1 − τ + margin)
    val cut = 2.0 * (1.0 - tau + margin)
    a.join(b, Seq("cluster", "ga", "gb"))
      .where(col("vec_a") < col("vec_b"))
      .crossJoin(broadcast(dtabs))
      .where(sdcDist(col("codes_a"), col("codes_b"), col("dtabs")) <= cut)
      .select(col("cluster"), col("vec_a"), col("vec_b"))
  }

  /** Full card over any (vec_id, e, nrm) frame — the spec entry point.
    * Output schema and prune rule are exactly C37's
    * ([[VectorQueries.dedupSemantic]]); only the pair-join payload
    * differs (codes, not floats).
    *
    * What gets coded is the RESIDUAL u − centroid(u) (the C44 IVFADC
    * detail): for a SAME-CLUSTER pair the centroid cancels —
    * ‖ua−ub‖ = ‖ra−rb‖ exactly — so SDC over residual codes
    * approximates precisely the within-cluster distance the prune rule
    * needs, and the codebook budget is spent on the residual scale
    * where the discrimination lives. Coding absolute positions instead
    * collapses every within-cluster pair toward its centroid
    * (measured: ALL pairs pass any useful gate — zero pruning), which
    * is why this face shares the residual machinery, not raw PQ. */
  def card(v: DataFrame, tau: Double = 0.35, margin: Double = 0.15,
      k: Int = 0, iters: Int = 3, grid: Int = 4,
      numSub: Int = 16, subDim: Int = 4, pqK: Int = 64): DataFrame = {
    // k ≤ 0 → derive from corpus size (the SURVEY §5 lever as code;
    // resolves to 8 at the test SFs, n/4096 cells at scale)
    val n = v.count()
    val kk = if (k > 0) k else KMeans.adaptiveK(n)
    val (assigned, coded, dtabs) =
      build(v, kk, iters, numSub, subDim, pqK, rows = n)
    cardFrom(v, assigned, coded, dtabs, tau, margin, grid)
  }

  /** The scoring tail shared by the inline card and the persisted-model
    * serve face: SDC-gated candidates, exact confirm, per-cluster
    * aggregation. */
  private def cardFrom(v: DataFrame, assigned: DataFrame, coded0: DataFrame,
      dtabs: DataFrame, tau: Double, margin: Double, grid: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val s = coded0.sparkSession
    // PERSIST the slim coded frame (vec_id, cluster, codes — ~50 MB at
    // 512k): it feeds BOTH sides of the SDC self-join, and the card's
    // aggregate branches replay that join — without the cache the
    // assign + residual + PQ-encode pipeline derived FOUR times per
    // materialization (measured the round-14 profile's dominant
    // remainder at 512k after the trainer-sampling fix).
    val coded = coded0.persist(MEMORY_AND_DISK)
    val cand = candidatePairs(coded, dtabs, tau, margin, grid)
    // exact confirm: only the candidate list re-reads float vectors
    val cos = Vectors.cosine(col("ea"), col("eb"), col("na"), col("nb"))
    // pairs is output-scale — persisted so the Σcell² SDC gate runs
    // once, not once per aggregate branch below
    val pairs = cand
      .join(v.select(col("vec_id").as("vec_a"), col("e").as("ea"),
        col("nrm").as("na")), Seq("vec_a"))
      .join(v.select(col("vec_id").as("vec_b"), col("e").as("eb"),
        col("nrm").as("nb")), Seq("vec_b"))
      .withColumn("cos", cos)
      .where(col("cos") >= tau)
      .select(col("cluster"), col("vec_a"), col("vec_b"), col("cos"))
      .persist(MEMORY_AND_DISK)
    CacheScope.releaseAfterAction(s, coded, pairs)
    val pruned = pairs.select(col("cluster"), col("vec_b").as("vec_id")).distinct()
    val sizes = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("n_vecs"))
    val pairStats = pairs.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_pairs"), round(avg(col("cos")), 4).as("avg_pair_cos"))
    val prunedCounts = pruned.groupBy(col("cluster")).agg(count(lit(1)).as("n_pruned"))
    sizes
      .join(prunedCounts, Seq("cluster"), "left")
      .join(pairStats, Seq("cluster"), "left")
      .select(col("cluster"), col("n_vecs"),
        coalesce(col("n_pruned"), lit(0L)).as("n_pruned"),
        (col("n_vecs") - coalesce(col("n_pruned"), lit(0L))).as("n_kept"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("avg_pair_cos"), lit(0.0)).as("avg_pair_cos"))
      .orderBy(col("cluster"))
  }

  /** C76 query face over the embeddings table. SQL-CHECKED since round
    * 11: the learned model — centroids + residual codebook — exports at
    * [[SemPqCentsPath]]/[[SemPqCbPath]] and the DuckDB oracle re-derives
    * EVERYTHING: the argmax assignment, the unit residuals, the argmin
    * encode, the code-pair SDC table (l2 between codebook entries), the
    * ordered SDC gate at the identical IEEE cut expression, the exact
    * confirm, and the card. SemanticPqSpec stays the semantic anchor
    * (card equality with C37, planted pairs, margin headroom). */
  def dedupSemanticPq(s: SparkSession, dir: String): DataFrame = {
    // materialize once + row-aware spread (round-15): the corpus frame
    // feeds the model build (assign/residual/encode) AND both sides of
    // the exact confirm — previously each consumer re-derived scan+norm
    // serially from the single-rowgroup input
    val (v, n) = Vectors.materializeSpread(
      Vectors.withNorm(Tables(s, dir, "embeddings"), "embedding")
        .select(col("vec_id"), col("e"), col("nrm")))
    val m = buildModel(v, KMeans.adaptiveK(n), iters = 3,
      numSub = 16, subDim = 4, pqK = 64, rows = n)
    graft.ops.VectorQueries.exportSide(
      m.cents.select(col("cluster"), col("ce"), col("cn")), SemPqCentsPath)
    graft.ops.VectorQueries.exportSide(m.cb, SemPqCbPath)
    cardFrom(v, m.assigned, m.coded, m.dtabs,
      tau = 0.35, margin = 0.15, grid = 4)
  }

  private def sidePath(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_$name.parquet"
  val SemPqCentsPath: String = sidePath("sempq_cents")
  val SemPqCbPath: String = sidePath("sempq_cb")
  val SemPqCachedCentsPath: String = sidePath("sempqc_cents")
  val SemPqCachedCbPath: String = sidePath("sempqc_cb")

  /** C76/C76a oracle: centroids + residual codebook as data; assignment,
    * unit residuals, argmin encode, the code-pair SDC table, the gate
    * (the cut spelled as the same IEEE expression, never a rounded
    * literal), exact confirm, and the card all replayed. */
  private def semPqOracle(centsPath: String, cbPath: String): String =
    s"""WITH cents AS (SELECT cluster, ce, cn,
       |                      list_transform(ce, x -> x/cn) AS uce
       |               FROM '$centsPath/*.parquet'),
       |cb AS (SELECT m, code, cv FROM '$cbPath/*.parquet'),
       |v0 AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
       |       FROM embeddings),
       |nn AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v0
       |       WHERE sqrt(list_dot_product(e, e)) > 0),
       |sc AS (SELECT nn.vec_id, nn.e, nn.nrm, c.cluster, c.uce,
       |              list_dot_product(nn.e, c.ce)/c.cn AS s
       |       FROM nn, cents c),
       |asg AS (SELECT vec_id, e, nrm, cluster, uce FROM (
       |          SELECT *, row_number() OVER (PARTITION BY vec_id
       |            ORDER BY s DESC, cluster) AS rn FROM sc) WHERE rn = 1),
       |res AS (SELECT vec_id, cluster,
       |               list_transform(list_zip(list_transform(e, x -> x/nrm),
       |                 uce), z -> z[1]-z[2]) AS r
       |        FROM asg),
       |sv AS (SELECT vec_id, cluster, m, r[m*4+1 : m*4+4] AS sv
       |       FROM res, generate_series(0, 15) t(m)),
       |df2 AS (SELECT s2.vec_id, s2.m, c2.code,
       |               list_transform(list_zip(s2.sv, c2.cv), z -> z[1]-z[2]) AS dl
       |        FROM sv s2 JOIN cb c2 ON s2.m = c2.m),
       |dd AS (SELECT vec_id, m, code, list_dot_product(dl, dl) AS d FROM df2),
       |enc AS (SELECT vec_id, m, code FROM (
       |          SELECT *, row_number() OVER (PARTITION BY vec_id, m
       |            ORDER BY d, code) AS rn FROM dd) WHERE rn = 1),
       |cd AS (SELECT x.m, x.code AS ca, y.code AS cb2,
       |              list_dot_product(
       |                list_transform(list_zip(x.cv, y.cv), z -> z[1]-z[2]),
       |                list_transform(list_zip(x.cv, y.cv), z -> z[1]-z[2])) AS d2
       |       FROM cb x JOIN cb y ON x.m = y.m),
       |pp AS (SELECT a.cluster, a.vec_id AS vec_a, b.vec_id AS vec_b
       |       FROM asg a JOIN asg b
       |         ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
       |sdc AS (SELECT p.cluster, p.vec_a, p.vec_b,
       |               list_dot_product(list(cd.d2 ORDER BY cd.m),
       |                 [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0,
       |                  1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]) AS ad
       |        FROM pp p
       |        JOIN enc ea ON ea.vec_id = p.vec_a
       |        JOIN enc eb ON eb.vec_id = p.vec_b AND eb.m = ea.m
       |        JOIN cd ON cd.m = ea.m AND cd.ca = ea.code AND cd.cb2 = eb.code
       |        GROUP BY 1, 2, 3),
       |gated AS (SELECT cluster, vec_a, vec_b FROM sdc
       |          WHERE ad <= 2.0*(1.0 - 0.35 + 0.15)),
       |pf AS (SELECT g.cluster, g.vec_a, g.vec_b,
       |              list_dot_product(x.e, y.e)/(x.nrm*y.nrm) AS cos
       |       FROM gated g JOIN nn x ON x.vec_id = g.vec_a
       |                    JOIN nn y ON y.vec_id = g.vec_b
       |       WHERE list_dot_product(x.e, y.e)/(x.nrm*y.nrm) >= 0.35),
       |sz AS (SELECT cluster, count(*)::BIGINT AS n_vecs FROM asg GROUP BY 1),
       |ps AS (SELECT cluster, count(*)::BIGINT AS n_pairs,
       |              round(avg(cos), 4) AS avg_pair_cos FROM pf GROUP BY 1),
       |pd AS (SELECT cluster, count(DISTINCT vec_b)::BIGINT AS n_pruned
       |       FROM pf GROUP BY 1)
       |SELECT sz.cluster, sz.n_vecs,
       |       coalesce(pd.n_pruned, 0)::BIGINT AS n_pruned,
       |       (sz.n_vecs - coalesce(pd.n_pruned, 0))::BIGINT AS n_kept,
       |       coalesce(ps.n_pairs, 0)::BIGINT AS n_pairs,
       |       coalesce(ps.avg_pair_cos, 0.0) AS avg_pair_cos
       |FROM sz LEFT JOIN pd USING (cluster) LEFT JOIN ps USING (cluster)
       |ORDER BY sz.cluster""".stripMargin

  val dedupSemanticPqOracle: String = semPqOracle(SemPqCentsPath, SemPqCbPath)
  val dedupSemanticPqCachedOracle: String =
    semPqOracle(SemPqCachedCentsPath, SemPqCachedCbPath)

  /** C79: semantic dedup's INCREMENTAL face — which of today's batch
    * vectors near-duplicate the STANDING corpus, completing the
    * incremental trilogy (C36 documents, C74 spans, now embeddings).
    * The model (centroids + residual codebook) and the standing codes
    * derive inline here, like `dedup_incremental` derives its indexes
    * inline; the production path is [[IncrementalIndex.writeVecIndex]]
    * / probeVecs / appendVecIndex against stored tables, spec-pinned
    * by the same recount. Batch split: vec_id ≡ 4 (mod 5), the
    * C36/C74 convention. Per-label card of batch size, flagged
    * vectors, pair counts, and integer-bp flagged share. Rows-only;
    * IncrementalVecSpec is the oracle (driver recount + index cycle +
    * batch-internal silence). */
  def dedupSemanticIncremental(s: SparkSession, dir: String,
      tau: Double = 0.35, margin: Double = 0.25): DataFrame = {
    // materialize once + row-aware spread (the dedupSemanticPq rationale)
    val (v, _) = Vectors.materializeSpread(
      Vectors.withNorm(Tables(s, dir, "embeddings"), "embedding")
        .select(col("vec_id"), col("label"), col("e"), col("nrm")))
    val (standing, batch) = splitBatch(v)
    val nStand = standing.count()
    val m = buildModel(standing, k = KMeans.adaptiveK(nStand),
      iters = 3, numSub = 16, subDim = 4, pqK = 64, rows = nStand)
    // SQL-checked since round 11: the frozen standing-corpus model
    // exports; the oracle re-derives BOTH sides' assignment/encode from
    // it (standing codes equal a re-encode by construction), replays
    // the SDC gate, exact confirm, and the per-label card
    graft.ops.VectorQueries.exportSide(
      m.cents.select(col("cluster"), col("ce"), col("cn")), SemIncCentsPath)
    graft.ops.VectorQueries.exportSide(m.cb, SemIncCbPath)
    incrementalCard(v, probeAgainst(batch, standing, m.cents, m.cb,
      m.coded.select(col("vec_id"), col("cluster"), col("codes")),
      numSub = 16, subDim = 4, tau, margin))
  }

  val SemIncCentsPath: String = sidePath("seminc_cents")
  val SemIncCbPath: String = sidePath("seminc_cb")
  val SemIncCachedCentsPath: String = sidePath("semincc_cents")
  val SemIncCachedCbPath: String = sidePath("semincc_cb")

  /** C79/C79a oracle: the standing-corpus model as data; batch AND
    * standing assignment/residual/encode re-derived from it, the
    * (batch × same-cluster standing) SDC gate at the wider probe
    * margin, the exact confirm, per-vector flags, and the per-label
    * card all replayed. */
  private def semIncOracle(centsPath: String, cbPath: String): String =
    s"""WITH cents AS (SELECT cluster, ce, cn,
       |                      list_transform(ce, x -> x/cn) AS uce
       |               FROM '$centsPath/*.parquet'),
       |cb AS (SELECT m, code, cv FROM '$cbPath/*.parquet'),
       |v0 AS (SELECT vec_id, label,
       |              list_transform(embedding, x -> x::DOUBLE) AS e
       |       FROM embeddings),
       |nn AS (SELECT vec_id, label, e,
       |              sqrt(list_dot_product(e, e)) AS nrm FROM v0
       |       WHERE sqrt(list_dot_product(e, e)) > 0),
       |sc AS (SELECT nn.vec_id, nn.e, nn.nrm, c.cluster, c.uce,
       |              list_dot_product(nn.e, c.ce)/c.cn AS s
       |       FROM nn, cents c),
       |asg AS (SELECT vec_id, e, nrm, cluster, uce FROM (
       |          SELECT *, row_number() OVER (PARTITION BY vec_id
       |            ORDER BY s DESC, cluster) AS rn FROM sc) WHERE rn = 1),
       |res AS (SELECT vec_id, cluster,
       |               list_transform(list_zip(list_transform(e, x -> x/nrm),
       |                 uce), z -> z[1]-z[2]) AS r
       |        FROM asg),
       |sv AS (SELECT vec_id, cluster, m, r[m*4+1 : m*4+4] AS sv
       |       FROM res, generate_series(0, 15) t(m)),
       |df2 AS (SELECT s2.vec_id, s2.m, c2.code,
       |               list_transform(list_zip(s2.sv, c2.cv), z -> z[1]-z[2]) AS dl
       |        FROM sv s2 JOIN cb c2 ON s2.m = c2.m),
       |dd AS (SELECT vec_id, m, code, list_dot_product(dl, dl) AS d FROM df2),
       |enc AS (SELECT vec_id, m, code FROM (
       |          SELECT *, row_number() OVER (PARTITION BY vec_id, m
       |            ORDER BY d, code) AS rn FROM dd) WHERE rn = 1),
       |cd AS (SELECT x.m, x.code AS ca, y.code AS cb2,
       |              list_dot_product(
       |                list_transform(list_zip(x.cv, y.cv), z -> z[1]-z[2]),
       |                list_transform(list_zip(x.cv, y.cv), z -> z[1]-z[2])) AS d2
       |       FROM cb x JOIN cb y ON x.m = y.m),
       |pp AS (SELECT b.vec_id AS b_id, st.vec_id AS s_id
       |       FROM asg b JOIN asg st ON b.cluster = st.cluster
       |       WHERE b.vec_id % 5 = 4 AND st.vec_id % 5 <> 4),
       |sdc AS (SELECT p.b_id, p.s_id,
       |               list_dot_product(list(cd.d2 ORDER BY cd.m),
       |                 [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0,
       |                  1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]) AS ad
       |        FROM pp p
       |        JOIN enc ea ON ea.vec_id = p.b_id
       |        JOIN enc eb ON eb.vec_id = p.s_id AND eb.m = ea.m
       |        JOIN cd ON cd.m = ea.m AND cd.ca = ea.code AND cd.cb2 = eb.code
       |        GROUP BY 1, 2),
       |pf AS (SELECT g.b_id,
       |              list_dot_product(x.e, y.e)/(x.nrm*y.nrm) AS cos
       |       FROM (SELECT b_id, s_id FROM sdc
       |             WHERE ad <= 2.0*(1.0 - 0.35 + 0.25)) g
       |       JOIN nn x ON x.vec_id = g.b_id
       |       JOIN nn y ON y.vec_id = g.s_id
       |       WHERE list_dot_product(x.e, y.e)/(x.nrm*y.nrm) >= 0.35),
       |fl AS (SELECT b_id AS vec_id, count(*)::BIGINT AS n_near,
       |              round(max(cos), 4) AS best_cos FROM pf GROUP BY 1)
       |SELECT nn.label,
       |       count(*)::BIGINT AS batch_vecs,
       |       count(fl.n_near)::BIGINT AS flagged,
       |       coalesce(sum(fl.n_near), 0)::BIGINT AS near_pairs,
       |       round(coalesce(avg(fl.best_cos), 0.0), 4) AS avg_best_cos,
       |       count(fl.n_near)::BIGINT * 10000 // count(*)::BIGINT AS flagged_bp
       |FROM nn LEFT JOIN fl ON fl.vec_id = nn.vec_id
       |WHERE nn.vec_id % 5 = 4
       |GROUP BY nn.label ORDER BY nn.label""".stripMargin

  val dedupSemanticIncrementalOracle: String =
    semIncOracle(SemIncCentsPath, SemIncCbPath)
  val dedupSemanticIncrementalCachedOracle: String =
    semIncOracle(SemIncCachedCentsPath, SemIncCachedCbPath)

  /** C79a: the SERVE face — probes against the [[IncrementalIndex]]
    * vector tables persisted under the [[ArtifactStore]] root
    * (self-healing: built from the standing corpus on first call), so
    * this bench entry isolates the recurring daily-probe cost from the
    * index build. Identical results to [[dedupSemanticIncremental]]
    * (training is deterministic; CachedFacesSpec pins cold and warm). */
  def dedupSemanticIncrementalCached(s: SparkSession, dir: String): DataFrame = {
    // warm serve stays lazy (round-15 A/B)
    val v = Vectors.withNorm(Tables(s, dir, "embeddings"), "embedding")
      .select(col("vec_id"), col("label"), col("e"), col("nrm"))
    val (standing, batch) = splitBatch(v)
    val root = ArtifactStore.path(dir, "vecindex")
    if (!ArtifactStore.has(s, dir,
        "vecindex/vcents", "vecindex/vcb", "vecindex/vcodes"))
      IncrementalIndex.writeVecIndex(root, standing)
    // own exported copies of the stored model for the DuckDB replay
    graft.ops.VectorQueries.exportSide(
      s.read.parquet(s"$root/vcents").select(col("cluster"), col("ce"), col("cn")),
      SemIncCachedCentsPath)
    graft.ops.VectorQueries.exportSide(
      s.read.parquet(s"$root/vcb"), SemIncCachedCbPath)
    incrementalCard(v, IncrementalIndex.probeVecs(s, root, batch, standing))
  }

  /** C76a: the SERVE face of the PQ semantic-dedup card — scores
    * against the persisted centroids + codebook + standing codes
    * instead of training inline. Identical results to
    * [[dedupSemanticPq]] (CachedFacesSpec pins cold and warm). */
  def dedupSemanticPqCached(s: SparkSession, dir: String,
      tau: Double = 0.35, margin: Double = 0.15, grid: Int = 4): DataFrame = {
    val numSub = 16; val subDim = 4
    // warm serve stays lazy (round-15 A/B); the cold build branch
    // materializes its own spread frame
    val v = Vectors.withNorm(Tables(s, dir, "embeddings"), "embedding")
      .select(col("vec_id"), col("e"), col("nrm"))
    if (!ArtifactStore.has(s, dir, "sempq_cents", "sempq_cb", "sempq_codes")) {
      val (u, n) = Vectors.materializeSpread(v)
      val m = buildModel(u, k = KMeans.adaptiveK(n), iters = 3,
        numSub, subDim, pqK = 64, rows = n)
      ArtifactStore.save(m.cents, dir, "sempq_cents")
      ArtifactStore.save(m.cb, dir, "sempq_cb")
      ArtifactStore.save(
        m.coded.select(col("vec_id"), col("cluster"), col("codes")),
        dir, "sempq_codes")
    }
    val cents = ArtifactStore.load(s, dir, "sempq_cents")
    val cb = ArtifactStore.load(s, dir, "sempq_cb")
    // own exported copies of the stored model for the DuckDB replay
    // (the C44a posture: stored codes equal a re-encode by construction)
    graft.ops.VectorQueries.exportSide(
      cents.select(col("cluster"), col("ce"), col("cn")), SemPqCachedCentsPath)
    graft.ops.VectorQueries.exportSide(cb, SemPqCachedCbPath)
    cardFrom(v, assignWith(v, cents), ArtifactStore.load(s, dir, "sempq_codes"),
      sdcTables(cb, codeRemap(cb, numSub), numSub), tau, margin, grid)
  }

  /** The batch/standing split every incremental face shares:
    * vec_id ≡ 4 (mod 5), the C36/C74 convention. */
  private def splitBatch(v: DataFrame): (DataFrame, DataFrame) = {
    val isNew = col("vec_id") % 5 === 4
    val cols = Seq(col("vec_id"), col("e"), col("nrm"))
    (v.where(!isNew).select(cols: _*), v.where(isNew).select(cols: _*))
  }

  /** Per-label aggregation of probe flags over the batch side. */
  private def incrementalCard(v: DataFrame, flags: DataFrame): DataFrame =
    v.where(col("vec_id") % 5 === 4).select(col("vec_id"), col("label"))
      .join(flags, Seq("vec_id"), "left")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("batch_vecs"),
        count(col("n_near")).as("flagged"),
        coalesce(sum(col("n_near")), lit(0L)).as("near_pairs"),
        round(coalesce(avg(col("best_cos")), lit(0.0)), 4).as("avg_best_cos"))
      .withColumn("flagged_bp", expr("flagged * 10000 div batch_vecs"))
      .orderBy(col("label"))
}
