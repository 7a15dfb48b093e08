package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** IVF-PQ composed ANN — C44: the coarse partitioner (C16a's learned
  * IVF) carrying PQ codes in its posting lists, i.e. the architecture
  * every production-scale vector service actually deploys (Jégou et
  * al.'s IVFADC; FAISS `IndexIVFPQ`). IVF alone still stores raw
  * vectors in the lists (memory ∝ corpus × dim); PQ alone still scans
  * every code (compute ∝ corpus). Composed: a query touches only
  * `nprobe` posting lists AND each candidate costs M map lookups —
  * memory ∝ corpus × M bytes, compute ∝ corpus × nprobe / k_coarse.
  *
  * RESIDUAL encoding, the IVFADC detail that matters: what gets
  * PQ-coded is `e − centroid(e)`, not `e`. Residuals concentrate near
  * zero with most of the between-cluster variance removed, so the same
  * codebook budget quantizes far finer; one codebook is SHARED across
  * clusters (the FAISS default — per-cluster books multiply memory by
  * k_coarse for marginal gain). The query side then needs a distance
  * table PER (query, probed cluster) — `q − centroid` differs per
  * probe — which costs nprobe × M × k table entries per query, still
  * broadcast-tiny.
  *
  * Plan shape at 100 TB: build = one KMeans assignment pass + one PQ
  * train/encode pass over residuals (narrow, broadcast codebooks);
  * search = posting-list equi-join on the probed cluster ids (the C16
  * bucket-bounded join), ADC as a per-row zip_with over broadcast
  * tables, exact rescore only on the top-`rerank` candidate set.
  * Deterministic like its parents — rows-only entry, recall
  * spec-bounded in IvfPqSpec.
  */
object IvfPq {

  /** Corpus → (cluster, centroid arrays, residual frame). The assigned
    * centroid attaches via a BROADCAST HASH JOIN on the cluster id —
    * shuffle-free like the argmax, but without rebuilding a k-entry
    * map per corpus row (the measured hot allocation of the C76 build;
    * the query-side ADC tables below keep the map spelling, which is
    * query-set-sized). */
  private def residuals(v: DataFrame, cents: DataFrame): DataFrame = {
    val centsArr = cents.agg(array_sort(collect_list(
      struct(col("cluster"), col("ce"), col("cn")))).as("cents"))
    v.crossJoin(broadcast(centsArr))
      .withColumn("cluster",
        graft.functions.NearestCentroids(col("e"), col("cents"), 1).getItem(0))
      .drop("cents")
      .join(broadcast(cents.select(col("cluster"), col("ce"))), Seq("cluster"))
      .select(col("vec_id"), col("cluster"), col("e"), col("nrm"),
        zip_with(col("e"), col("ce"), (x, y) => x - y).as("r"))
  }

  /** The corpus frames every face shares: raw (for rescore) + unit. */
  private def frames(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val v = Vectors.withNorm(Tables(s, dir, "embeddings"), "embedding")
      .select(col("vec_id"), col("e"), col("nrm"))
    val unit = v.select(col("vec_id"),
      transform(col("e"), x => x / col("nrm")).as("e"), lit(1.0).as("nrm"))
    (v, unit)
  }

  /** Index build: coarse centroids, shared residual codebook, postings
    * (vec_id, codes, cluster). One KMeans pass + one PQ train/encode
    * pass over residuals.
    *
    * SAMPLE-TRAIN / ENCODE-ALL since round 14 (round-13 verdict item
    * 3): both fits train on [[Vectors.trainSample]] (bit-identical
    * below the ~2^17-row cap — every gate SF and the 64k decade), and
    * the coarse cell count is bounded by what the sample supports
    * (adaptiveK of the sample). This is exactly FAISS's documented
    * practice for IVF-PQ at corpus scale and what turned the 4M build
    * from >66 min (inline fit at adaptiveK(4M)=7813 cells over all 4M
    * rows) into a measured single-digit-minute build: the Θ(rows × k)
    * fit rounds run on the capped sample, while assignment + PQ encode
    * — the inherent touch-every-row-once cost — run on the corpus.
    * `trainCap` is a test seam. */
  private[ops] def buildIndex(s: SparkSession, unit: DataFrame,
      numSub: Int, subDim: Int, k: Int,
      trainCap: Long = Vectors.TrainSampleCap,
      coarseK: Int = -1, rows: Long = -1L): (DataFrame, DataFrame, DataFrame) = {
    val n = if (rows >= 0) rows else unit.count()
    val (tu, tn) = Vectors.trainSample(unit, n, trainCap)
    val sampled = tn >= 0 && tn < n
    val kc = if (coarseK > 0) coarseK
      else KMeans.adaptiveK(if (sampled) tn else n)
    val coarse = KMeans.fit(tu, k = kc, iters = 3, rows = tn).centroids
    val res = residuals(unit, coarse)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    CacheScope.releaseAfterAction(s, res)
    val rFrame = res.select(col("vec_id"), col("r").as("e"))
    // the codebook trains on the sample's residuals (one extra
    // cap-bounded argmax pass when sampling; the full-corpus `res`
    // plan stays single-purpose for the encode)
    val rTrain =
      if (sampled) residuals(tu, coarse).select(col("vec_id"), col("r").as("e"))
      else rFrame
    val cb = ProductQuant.fit(rTrain, numSub, subDim, k, iters = 2, rows = tn)
    val postings = ProductQuant.encode(rFrame, cb, numSub, subDim)
      .join(res.select(col("vec_id"), col("cluster")), Seq("vec_id"))
    (coarse, cb, postings)
  }

  /** C44 query face: IVF-PQ top-10 for the query set vec_id < 5.
    * k_coarse=8 IVF clusters (3 Lloyd rounds), shared residual PQ
    * codebook (M=8 × 8 dims, k=16, 2 rounds), nprobe=2, top-100 ADC
    * candidates, exact cosine rescore, top-10.
    *
    * ABOVE-KNEE POSTURE (round-15 rule, BASELINE "the ONE
    * quantized-family rule"): quantized serves are GEOMETRY-gated, not
    * size-gated — no knee route. On clustered geometry the sampled fit
    * holds real recall at every measured scale (ivfpq 0.84 at 512k /
    * 0.64 at 4M, serve 5.0 s vs exact 3.5 s at 4M, probe-bounded past
    * it); on structure-free geometry recall is noise, and the C87/C87a
    * audit — not a corpus count — is the operational detector. */
  def simSearchIvfPq(s: SparkSession, dir: String): DataFrame = {
    val numSub = 8; val subDim = 8; val k = 16
    val (v, unit0) = frames(s, dir)
    // materialize once + row-aware spread (round-15): the unit frame
    // feeds the coarse fit, the residual/encode passes, and the query
    // probes — previously each re-derived it from the single-task scan
    val (unit, n) = Vectors.materializeSpread(unit0)
    val (coarse, cb, postings) = buildIndex(s, unit, numSub, subDim, k, rows = n)
    // round-11 oracle exports: coarse centroids + the shared residual
    // codebook are the ONLY learned state — the posting lists re-derive
    // from them deterministically, so the DuckDB replay rebuilds the
    // whole index (assignment → residual → encode) and the serve path.
    // Both frames are localCheckpoint-materialized, so the in-plan
    // copies and the exported parquet carry identical doubles.
    graft.ops.VectorQueries.exportSide(
      coarse.select(col("cluster"), col("ce"), col("cn")), IvfPqCoarsePath)
    graft.ops.VectorQueries.exportSide(cb, IvfPqCbPath)
    search(v, unit, coarse, cb, postings, numSub, subDim, nprobe = 2, rows = n)
  }

  /** C44a: the PERSISTED-INDEX face — centroids, codebook, and posting
    * lists parquet-persisted on first build ([[ArtifactStore]]); every
    * search runs against the stored index, isolating the recurring
    * serve cost from inline index construction. Results identical to
    * [[simSearchIvfPq]] (IvfPqSpec pins equality cold and warm). */
  def simSearchIvfPqCached(s: SparkSession, dir: String): DataFrame = {
    val numSub = 8; val subDim = 8; val k = 16
    val (v, unit) = frames(s, dir)
    // warm serve stays lazy (round-15 A/B: a count + checkpoint taxes
    // it); the cold build branch materializes its own spread frame
    if (!ArtifactStore.has(s, dir, "ivfpq_coarse", "ivfpq_cb", "ivfpq_postings")) {
      val (u, n) = Vectors.materializeSpread(unit)
      val (coarse, cb, postings) = buildIndex(s, u, numSub, subDim, k, rows = n)
      ArtifactStore.save(coarse, dir, "ivfpq_coarse")
      ArtifactStore.save(cb, dir, "ivfpq_cb")
      ArtifactStore.save(postings, dir, "ivfpq_postings")
    }
    val coarse = ArtifactStore.load(s, dir, "ivfpq_coarse")
    val cb = ArtifactStore.load(s, dir, "ivfpq_cb")
    // own exported copies of the stored model (replay independent of
    // which face ran last); stored postings equal a re-encode from the
    // stored model by construction, so the oracle re-derives them
    graft.ops.VectorQueries.exportSide(
      coarse.select(col("cluster"), col("ce"), col("cn")), IvfPqCachedCoarsePath)
    graft.ops.VectorQueries.exportSide(cb, IvfPqCachedCbPath)
    search(v, unit, coarse, cb,
      ArtifactStore.load(s, dir, "ivfpq_postings"),
      numSub, subDim, nprobe = 2)
  }

  /** Build + serve at an EXPLICIT coarse cell count — the measurement
    * seam behind the round-14 operating-point grid (no exports, no
    * artifacts). */
  private[ops] def simSearchIvfPqAt(s: SparkSession, dir: String,
      coarseK: Int, trainCap: Long = Vectors.TrainSampleCap): DataFrame = {
    val (v, unit) = frames(s, dir)
    val (coarse, cb, postings) = buildIndex(s, unit, numSub = 8, subDim = 8,
      k = 16, trainCap = trainCap, coarseK = coarseK)
    search(v, unit, coarse, cb, postings, numSub = 8, subDim = 8, nprobe = 2)
  }

  private def sidePath(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_$name.parquet"
  val IvfPqCoarsePath: String = sidePath("ivfpq_coarse_side")
  val IvfPqCbPath: String = sidePath("ivfpq_cb_side")
  val IvfPqCachedCoarsePath: String = sidePath("ivfpqc_coarse_side")
  val IvfPqCachedCbPath: String = sidePath("ivfpqc_cb_side")

  /** C44/C44a oracle: coarse centroids + residual codebook as data; the
    * oracle rebuilds the index (argmax assignment → residual → argmin
    * encode) AND the serve path (probe selection, per-(query, cluster)
    * residual ADC tables, bucket-bounded scan, exact rescore, rank) —
    * the posting lists themselves are re-derived, not consumed. */
  private def ivfPqOracle(coarsePath: String, cbPath: String): String =
    s"""WITH cents AS (SELECT cluster, ce, cn FROM '$coarsePath/*.parquet'),
       |cb AS (SELECT m, code, cv FROM '$cbPath/*.parquet'),
       |v0 AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
       |       FROM embeddings),
       |nn AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v0
       |       WHERE sqrt(list_dot_product(e, e)) > 0),
       |u AS (SELECT vec_id, list_transform(e, x -> x/nrm) AS e FROM nn),
       |sc AS (SELECT u.vec_id, u.e, c.cluster, c.ce,
       |              list_dot_product(u.e, c.ce)/c.cn AS s
       |       FROM u, cents c),
       |asg AS (SELECT vec_id, e, cluster, ce FROM (
       |          SELECT *, row_number() OVER (PARTITION BY vec_id
       |            ORDER BY s DESC, cluster) AS rn FROM sc) WHERE rn = 1),
       |res AS (SELECT vec_id, cluster,
       |               list_transform(list_zip(e, ce), z -> z[1]-z[2]) AS r
       |        FROM asg),
       |sv AS (SELECT vec_id, cluster, m, r[m*8+1 : m*8+8] AS sv
       |       FROM res, generate_series(0, 7) t(m)),
       |df2 AS (SELECT s2.vec_id, s2.cluster, s2.m, c2.code,
       |               list_transform(list_zip(s2.sv, c2.cv), z -> z[1]-z[2]) AS dl
       |        FROM sv s2 JOIN cb c2 ON s2.m = c2.m),
       |dd AS (SELECT vec_id, cluster, m, code,
       |              list_dot_product(dl, dl) AS d FROM df2),
       |enc AS (SELECT vec_id, cluster, m, code FROM (
       |          SELECT *, row_number() OVER (PARTITION BY vec_id, m
       |            ORDER BY d, code) AS rn FROM dd) WHERE rn = 1),
       |pr AS (SELECT vec_id AS query_id, e, cluster, ce FROM (
       |          SELECT *, row_number() OVER (PARTITION BY vec_id
       |            ORDER BY s DESC, cluster) AS rn FROM sc WHERE vec_id < 5)
       |       WHERE rn <= 2),
       |qres AS (SELECT query_id, cluster,
       |                list_transform(list_zip(e, ce), z -> z[1]-z[2]) AS r
       |         FROM pr),
       |qsv AS (SELECT query_id, cluster, m, r[m*8+1 : m*8+8] AS sv
       |        FROM qres, generate_series(0, 7) t(m)),
       |qdl AS (SELECT q.query_id, q.cluster, q.m, c2.code,
       |               list_transform(list_zip(q.sv, c2.cv), z -> z[1]-z[2]) AS dl
       |        FROM qsv q JOIN cb c2 ON q.m = c2.m),
       |qd AS (SELECT query_id, cluster, m, code,
       |              list_dot_product(dl, dl) AS d FROM qdl),
       |ad AS (SELECT q.query_id, e2.vec_id,
       |              list_dot_product(list(q.d ORDER BY q.m),
       |                [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]) AS approx_d
       |       FROM enc e2 JOIN qd q
       |         ON e2.cluster = q.cluster AND e2.m = q.m AND e2.code = q.code
       |       WHERE e2.vec_id <> q.query_id
       |       GROUP BY 1, 2),
       |cand AS (SELECT query_id, vec_id FROM (
       |           SELECT *, row_number() OVER (PARTITION BY query_id
       |             ORDER BY approx_d, vec_id) AS crk FROM ad)
       |         WHERE crk <= greatest(100, (SELECT count(*) FROM nn) // 80)),
       |rs AS (SELECT c3.query_id, c3.vec_id,
       |              round(list_dot_product(qn.e, cn2.e)/(qn.nrm*cn2.nrm), 4)
       |                AS cosine
       |       FROM cand c3 JOIN nn qn ON qn.vec_id = c3.query_id
       |                    JOIN nn cn2 ON cn2.vec_id = c3.vec_id),
       |r AS (SELECT *, rank() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC, vec_id) AS rnk FROM rs)
       |SELECT query_id, rnk, vec_id, cosine FROM r WHERE rnk <= 10
       |ORDER BY query_id, rnk, vec_id""".stripMargin

  val simSearchIvfPqOracle: String = ivfPqOracle(IvfPqCoarsePath, IvfPqCbPath)
  val simSearchIvfPqCachedOracle: String =
    ivfPqOracle(IvfPqCachedCoarsePath, IvfPqCachedCbPath)

  /** The serve path: probe selection, per-(query, cluster) ADC tables,
    * bucket-bounded ADC scan, exact rescore. */
  private def search(v: DataFrame, unit: DataFrame, coarse: DataFrame,
      cb: DataFrame, postings: DataFrame,
      numSub: Int, subDim: Int, nprobe: Int, rows: Long = -1L): DataFrame = {
    // probes: each query's nprobe nearest coarse centroids + its
    // PER-CLUSTER residual (q − that cluster's centroid)
    val centsArr = coarse.agg(array_sort(collect_list(
      struct(col("cluster"), col("ce"), col("cn")))).as("cents"))
    val qres = unit.where(col("vec_id") < 5)
      .crossJoin(broadcast(centsArr))
      .select(col("vec_id").as("query_id"), col("e"),
        explode(graft.functions.NearestCentroids(col("e"), col("cents"), nprobe))
          .as("cluster"), col("cents"))
      .withColumn("ce", element_at(
        map_from_entries(transform(col("cents"),
          c => struct(c.getField("cluster"), c.getField("ce")))), col("cluster")))
      .select(col("query_id"), col("cluster"),
        zip_with(col("e"), col("ce"), (x, y) => x - y).as("e"))

    // ADC tables per (query, probed cluster): dtabs(m) maps code → d²
    val qsubs = qres.select(col("query_id"), col("cluster"),
        explode(array((0 until numSub).map(lit): _*)).as("m"), col("e"))
      .select(col("query_id"), col("cluster"), col("m"),
        slice(col("e"), col("m") * subDim + 1, lit(subDim)).as("sv"))
    val qtabs = qsubs.join(broadcast(ProductQuant.codebookArr(cb)), Seq("m"))
      .withColumn("dtab", map_from_entries(transform(col("cb"),
        c => struct(c.getField("code"), ProductQuant.l2(col("sv"), c.getField("cv"))))))
      .groupBy(col("query_id"), col("cluster"))
      .agg(map_from_entries(collect_list(struct(col("m"), col("dtab")))).as("tmap"))
      .select(col("query_id"), col("cluster"),
        transform(sequence(lit(0), lit(numSub - 1)),
          i => element_at(col("tmap"), i)).as("dtabs"))

    // bucket-bounded ADC scan: postings meet ONLY their probed queries
    val scored = postings.join(broadcast(qtabs), Seq("cluster"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("approx_d", aggregate(
        zip_with(col("codes"), col("dtabs"), (c, t) => element_at(t, c)),
        lit(0.0), (acc, x) => acc + x))
    val byAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_d"), col("vec_id"))
    // corpus-adaptive budget (ProductQuant.adaptiveCand): identical to
    // the old fixed 100 up to 8k vectors, then ~1.25% of the corpus —
    // the round-12 64k sweep showed the fixed cut halving recall
    val cand = scored.withColumn("crnk", row_number().over(byAdc))
      .where(col("crnk") <=
        ProductQuant.adaptiveCand(if (rows >= 0) rows else v.count()))
      .select(col("query_id"), col("vec_id"))

    val q = v.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    val rescored = v.join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cosine",
        round(Vectors.cosine(col("qe"), col("e"), col("qn"), col("nrm")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    rescored.withColumn("rnk", rank().over(w)).where(col("rnk") <= 10)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("rnk"), col("vec_id"))
  }
}
