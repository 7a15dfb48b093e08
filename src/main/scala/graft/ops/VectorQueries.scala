package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** SparkEntry-facing embedding queries (SURVEY §2.C C5–C7, C13).
  *
  * Scale notes: the exact near-dup pair join (C5) is grid-parallelized —
  * a plain `join(..., "label")` would put an entire label block's
  * quadratic work on ONE reducer, so each label is split into a G×G cell
  * grid (each side replicated G ways) and every cell is an independent
  * task. Total work for an exact τ-join is inherently Σ block² (no exact
  * algorithm beats it on adversarial data); the grid removes the
  * single-task straggler so a giant label spreads over the cluster. The
  * sub-quadratic scale face is [[dedupEmbeddingLsh]]: LSH-bucketed
  * candidates + exact rescore — the standard recall trade for corpus-scale
  * near-dup (SemDeDup-style pipelines run it at high τ where sign-LSH has
  * real amplification; at τ=0.35 collision prob is 1−θ/π≈0.61 vs 0.5
  * random, so exact-recall LSH blocking is information-theoretically
  * useless — measured on this corpus, see VectorSpec). Brute-force top-k
  * (C6) broadcasts only the small query set; the corpus side streams
  * through a BroadcastNestedLoopJoin — the documented baseline. The LSH
  * path (C7) is the ANN scale route: L independent hyperplane tables
  * bucket the corpus and only bucket-mates are scored.
  */
object VectorQueries {
  /** Vector width of the embeddings table (a corpus schema constant). */
  val EmbeddingDim = 64

  private def emb(s: SparkSession, dir: String) =
    Vectors.withNorm(Tables(s, dir, "embeddings"), "embedding")

  /** Learned-state export for the round-11 oracle promotions — the C59
    * "learned state IS data" posture widened to the whole k-means-backed
    * ANN/dedup family: each face writes its model-scale learned frame
    * (the k-row centroid table, and where the face consumes a frozen
    * assignment, that too) to a tmpdir-fixed parquet path that the
    * statically-built oracle string reads back as DATA. Everything
    * DETERMINISTIC downstream of the learned state — the per-vector
    * argmax assignment (left-to-right dot parity, the same IEEE
    * argument the C5/C7 cosine oracles rest on), probe selection,
    * candidate generation, exact rescoring, ranking, and the card
    * arithmetic — replays in DuckDB and hash-checks. Verify/gate runs
    * are serial, so the last face invocation's export is always the one
    * the immediately-following DuckDB replay consumes. */
  private[ops] def exportSide(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(path)

  private def sidePath(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_$name.parquet"

  val SemDedupCentsPath: String = sidePath("semdedup_cents")
  val IvfCentsPath: String = sidePath("ivf_cents")
  val IvfLearnedCentsPath: String = sidePath("ivf_learned_cents")
  val KnnCentsPath: String = sidePath("knn_cents")
  val DiverseCentsPath: String = sidePath("diverse_cents")
  val DiverseAssignPath: String = sidePath("diverse_assign")

  /** Shared oracle prelude: the exported centroid table as data, the
    * zero-norm-guarded corpus (mirrors withNorm(dropDegenerate=true)),
    * and every vector's dot/cn centroid score — the exact quantity
    * [[graft.functions.NearestCentroids]] ranks (the vector's own norm
    * is constant per row, so dot/cn ordering IS cosine ordering), with
    * the same smaller-cluster tie rule. */
  private def centScoreCtes(path: String): String =
    s"""WITH cents AS (SELECT cluster, ce, cn FROM '$path/*.parquet'),
       |v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
       |      FROM embeddings),
       |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
       |      WHERE sqrt(list_dot_product(e, e)) > 0),
       |sc AS (SELECT n.vec_id, n.e, n.nrm, c.cluster,
       |              list_dot_product(n.e, c.ce)/c.cn AS s
       |       FROM n, cents c)""".stripMargin

  /** C16/C16a oracle: assignment (argmax), probes (top-2), posting-list
    * candidates, exact round-4 rescore, and the tie-broken rank — all
    * replayed from the exported centroids. */
  private def ivfOracle(path: String): String =
    s"""${centScoreCtes(path)},
       |asg AS (SELECT vec_id, e, nrm, cluster FROM (
       |          SELECT *, row_number() OVER (PARTITION BY vec_id
       |            ORDER BY s DESC, cluster) AS rn FROM sc) WHERE rn = 1),
       |pr AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn, cluster FROM (
       |          SELECT *, row_number() OVER (PARTITION BY vec_id
       |            ORDER BY s DESC, cluster) AS rn FROM sc WHERE vec_id < 5)
       |        WHERE rn <= 2),
       |cand AS (SELECT pr.query_id, a.vec_id,
       |                round(list_dot_product(pr.qe, a.e)/(pr.qn*a.nrm), 4)
       |                  AS cosine
       |         FROM asg a JOIN pr ON a.cluster = pr.cluster
       |         WHERE a.vec_id <> pr.query_id),
       |r AS (SELECT *, rank() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC, vec_id) AS rnk FROM cand)
       |SELECT query_id, rnk, vec_id, cosine FROM r WHERE rnk <= 10
       |ORDER BY query_id, rnk, vec_id""".stripMargin

  val simSearchIvfOracle: String = ivfOracle(IvfCentsPath)
  val simSearchIvfLearnedOracle: String = ivfOracle(IvfLearnedCentsPath)

  /** C37 oracle: argmax assignment replayed from the exported
    * centroids, then the within-cluster τ-pair stage and the card. */
  val dedupSemanticOracle: String =
    s"""${centScoreCtes(SemDedupCentsPath)},
       |asg AS (SELECT vec_id, e, nrm, cluster FROM (
       |          SELECT *, row_number() OVER (PARTITION BY vec_id
       |            ORDER BY s DESC, cluster) AS rn FROM sc) WHERE rn = 1),
       |pf AS (SELECT x.cluster, x.vec_id AS vec_a, y.vec_id AS vec_b,
       |              list_dot_product(x.e, y.e)/(x.nrm*y.nrm) AS cos
       |       FROM asg x JOIN asg y
       |         ON x.cluster = y.cluster AND x.vec_id < y.vec_id
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

  /** C68 oracle: 3-way multi-assignment replayed from the exported
    * centroids (rn ≤ 3), within-cell pairs, cross-cell max-collapse,
    * top-3 rank with the dst tie-break. */
  val knnGraphOracle: String =
    s"""${centScoreCtes(KnnCentsPath)},
       |asg AS (SELECT vec_id, e, nrm, cluster FROM (
       |          SELECT *, row_number() OVER (PARTITION BY vec_id
       |            ORDER BY s DESC, cluster) AS rn FROM sc) WHERE rn <= 3),
       |p AS (SELECT x.vec_id AS src, y.vec_id AS dst,
       |             max(list_dot_product(x.e, y.e)/(x.nrm*y.nrm)) AS cos
       |      FROM asg x JOIN asg y
       |        ON x.cluster = y.cluster AND x.vec_id <> y.vec_id
       |      GROUP BY 1, 2),
       |r AS (SELECT src, dst, cos, row_number() OVER (PARTITION BY src
       |        ORDER BY cos DESC, dst) AS "rank" FROM p)
       |SELECT src, "rank", dst, round(cos, 4) AS cos FROM r
       |WHERE "rank" <= 3 ORDER BY src, "rank"""".stripMargin

  /** C91 oracle: scoring + per-cell ranking + the ceil cut + the card,
    * replayed from the exported frozen assignment and centroid table. */
  val sampleDiverseOracle: String =
    s"""WITH asg AS (SELECT vec_id, cluster FROM '$DiverseAssignPath/*.parquet'),
       |cents AS (SELECT cluster, ce, cn FROM '$DiverseCentsPath/*.parquet'),
       |v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
       |      FROM embeddings),
       |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
       |      WHERE sqrt(list_dot_product(e, e)) > 0),
       |scored AS (SELECT a.cluster, n.vec_id,
       |                  list_dot_product(n.e, c.ce)/(n.nrm*c.cn) AS proto
       |           FROM n JOIN asg a USING (vec_id)
       |                  JOIN cents c USING (cluster)),
       |rk AS (SELECT cluster, vec_id, proto,
       |              row_number() OVER (PARTITION BY cluster
       |                ORDER BY proto DESC, vec_id) AS r,
       |              count(*) OVER (PARTITION BY cluster) AS cn_
       |       FROM scored),
       |fl AS (SELECT cluster, round(proto, 4) AS proto,
       |              (r > ceil(0.25 * cn_)) AS kept FROM rk)
       |SELECT cluster, count(*)::BIGINT AS n,
       |       (count(*) FILTER (NOT kept))::BIGINT AS dropped,
       |       (count(*) FILTER (kept))::BIGINT AS kept,
       |       (count(*) FILTER (NOT kept))::BIGINT * 10000
       |         // count(*)::BIGINT AS drop_bp,
       |       round(avg(proto) FILTER (kept), 4) AS avg_kept_proto,
       |       round(max(proto) FILTER (kept), 4) AS max_kept_proto
       |FROM fl GROUP BY cluster ORDER BY cluster""".stripMargin

  /** C5: embedding cosine near-dup pairs within label blocks, tau=0.35.
    *
    * Exact face. Candidates block on label (the semantic key), but the
    * physical join key is (label, ga, gb): each row lands in grid row
    * ga = hash(id) mod G on the a-side and grid column gb on the b-side,
    * and is replicated across the other coordinate, so pair (x, y) meets
    * in exactly ONE of the G² cells. A label with 10⁸ vectors becomes G²
    * independent tasks instead of one straggler reducer; G is a constant
    * so the plan is still a pair of narrow equi-join shuffles. */
  def dedupEmbedding(s: SparkSession, dir: String, grid: Int = 4): DataFrame = {
    val v = emb(s, dir)
    val cells = array((0 until grid).map(lit): _*)
    val a = v.select(col("vec_id").as("vec_a"), col("label"),
        col("e").as("ea"), col("nrm").as("na"))
      .withColumn("ga", pmod(hash(col("vec_a")), lit(grid)))
      .withColumn("gb", explode(cells))
    val b = v.select(col("vec_id").as("vec_b"), col("label"),
        col("e").as("eb"), col("nrm").as("nb"))
      .withColumn("gb", pmod(hash(col("vec_b")), lit(grid)))
      .withColumn("ga", explode(cells))
    val cos = Vectors.cosine(col("ea"), col("eb"), col("na"), col("nb"))
    a.join(b, Seq("label", "ga", "gb")).where(col("vec_a") < col("vec_b"))
      .withColumn("cos", cos)
      .where(col("cos") >= 0.35)
      .select(col("vec_a"), col("vec_b"), col("label"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** C5 scale face: near-dup pairs via LSH-bucket candidate blocking +
    * exact cosine rescore. Candidates are pairs sharing (label, table,
    * bucket) in ANY of `numTables` hyperplane tables — cost is Σ bucket²
    * per table, never label-block². Pairs are deduped across tables
    * BEFORE the exact rescore so each candidate's dot product is computed
    * once. Recall < 1 by design: a τ-pair is found with prob
    * 1−(1−p^b)^L, p = 1−θ/π. At the high τ of real near-dup dedup
    * (≥0.9) defaults give ≈1 recall with strong selectivity; at this
    * corpus's τ=0.35 the recall is spec-bounded in VectorSpec (rows-only
    * CORRECTNESS entry, like C7/C16). */
  def dedupEmbeddingLsh(s: SparkSession, dir: String, tau: Double = 0.35,
      numTables: Int = 8, bitsPerTable: Int = 2, dim: Int = EmbeddingDim): DataFrame = {
    // Rescore INSIDE the bucket-join stage and filter tau before the
    // cross-table dedup: a pair colliding in k tables computes its
    // (identical) cosine k times — narrow CPU in the join task — but the
    // dedup exchange then carries only qualifying (ids, label, cos) rows,
    // near output size, instead of every candidate with both 64-dim
    // vectors attached (measured 4.4 s -> sub-second at sf0.1).
    val banded = bandedCorpus(emb(s, dir), numTables, bitsPerTable, dim)
    val a = banded.select(col("vec_id").as("vec_a"), col("label"),
      col("e").as("ea"), col("nrm").as("na"), col("tbl"), col("bucket"))
    val b = banded.select(col("vec_id").as("vec_b"), col("label"),
      col("e").as("eb"), col("nrm").as("nb"), col("tbl"), col("bucket"))
    val cos = Vectors.cosine(col("ea"), col("eb"), col("na"), col("nb"))
    a.join(b, Seq("label", "tbl", "bucket"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cos", cos)
      .where(col("cos") >= tau)
      .groupBy(col("vec_a"), col("vec_b"), col("label"))
      .agg(round(max(col("cos")), 4).as("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Corpus-count knee where [[dedupEmbeddingAuto]] hands the exact
    * LSH-blocked τ-join over to cluster-blocked candidates. The number
    * is from the measured envelope, not taste: C5a's candidate stream
    * is L·n²/(labels·2^b·2) pairs (fixed L=8, b=2, 10 labels →
    * n²/10), which measured >10 min at 512k vectors (26B candidates)
    * and no WIDTH retune can fix it — at this corpus's τ=0.35 the
    * per-plane collision gap is 0.61 vs 0.50 random (~1.23× selectivity
    * per bit), so holding the face's own ≥0.85 recall bound pins b≈2,
    * AND the exact ANSWER itself is Θ(n²) rows (P(cos≥0.35)≈0.26% on
    * isotropic 64-dim — 26 pairs at n=500 scaling to ~34M at 512k), so
    * every exact face is output-bound quadratic regardless of blocking.
    * The knee is from measured walls (round 13, local[32], min-of-3):
    * the exact face reads 4.07 s at 64k (≈4.1×10⁸ candidates — ~100M
    * pairs/s), quadratic in n, so ~22 s at 150k and ~260 s at 512k;
    * the clustered branch reads 35.1 s at 512k and is k-means-dominated
    * (~linear). The crossover sits near ~110k; 150k gives the exact
    * face the benefit of the doubt — past it, exactness at τ below the
    * corpus's random-similarity floor buys noise, not dedup. */
  val DedupLshKnee: Long = 150000L

  /** Routing assertion for the knee-routed faces' VERIFY runs
    * (round-13 ADVICE): a knee-routed face registers the oracle of its
    * BELOW-KNEE branch, which silently stops being the right replay the
    * moment a gate/scale corpus crosses the knee — the face would route
    * to the other branch and fail as an opaque row-diff. Verify calls
    * this (via SparkEntry.oracleRouteChecks) before dumping such a
    * face, so an above-knee corpus fails with an explicit routing
    * message instead. The count is the same [[Vectors.withNorm]]
    * corpus count the face itself routes on. */
  private[graft] def requireBelowKnee(s: SparkSession, dir: String,
      knee: Long, face: String, branch: String): Unit = {
    val n = emb(s, dir).count()
    require(n <= knee,
      s"$face routes to its above-knee branch at corpus n=$n > knee=$knee; " +
        s"its registered oracle replays the $branch branch only — " +
        "re-adjudicate the oracle before verifying above the knee")
  }

  /** The [[requireBelowKnee]] posture for the TRAINER-CAP seam
    * (round-14 verdict item 4): every sample-trained oracle-checked
    * face's oracle was adjudicated in the regime where
    * [[Vectors.trainSample]] returns the corpus frame ITSELF (n ≤ cap
    * — all gate SFs), i.e. where sampled and full fits are
    * bit-identical by construction. Above the cap the fit runs on the
    * content-keyed sample; the exported learned tables still make the
    * replay self-consistent, but the regime the gate certified has
    * silently changed. Verify calls this (via
    * SparkEntry.oracleRouteChecks) so an above-cap gate corpus fails
    * with an explicit seam message instead of being trusted
    * unadjudicated. (The C87/C87a audit faces are exempt by design:
    * their oracles verify only the overlay arithmetic over EXPORTED
    * method lists plus the exact ground truth, which is
    * regime-independent.) */
  private[graft] def requireBelowTrainCap(s: SparkSession, dir: String,
      face: String): Unit = {
    val n = emb(s, dir).count()
    require(n <= Vectors.TrainSampleCap,
      s"$face is sample-trained past Vectors.TrainSampleCap=" +
        s"${Vectors.TrainSampleCap} and the gate corpus reads n=$n above " +
        "it: the registered oracle was adjudicated in the bit-identical " +
        "(below-cap) regime — re-adjudicate before verifying above the cap")
  }

  /** C5b: the AUTOMATIC hand-over face for embedding near-dup pairs —
    * the round-12 verdict's one `weak` mark closed as code, the
    * [[graft.ops.Cluster.connectedComponentsAuto]] posture transposed.
    * Below [[DedupLshKnee]] it IS [[dedupEmbeddingLsh]] (exact-recall
    * regime: all three gate SFs and the sf1 decade route here, so the
    * SQL oracle replays bit-identical). Past the knee it switches the
    * CANDIDATE GENERATOR from LSH buckets to learned-k-means cells
    * ([[KMeans.adaptiveK]] bounds expected cell size at 512), making
    * candidate volume ~n·cell/2 — LINEAR in n — while keeping the same
    * output contract (same-label pairs with exact cosine ≥ τ, same
    * schema): the SemDeDup recall posture, where high-cosine real
    * near-dups co-cluster and the sub-τ-floor "sea" pairs are the
    * documented forfeit. DedupAutoSpec pins both routes, branch
    * soundness (clustered ⊆ exact C5 pairs) and planted-pair recall. */
  def dedupEmbeddingAuto(s: SparkSession, dir: String, tau: Double = 0.35,
      knee: Long = DedupLshKnee): DataFrame = {
    val v = emb(s, dir)
    val n = v.count()
    if (n <= knee) dedupEmbeddingLsh(s, dir, tau)
    else dedupEmbeddingClustered(v, tau, rows = n)
  }

  /** The past-the-knee branch of [[dedupEmbeddingAuto]]: same-label
    * τ-pairs whose candidates block on the learned k-means cell instead
    * of LSH buckets. Join key is (label, cluster, ga, gb) — the C5 G×G
    * grid carried over so a hot (label, cell) block splits into G²
    * independent tasks. Candidates are Σ cell² ≈ n·cellSize, never
    * n²/labels. */
  private[graft] def dedupEmbeddingClustered(v: DataFrame, tau: Double,
      rows: Long, grid: Int = 4): DataFrame = {
    val fit = KMeans.fit(v.select(col("vec_id"), col("e"), col("nrm")),
      k = KMeans.adaptiveK(rows), iters = 3, rows = rows)
    val centsArr = fit.centroids.agg(array_sort(collect_list(
      struct(col("cluster"), col("ce"), col("cn")))).as("cents"))
    // shuffle-free broadcast argmax (the C37 rule), NOT a join back to
    // the fit's assignment frame — that would re-shuffle the corpus
    val assigned = v.crossJoin(broadcast(centsArr))
      .select(col("vec_id"), col("label"), col("e"), col("nrm"),
        graft.functions.NearestCentroids(col("e"), col("cents"), 1)
          .getItem(0).as("cluster"))
    val cells = array((0 until grid).map(lit): _*)
    val a = assigned.select(col("vec_id").as("vec_a"), col("label"),
        col("cluster"), col("e").as("ea"), col("nrm").as("na"))
      .withColumn("ga", pmod(hash(col("vec_a")), lit(grid)))
      .withColumn("gb", explode(cells))
    val b = assigned.select(col("vec_id").as("vec_b"), col("label"),
        col("cluster"), col("e").as("eb"), col("nrm").as("nb"))
      .withColumn("gb", pmod(hash(col("vec_b")), lit(grid)))
      .withColumn("ga", explode(cells))
    val cos = Vectors.cosine(col("ea"), col("eb"), col("na"), col("nb"))
    a.join(b, Seq("label", "cluster", "ga", "gb"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cos", cos)
      .where(col("cos") >= tau)
      .select(col("vec_a"), col("vec_b"), col("label"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** LSH candidate stage of [[dedupEmbeddingLsh]], exposed so specs can
    * count candidates directly (the scale claim IS the candidate bound).
    * Input: a [[Vectors.withNorm]] frame with vec_id/label/e/nrm. Output:
    * one row per unordered candidate pair (deduped across tables), with
    * both vectors carried for the exact rescore. */
  /** Corpus exploded into its (table, bucket) LSH band rows. `dim` is a
    * PARAMETER (a schema decision, like the pivot column list in A13):
    * probing it with `v.select(size(...)).head()` cost an extra Spark
    * job + a scan dependency per LSH query just to size the hyperplane
    * array. Hyperplane generation is driver-side constant folding either
    * way; the vector width is known when the corpus is. */
  private def bandedCorpus(v: DataFrame, numTables: Int,
      bitsPerTable: Int, dim: Int): DataFrame = {
    // the fused signature kernel (see lshBand) on the C5a seed set
    val planes = (0 until numTables).flatMap(l =>
      Vectors.hyperplanes(bitsPerTable, dim, 142L + l)).toArray
    v.select(col("vec_id"), col("label"), col("e"), col("nrm"),
        posexplode(graft.functions.LshSignature(col("e"), planes,
          numTables, bitsPerTable)).as(Seq("tbl", "bucket")))
  }

  private[graft] def lshCandidates(v: DataFrame, numTables: Int,
      bitsPerTable: Int, dim: Int = EmbeddingDim): DataFrame = {
    val banded = bandedCorpus(v, numTables, bitsPerTable, dim)
    val a = banded.select(col("vec_id").as("vec_a"), col("label"),
      col("e").as("ea"), col("nrm").as("na"), col("tbl"), col("bucket"))
    val b = banded.select(col("vec_id").as("vec_b"), col("label"),
      col("e").as("eb"), col("nrm").as("nb"), col("tbl"), col("bucket"))
    a.join(b, Seq("label", "tbl", "bucket"))
      .where(col("vec_a") < col("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
  }

  /** C6: brute-force cosine top-10 for the query set vec_id < 5. */
  def simSearchTopk(s: SparkSession, dir: String): DataFrame = {
    val v = emb(s, dir)
    exactTopkFrom(v, v)
  }

  /** The exact-scan core shared by C6 and the knee-routed hand-over
    * branches (C104 / C7b): brute-force cosine top-10 of `corpus` for
    * the vec_id < 5 query set drawn from `v`. Queries broadcast; the
    * corpus streams through a BroadcastNestedLoopJoin; round-before-rank
    * window with a map-side WindowGroupLimit. */
  private[ops] def exactTopkFrom(v: DataFrame, corpus: DataFrame): DataFrame = {
    val queries = v.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    val cos = Vectors.cosine(col("qe"), col("e"), col("qn"), col("nrm"))
    val scored = corpus.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), round(cos, 4).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", rank().over(w))
      .where(col("rnk") <= 10)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("rnk"), col("vec_id"))
  }

  /** C7: LSH-bucketed ANN — L=4 hyperplane tables at a CORPUS-ADAPTIVE
    * operating point: signature width b = [[Vectors.adaptiveLshBits]]
    * (constant expected bucket occupancy ≈128) and query-side Hamming-1
    * multi-probe once the width adapts ([[Vectors.adaptiveLshRadius]]).
    * Candidates = mates of any probed bucket in any table; exact cosine
    * rescore; top-10 per query. The operating point is the
    * measurement-driven knee from the 8k/64k/512k grid (see the rule
    * scaladoc: recall roughly doubles at flat cost at every decade,
    * while the hypothesized constant-occupancy rule starves recall and
    * falls off a codegen cliff). Below n = 8192 the point IS the
    * previously shipped (6 bits, radius 0), so gate SFs and the sf1
    * decade are bit-identical. SQL-checked: the oracle inlines all
    * [[Vectors.MaxLshBits]] seeded planes (prefix property:
    * `Array.fill` is row-major, so the first b rows of the 12-plane set
    * ARE the b-plane set) and replays the SAME integer-threshold rule
    * from its own corpus count. */
  def simSearchLsh(s: SparkSession, dir: String): DataFrame = {
    // deliberately NOT materializeSpread'd (round-15): this face is
    // sub-second — the checkpoint+count+respread jobs were measured to
    // cost more than the duplicated lazy subtrees they save (the same
    // asymmetry that keeps the warm *_cached serves lazy)
    val v = emb(s, dir)
    val n = v.count()
    simSearchLshAt(v, numTables = 4,
      bitsPerTable = Vectors.adaptiveLshBits(n),
      radius = Vectors.adaptiveLshRadius(n))
  }

  /** [[simSearchLsh]] at an explicit (tables, bits, radius) operating
    * point — exposed so specs can pin the adaptive face row-identical
    * to the fixed-constant face at gate scale, and measure recall per
    * point at the decade scales. */
  private[graft] def simSearchLshAt(v: DataFrame, numTables: Int,
      bitsPerTable: Int, radius: Int): DataFrame =
    lshServe(lshBand(v, numTables, bitsPerTable), v, bitsPerTable, radius)

  /** The C7 banded corpus (seed 42+l tables) — the frame
    * [[simSearchLshCached]] persists: banding is the whole
    * corpus-linear cost of an LSH query, so the serve face stores it
    * once and every later search is just the probe equi-join. SLIM by
    * design — (vec_id, tbl, bucket) only: carrying the 64-dim vectors
    * through the ×numTables explode quadruples the corpus through the
    * probe join's shuffle (measured the dominant cost at 512k vectors);
    * the rescore re-attaches vectors for CANDIDATE rows only. */
  private[graft] def lshBand(v: DataFrame, numTables: Int,
      bitsPerTable: Int): DataFrame = {
    // one fused kernel for all tables' signatures (graft.functions
    // .LshSignature): reads each vector element once instead of
    // numTables×bits times, and — unlike the composed per-plane dot
    // spelling — cannot fall out of whole-stage codegen as the width
    // grows. Buckets are bit-identical (per-plane left-to-right ±1
    // accumulation; LshSignatureSpec pins row equality).
    val planes = (0 until numTables).flatMap(l =>
      Vectors.hyperplanes(bitsPerTable, EmbeddingDim, 42L + l)).toArray
    v.select(col("vec_id"),
        posexplode(graft.functions.LshSignature(col("e"), planes,
          numTables, bitsPerTable)).as(Seq("tbl", "bucket")))
  }

  /** Probe + exact rescore + rank over an (inline or persisted) slim
    * banded corpus; `v` supplies the vectors, attached only to the
    * candidate-set-sized frames. */
  private[graft] def lshServe(banded: DataFrame, v: DataFrame, bitsPerTable: Int,
      radius: Int): DataFrame = {
    // Hamming-1 probes explode on the QUERY side only (query-set-sized);
    // the corpus side stays a pure equi-join on (tbl, bucket).
    val probeArr =
      if (radius == 0) array(col("bucket"))
      else array((col("bucket") +: (0 until bitsPerTable).map(j =>
        col("bucket").bitwiseXOR(lit(1L << j)))): _*)
    val queries = banded.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("tbl"),
        explode(probeArr).as("bucket"))
    val cand = banded.join(broadcast(queries), Seq("tbl", "bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .dropDuplicates("query_id", "vec_id")
    val qv = broadcast(v.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("e").as("qe"),
        col("nrm").as("qn")))
    val cos = Vectors.cosine(col("qe"), col("e"), col("qn"), col("nrm"))
    val scored = cand
      .join(v.select(col("vec_id"), col("e"), col("nrm")), Seq("vec_id"))
      .join(qv, Seq("query_id"))
      .select(col("query_id"), col("vec_id"), round(cos, 4).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", rank().over(w))
      .where(col("rnk") <= 10)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("rnk"), col("vec_id"))
  }

  /** C7a: the LSH SERVE face — the last ANN family to gain one. The
    * banded corpus is the whole corpus-linear cost of an LSH query
    * (the signature projection over every vector); [[simSearchLsh]]
    * re-pays it per invocation, which is the honest inline-build
    * number but not what a deployment's recurring probe costs. This
    * face persists the banded table plus its (bits, radius) operating
    * point in the ArtifactStore (self-healing first build, the *_cached
    * convention), so warm searches are ONE probe equi-join + the
    * query-set-sized rescore. Storing the operating point matters: the
    * adaptive rule keys on corpus size, and a serve path re-deriving it
    * from a fresh count() would silently band-mismatch a stored index
    * built at a different size. The flip side (round-12 ADVICE): the
    * REGISTERED ORACLE derives the operating point from the live
    * corpus, so an artifact banded below the 8192 threshold and served
    * after the corpus grew past it would fail its own SQL check at a
    * mismatched width. The stored point therefore VALIDATES against
    * the adaptive rule on every serve — one count() against the corpus
    * the face scans anyway — and a stale artifact rebuilds in place
    * (self-healing, same posture as the first build; the incremental
    * cadence that avoids rebuilds while the rule's answer is unchanged
    * is [[graft.ops.IncrementalIndex]]'s LSH table). Same oracle as C7
    * by contract (the banding is deterministic data; C97a precedent). */
  def simSearchLshCached(s: SparkSession, dir: String): DataFrame = {
    val vLive = emb(s, dir)
    lshCachedServe(s, dir, vLive, vLive.count())
  }

  /** Corpus-count knee where [[simSearchLshAuto]] hands the LSH serve
    * over to the exact scan. The number is the measured envelope, not
    * taste (round-13 vec4M decade, BASELINE): the C7 operating point
    * holds the candidate set at a constant ~25% FRACTION of the corpus
    * (L·(1+b)/2^b at (7,1)) because on weak-contrast 64-dim embeddings
    * recall tracks the fraction — which prices the serve LINEAR in n
    * at a heavy constant (~1M rescored candidates per query at 4M).
    * Measured serve walls against the exact full scan: 1.88 s vs
    * 1.67 s at 512k (par — the serve floor), 29.5 s vs 4.01 s at 4M
    * (decisively past it). The crossover sits near ~1M vectors on this
    * geometry; past it, sign-LSH stops paying for itself and the
    * probe-bounded families (IVF-PQ, graph) or the exact scan are the
    * serve path. */
  val LshServeKnee: Long = 1000000L

  /** C7b: the AUTOMATIC hand-over face for the LSH serve — the C5b
    * posture transposed to search (round-13 verdict item 2). Below
    * [[LshServeKnee]] it IS [[simSearchLshCached]] (artifact-backed
    * banded serve at the corpus-adaptive operating point; all gate SFs
    * and the measured decades through 512k route here, so the C7 SQL
    * oracle replays bit-identically). Past the knee it serves the
    * exact scan ([[exactTopkFrom]] — same output contract: top-10 over
    * the whole corpus, self excluded), which is both CHEAPER (4.0 s vs
    * 29.5 s at 4M) and recall-1.0 where the banded serve reads 0.86.
    * LshAutoSpec pins both routes and the branch boundary; Verify
    * asserts the route (oracleRouteChecks). */
  def simSearchLshAuto(s: SparkSession, dir: String,
      knee: Long = LshServeKnee): DataFrame = {
    val vLive = emb(s, dir)
    val n = vLive.count()
    if (n <= knee) lshCachedServe(s, dir, vLive, n)
    else exactTopkFrom(vLive, vLive)
  }

  /** The artifact-backed serve body shared by C7a and C7b's below-knee
    * branch. */
  private def lshCachedServe(s: SparkSession, dir: String,
      vLive: DataFrame, n: Long): DataFrame = {
    import s.implicits._
    val wantBits = Vectors.adaptiveLshBits(n)
    val wantRadius = Vectors.adaptiveLshRadius(n)
    val stale = ArtifactStore.has(s, dir, "lsh_meta") && {
      val m = ArtifactStore.load(s, dir, "lsh_meta").head()
      m.getAs[Int]("bits") != wantBits || m.getAs[Int]("radius") != wantRadius
    }
    // torn-save detection (round-13 ADVICE): meta alone cannot vouch
    // for the banded artifact — the two saves are not atomic, so a
    // crash between them (in either order) can leave a pair whose
    // widths DISAGREE while meta still matches the adaptive rule
    // (e.g. banded rewritten at a new width, meta save failed, corpus
    // later shrinks back across the threshold). The banded table
    // therefore carries its own `bits` column, and the serve
    // cross-checks one sampled row against meta before trusting the
    // pair; any disagreement — or a pre-width-column artifact —
    // rebuilds in place (self-healing, like the rule check above).
    val torn = !stale && ArtifactStore.has(s, dir, "lsh_banded", "lsh_meta") && {
      val banded = ArtifactStore.load(s, dir, "lsh_banded")
      !banded.columns.contains("bits") ||
        banded.select(col("bits")).limit(1).collect()
          .exists(_.getInt(0) != wantBits)
    }
    if (stale || torn || !ArtifactStore.has(s, dir, "lsh_banded", "lsh_meta")) {
      ArtifactStore.save(lshBand(vLive, 4, wantBits)
        .withColumn("bits", lit(wantBits)), dir, "lsh_banded")
      ArtifactStore.save(Seq((wantBits, wantRadius)).toDF("bits", "radius"),
        dir, "lsh_meta")
    }
    val meta = ArtifactStore.load(s, dir, "lsh_meta").head()
    // explicit slim projection: tolerant of banded artifacts written
    // before the slim-schema change (extra columns would collide with
    // the rescore's vector re-attach)
    lshServe(ArtifactStore.load(s, dir, "lsh_banded")
        .select(col("vec_id"), col("tbl"), col("bucket")),
      vLive, meta.getAs[Int]("bits"), meta.getAs[Int]("radius"))
  }

  /** C37: SEMANTIC dedup (the SemDeDup recipe): cluster the corpus with
    * learned k-means, then prune near-duplicate pairs only WITHIN each
    * cluster — the published way to make embedding dedup sub-quadratic
    * on an unlabeled corpus (clusters play the role C5 borrows the label
    * column for; pairs crossing cluster boundaries are forgone by
    * design, which is the recall trade that bounds the pair join by
    * Σ cluster² instead of n²). Prune rule is deterministic: a vector
    * is pruned when some same-cluster neighbor with a SMALLER vec_id
    * sits within cosine ≥ τ of it — no iterative clustering needed, and
    * the keeper set is reproducible run over run.
    *
    * Plan shape at 100 TB: the k-means fit is the C22 loop (broadcast-
    * argmax assign, (cluster,dim) partial-agg update); the final
    * assignment is one more shuffle-free narrow argmax over the corpus
    * (NOT a join back to the fit's assignment frame — that would
    * re-shuffle the corpus on vec_id); the within-cluster pair join is
    * the C5 grid (each cluster split G×G so a giant cluster becomes G²
    * independent tasks, never one reducer). Per-cluster report.
    * SQL-CHECKED since round 11 (the C59 learned-state-as-data posture,
    * strengthened): only the LEARNED half — the k-row centroid table —
    * exports at [[SemDedupCentsPath]]; the DuckDB oracle re-derives the
    * per-vector argmax assignment FROM those centroids (left-to-right
    * dot parity) and replays the whole within-cluster pair stage, so the
    * assignment arithmetic itself is engine-verified, not just consumed.
    * SemanticDedupSpec still pins soundness, in-cluster completeness,
    * and determinism. Cluster count defaults to [[KMeans.adaptiveK]]
    * over the corpus size (k ≤ 0 means derive; resolves to 8 at the
    * test SFs) so per-cluster pair work stays bounded at any scale. */
  def dedupSemantic(s: SparkSession, dir: String, tau: Double = 0.35,
      k: Int = 0, iters: Int = 3, grid: Int = 4): DataFrame = {
    // materialize once + row-aware spread (round-15): the corpus feeds
    // the fit and, via `assigned`, three more subtrees
    val (v, n) = Vectors.materializeSpread(
      emb(s, dir).select(col("vec_id"), col("e"), col("nrm")))
    val kk = if (k > 0) k else KMeans.adaptiveK(n)
    val fit = KMeans.fit(v, k = kk, iters = iters, rows = n)
    exportSide(fit.centroids.select(col("cluster"), col("ce"), col("cn")),
      SemDedupCentsPath)
    val centsArr = s.read.parquet(SemDedupCentsPath)
      .agg(array_sort(collect_list(
        struct(col("cluster"), col("ce"), col("cn")))).as("cents"))
    // ONE argmax pass: the assignment feeds both grid-join sides and
    // the cluster-size rollup — Spark does not dedupe the duplicated
    // subtrees, so unchecked this ran three times
    val assigned = v.crossJoin(broadcast(centsArr))
      .select(col("vec_id"), col("e"), col("nrm"),
        graft.functions.NearestCentroids(col("e"), col("cents"), 1)
          .getItem(0).as("cluster"))
      .localCheckpoint(true)
    val cells = array((0 until grid).map(lit): _*)
    val a = assigned.select(col("vec_id").as("vec_a"), col("cluster"),
        col("e").as("ea"), col("nrm").as("na"))
      .withColumn("ga", pmod(hash(col("vec_a")), lit(grid)))
      .withColumn("gb", explode(cells))
    val b = assigned.select(col("vec_id").as("vec_b"), col("cluster"),
        col("e").as("eb"), col("nrm").as("nb"))
      .withColumn("gb", pmod(hash(col("vec_b")), lit(grid)))
      .withColumn("ga", explode(cells))
    val cos = Vectors.cosine(col("ea"), col("eb"), col("na"), col("nb"))
    // output-scale; persisted so the Σcell² grid join runs once, not
    // once per aggregate branch (the SemanticPq.cardFrom posture)
    val pairs = a.join(b, Seq("cluster", "ga", "gb"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn("cos", cos)
      .where(col("cos") >= tau)
      .select(col("cluster"), col("vec_a"), col("vec_b"), col("cos"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    CacheScope.releaseAfterAction(s, pairs)
    // pruned = has a smaller-id near neighbor in the same cluster
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

  /** C14: per-label centroids — elementwise mean via posexplode →
    * (label, dim) partial means → per-label centroid stats. The
    * (label, dim) grouping spreads one label's work over dim keys, so a
    * giant cluster never lands on a single reducer. */
  def embedCentroids(s: SparkSession, dir: String): DataFrame = {
    val exploded = emb(s, dir)
      .select(col("label"), posexplode(col("e")).as(Seq("dim", "comp")))
    val dimMeans = exploded
      .groupBy(col("label"), col("dim"))
      .agg(avg(col("comp")).as("m"), count(lit(1)).as("n"))
    dimMeans
      .groupBy(col("label"))
      .agg(max(col("n")).as("n_vecs"),
        round(sqrt(sum(col("m") * col("m"))), 4).as("centroid_norm"),
        round(max(col("m")), 4).as("max_comp"),
        round(min(col("m")), 4).as("min_comp"))
      .orderBy(col("label"))
  }

  /** Full centroid VECTORS per label: posexplode → (label, dim) means →
    * reassembled arrays (sorted struct collect; labels are few, so the
    * result is broadcast-sized by construction). */
  private def centroidVectors(v: DataFrame): DataFrame =
    v.select(col("label"), posexplode(col("e")).as(Seq("dim", "comp")))
      .groupBy(col("label"), col("dim"))
      .agg(avg(col("comp")).as("m"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        x => x.getField("m")).as("centroid"))

  /** C16: IVF ANN — the third search family beside brute force (C6) and
    * LSH (C7). Build: the centroid set folds into ONE broadcast
    * array-of-structs row, and each vector's inverted-file assignment is
    * a NARROW per-row argmax (native [[graft.functions.NearestCentroids]]
    * — no shuffle of the corpus; the join+window spelling exchanged n·k
    * rows on vec_id just to rank a per-row maximum). Search: each query
    * probes only its `nprobe`=2 closest centroids' posting lists
    * (equi-join on the cluster id — bucket-bounded, no cross join), then
    * exact cosine rescores and top-10 ranks.
    *
    * SQL-CHECKED since round 11: the centroid table (whose per-label
    * float means are aggregation-order-dependent — the one
    * engine-unreplayable piece) exports at [[IvfCentsPath]] and the
    * DuckDB oracle re-derives assignment, probes, rescore, and ranking
    * from it (see [[exportSide]]). */
  def simSearchIvf(s: SparkSession, dir: String): DataFrame = {
    val v = emb(s, dir)
    exportSide(ivfLabelCents(v), IvfCentsPath)
    ivfSearch(v, s.read.parquet(IvfCentsPath))
  }

  /** The C16 centroid build (label means + norms), shared with the
    * export-free audit variant below. */
  private def ivfLabelCents(v: DataFrame): DataFrame =
    Vectors.withNorm(centroidVectors(v), "centroid")
      .select(col("label").as("cluster"), col("e").as("ce"), col("nrm").as("cn"))

  /** C16 WITHOUT the oracle export — for callers that embed the IVF
    * search inside another face (the recall audit): re-exporting from
    * inside a composite face could overwrite [[IvfCentsPath]] between
    * the `sim_search_ivf` gate dump and its DuckDB replay (the exported
    * label means are float aggregates; a recompute is only
    * bit-identical under the same plan, so the gate must never depend
    * on it). */
  private[ops] def simSearchIvfInline(s: SparkSession, dir: String): DataFrame = {
    val v = emb(s, dir)
    ivfSearch(v, ivfLabelCents(v))
  }

  /** C16a: the same IVF search over LEARNED clusters — centroids come
    * from [[KMeans.fit]] instead of borrowing the label column, which is
    * the honest 100 TB build (real corpora carry no cluster labels).
    * [[KMeans.adaptiveK]] cells (8 at the test SFs), 3 Lloyd rounds;
    * search identical to C16. SQL-CHECKED since round 11: the learned
    * centroids export at [[IvfLearnedCentsPath]] and the oracle replays
    * assignment/probes/rescore/rank from them (see [[exportSide]]);
    * recall stays spec-bounded vs brute force like the other ANN
    * families. */
  def simSearchIvfLearned(s: SparkSession, dir: String): DataFrame = {
    val v = emb(s, dir)
    val vv = v.select(col("vec_id"), col("e"), col("nrm"))
    val n = vv.count()
    val fit = KMeans.fit(vv, k = KMeans.adaptiveK(n), iters = 3, rows = n)
    exportSide(fit.centroids.select(col("cluster"), col("ce"), col("cn")),
      IvfLearnedCentsPath)
    ivfSearch(v, s.read.parquet(IvfLearnedCentsPath))
  }

  /** Shared IVF search: assignment + probes as shuffle-free broadcast
    * argmax, posting-list equi-join, exact rescore, top-10. */
  private def ivfSearch(v: DataFrame, cents: DataFrame): DataFrame = {
    // all centroids in one row, cluster-sorted for deterministic ties
    val centsArr = cents.agg(array_sort(collect_list(
      struct(col("cluster"), col("ce"), col("cn")))).as("cents"))
    val assigned = v.crossJoin(broadcast(centsArr))
      .select(col("vec_id"), col("e"), col("nrm"),
        graft.functions.NearestCentroids(col("e"), col("cents"), 1)
          .getItem(0).as("cluster"))
    // probes: each query's 2 closest centroids (same narrow projection)
    val probes = v.where(col("vec_id") < 5).crossJoin(broadcast(centsArr))
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"),
        explode(graft.functions.NearestCentroids(col("e"), col("cents"), 2))
          .as("cluster"))
    val cand = assigned.join(probes, Seq("cluster"))
      .where(col("vec_id") =!= col("query_id"))
    val cos = Vectors.cosine(col("qe"), col("e"), col("qn"), col("nrm"))
    val scored = cand.select(col("query_id"), col("vec_id"), round(cos, 4).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rnk", rank().over(w))
      .where(col("rnk") <= 10)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("rnk"), col("vec_id"))
  }

  /** C43: cross-table dataset card — documents ⋈ embeddings on the
    * shared id, rolled up per (source × label): the composition table a
    * mixture designer reads when TEXT metadata and EMBEDDING metadata
    * live in separate lake tables (the multimodal-corpus reality —
    * every modality's features are their own table keyed by content
    * id). Reports per-cell doc counts, mean C9 quality, mean embedding
    * norm.
    *
    * Plan shape at 100 TB: both sides project narrow before a single
    * id equi-join — THE canonical bucketing candidate: written with
    * `LakeWriter.writeBucketed` on the id both scans co-locate and the
    * join plans shuffle-free (BucketingSpec pins exactly that plan);
    * unbucketed, it is one shuffle per side on a unique uniform key.
    * The (source × label) roll-up is a tiny partial-aggregated key
    * space. Means are integer BASIS POINTS (per-doc floor(x·10⁴+0.5)
    * then BIGINT sum ÷ count — the §4 integer-cents rule): many cells
    * hold a handful of docs, and `round(avg, 4)` of an arbitrary
    * double hits half-boundaries (measured: one cell at sf0.001
    * diverged in the 4th digit between engines). */
  def corpusLabelCard(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("source"),
      graft.functions.TokenMarkerStats(col("text")).as("st"))
    val nTok = col("st.ws_tokens").cast("double")
    val stopRatio = col("st.stop").cast("double") / nTok
    val avgLen = col("st.alpha_len").cast("double") / nTok
    val q = lit(0.4) * least(nTok / 100.0, lit(1.0)) +
      lit(0.3) * least(stopRatio * 10.0, lit(1.0)) +
      lit(0.3) * when(avgLen >= 3.0 && avgLen <= 8.0, 1.0).otherwise(0.0)
    val dq = d.select(col("doc_id"), col("source"),
      floor(q * 10000 + 0.5).cast("long").as("q_bp"))
    val e = emb(s, dir).select(col("vec_id").as("doc_id"), col("label"),
      floor(col("nrm") * 10000 + 0.5).cast("long").as("nrm_bp"))
    dq.join(e, Seq("doc_id"))
      .groupBy(col("source"), col("label"))
      .agg(count(lit(1)).as("docs"),
        sum(col("q_bp")).as("sq"), sum(col("nrm_bp")).as("sn"))
      .select(col("source"), col("label"), col("docs"),
        expr("sq div docs").as("avg_quality_bp"),
        expr("sn div docs").as("avg_norm_bp"))
      .orderBy(col("source"), col("label"))
  }

  /** C68: k-NN GRAPH over the whole embedding corpus — every vector's
    * top-3 cosine neighbors, the primitive graph-based curation needs
    * (SemDeDup-style cluster pruning, kNN label propagation, graph
    * connectivity audits) that the threshold-pair faces (C5/C37) can't
    * provide: a fixed OUT-DEGREE per node, no similarity floor.
    *
    * Built the only way an all-corpus kNN build survives 100 TB —
    * IVF-cell blocking, never all-pairs: k-means cells are learned
    * ([[KMeans.fit]], the C16a machinery), every vector MULTI-ASSIGNS
    * to its 3 nearest cells (the recall lever: a vector near a cell
    * boundary meets all its sides), pairs form only within a cell
    * (equi-join on the cell id), cross-cell duplicates collapse by
    * groupBy, and the per-vector top-3 ranks with a window whose
    * partial WindowGroupLimit keeps each map task's top-3 before the
    * exchange. Cell count scales with corpus size IN CODE:
    * [[KMeans.adaptiveK]] derives k from one count agg (8 at the test
    * SFs, n/4096 cells beyond) so per-cell pair work stays bounded;
    * hot cells beyond the expectation are the grid split's job.
    * SQL-CHECKED since round 11: the learned cell centroids export at
    * [[KnnCentsPath]] and the DuckDB oracle re-derives the 3-way
    * multi-assignment, the within-cell pair stage, the cross-cell
    * max-collapse, and the top-3 ranking from them (see
    * [[exportSide]]); KnnGraphSpec still measures recall against the
    * exact graph and pins determinism + the no-cartesian plan shape. */
  def knnGraph(s: SparkSession, dir: String): DataFrame = {
    // materialize once + row-aware spread (round-15): the corpus feeds
    // the fit and BOTH pair-join sides below
    val (v, n) = Vectors.materializeSpread(
      emb(s, dir).select(col("vec_id"), col("e"), col("nrm")))
    val fit = KMeans.fit(v, k = KMeans.adaptiveK(n), iters = 3, rows = n)
    exportSide(fit.centroids.select(col("cluster"), col("ce"), col("cn")),
      KnnCentsPath)
    val centsArr = s.read.parquet(KnnCentsPath)
      .agg(array_sort(collect_list(
        struct(col("cluster"), col("ce"), col("cn")))).as("cents"))
    // the multi-assign argmax feeds both sides of the within-cell pair
    // join; Spark does not dedupe the duplicated subtree, so without
    // the checkpoint the k-way argmax pass over the corpus ran TWICE
    val assigned = v.crossJoin(broadcast(centsArr))
      .select(col("vec_id"), col("e"), col("nrm"),
        explode(graft.functions.NearestCentroids(col("e"), col("cents"), 3))
          .as("cluster"))
      .localCheckpoint(true)
    val a = assigned.select(col("cluster"), col("vec_id").as("src"),
      col("e").as("se"), col("nrm").as("sn"))
    val b = assigned.select(col("cluster"), col("vec_id").as("dst"),
      col("e").as("de"), col("nrm").as("dn"))
    val pairs = a.join(b, Seq("cluster")).where(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        (Vectors.dot(col("se"), col("de")) / (col("sn") * col("dn"))).as("cos"))
      .groupBy(col("src"), col("dst")).agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
    pairs.withColumn("rank", row_number().over(w)).where(col("rank") <= 3)
      .select(col("src"), col("rank"), col("dst"), round(col("cos"), 4).as("cos"))
      .orderBy(col("src"), col("rank"))
  }

  /** C91: DIVERSITY-aware selection (the D4 recipe, Tirumala et al.
    * 2023): after near-dup removal, drop each cluster's most
    * PROTOTYPICAL members — the vectors closest to their learned
    * centroid (SSL-prototypes pruning) — because densely-packed
    * prototype regions contribute redundant gradient signal while the
    * cluster's periphery carries the diversity. Per-vector flags ride
    * in [[sampleDiverseFlags]]; this card reports per cluster: size,
    * dropped (⌈share·n⌉, most-prototypical-first, ties to the lower
    * vec_id), kept, integer-bp drop share, and the kept side's
    * mean/max prototypicality.
    *
    * Plan shape at 100 TB: one [[KMeans]] fit (broadcast-argmax
    * assignment), one broadcast join to score cosine-to-centroid, one
    * window per cluster whose partial WindowGroupLimit cannot apply
    * (rank depends on cluster size) but whose partitions are
    * adaptive-k-bounded cells, and a cluster-size equi-join — no pair
    * stage anywhere. SQL-CHECKED since round 11: the learned state —
    * the frozen assignment (this face consumes [[KMeans.Fit]]'s
    * last-round assignment, which lags the returned centroids by one
    * Lloyd update, so the assignment itself is data, not replayable
    * from the exported centroids) plus the centroid table — exports at
    * [[DiverseAssignPath]]/[[DiverseCentsPath]], and the DuckDB oracle
    * replays the prototypicality scoring, the per-cell ranking, the
    * ceil cut, and the card arithmetic from them. SampleDiverseSpec
    * still pins the ceil arithmetic, the threshold property (no kept
    * member more prototypical than any dropped one), determinism, and
    * the no-cartesian plan. */
  def sampleDiverse(s: SparkSession, dir: String,
                    dropShare: Double = 0.25): DataFrame = {
    val flags = sampleDiverseFlags(s, dir, dropShare)
    flags.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        count(when(!col("kept"), lit(1))).as("dropped"),
        count(when(col("kept"), lit(1))).as("kept"),
        round(avg(when(col("kept"), col("proto"))), 4).as("avg_kept_proto"),
        round(max(when(col("kept"), col("proto"))), 4).as("max_kept_proto"))
      .withColumn("drop_bp", expr("dropped * 10000 div n"))
      .select(col("cluster"), col("n"), col("dropped"), col("kept"),
        col("drop_bp"), col("avg_kept_proto"), col("max_kept_proto"))
      .orderBy(col("cluster"))
  }

  /** Per-vector selection flags behind [[sampleDiverse]]:
    * (vec_id, cluster, proto = cosine to own centroid, kept). */
  def sampleDiverseFlags(s: SparkSession, dir: String,
                         dropShare: Double): DataFrame = {
    require(dropShare >= 0.0 && dropShare < 1.0, s"bad dropShare: $dropShare")
    val v = emb(s, dir).select(col("vec_id"), col("e"), col("nrm"))
    val n = v.count()
    val fit = KMeans.fit(v, k = KMeans.adaptiveK(n), iters = 3, rows = n)
    exportSide(fit.assignments.select(col("vec_id"), col("cluster")),
      DiverseAssignPath)
    exportSide(fit.centroids.select(col("cluster"), col("ce"), col("cn")),
      DiverseCentsPath)
    val scored = s.read.parquet(DiverseAssignPath).join(v, Seq("vec_id"))
      .join(broadcast(s.read.parquet(DiverseCentsPath)), Seq("cluster"))
      .select(col("cluster"), col("vec_id"),
        Vectors.cosine(col("e"), col("ce"), col("nrm"), col("cn")).as("proto"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("proto").desc, col("vec_id"))
    val sizes = scored.groupBy(col("cluster")).agg(count(lit(1)).as("cn_"))
    scored.withColumn("r", row_number().over(w))
      .join(sizes, Seq("cluster"))
      .select(col("vec_id"), col("cluster"), round(col("proto"), 4).as("proto"),
        (col("r") > ceil(lit(dropShare) * col("cn_"))).as("kept"))
  }

  /** C83: SEMANTIC decontamination — the eval-leakage gate run in
    * embedding space, completing the decontamination family (C23 exact
    * n-grams, C29 containment, C72 bloom-gated, C77 KMV triage, C80
    * per-item report): a paraphrased or lightly-reworded eval item
    * shares no 2-gram with its training-set leak, but its embedding
    * still sits at high cosine — this card catches what every n-gram
    * face structurally cannot. Per eval item (the vec_id<5 convention
    * the n-gram faces use for doc_id): corpus vectors at cos ≥ τ
    * (τ=0.35, the corpus near-dup convention), the nearest corpus
    * cosine, and the nearest vector (ties to the lowest vec_id). An
    * unleaked item keeps its row with 0 flagged (the C80 rule); an
    * EMPTY corpus keeps every item row with NULL nearest (sweep-pinned).
    *
    * Plan shape at 100 TB: the eval side is always broadcast-tiny; the
    * corpus makes two narrow scan→partial-agg passes (counts+max, then
    * the argmax confirm against the broadcast eval-sized maxima) — a
    * row_number window would instead shuffle the whole scored frame
    * into |items| partitions, a guaranteed straggler at scale. */
  def contaminationSemantic(s: SparkSession, dir: String,
                            tau: Double = 0.35): DataFrame = {
    val v = emb(s, dir)
    val items = v.where(col("vec_id") < 5)
      .select(col("vec_id").as("item_id"), col("e").as("qe"), col("nrm").as("qn"))
    val corpus = v.where(col("vec_id") >= 5)
    val cos = Vectors.cosine(col("qe"), col("e"), col("qn"), col("nrm"))
    val scored = corpus.crossJoin(broadcast(items))
      .select(col("item_id"), col("vec_id"), round(cos, 4).as("cos"))
    val st = scored.groupBy(col("item_id"))
      .agg(count(when(col("cos") >= tau, lit(1))).as("n_flagged"),
        max(col("cos")).as("nearest_cos"))
    val nearest = scored
      .join(broadcast(st.select(col("item_id"), col("nearest_cos"))),
        Seq("item_id"))
      .where(col("cos") === col("nearest_cos"))
      .groupBy(col("item_id"))
      .agg(min(col("vec_id")).as("nearest_vec"))
    items.select(col("item_id"))
      .join(st, Seq("item_id"), "left")
      .join(nearest, Seq("item_id"), "left")
      .select(col("item_id"), coalesce(col("n_flagged"), lit(0L)).as("n_flagged"),
        col("nearest_cos"), col("nearest_vec"))
      .orderBy(col("item_id"))
  }

  /** C83 oracle: the identical two-pass construction in DuckDB. */
  val contaminationSemanticOracle: String =
    """WITH v AS (
      |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
      |  FROM embeddings),
      |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
      |      WHERE nrm IS NOT NULL AND nrm > 0),
      |q AS (SELECT vec_id AS item_id, e AS qe, nrm AS qn FROM n WHERE vec_id < 5),
      |sc AS (SELECT item_id, vec_id,
      |              round(list_dot_product(qe, e)/(qn*nrm), 4) AS cos
      |       FROM q, n WHERE vec_id >= 5),
      |st AS (SELECT item_id,
      |              count(*) FILTER (cos >= 0.35) AS n_flagged,
      |              max(cos) AS nearest_cos
      |       FROM sc GROUP BY item_id),
      |nr AS (SELECT sc.item_id, min(sc.vec_id) AS nearest_vec
      |       FROM sc JOIN st ON sc.item_id = st.item_id
      |                      AND sc.cos = st.nearest_cos
      |       GROUP BY sc.item_id)
      |SELECT q.item_id,
      |       cast(coalesce(st.n_flagged, 0) AS BIGINT) AS n_flagged,
      |       st.nearest_cos, nr.nearest_vec
      |FROM q LEFT JOIN st USING (item_id) LEFT JOIN nr USING (item_id)
      |ORDER BY q.item_id""".stripMargin

  /** C87: ANN RECALL AUDIT — the index-quality report a production
    * vector-search deployment runs continuously: measure each
    * approximate method's top-k against exact brute-force ground truth
    * on the (sampled) query set, as a CARD rather than a test assertion,
    * so index degradation (drifted data quantizing badly, an unlucky
    * plane set, a stale codebook) is an operational number, not a CI
    * surprise. Per (method ∈ lsh/ivf/pq/sq8/graph/adaptive × query):
    * ground-truth size, hits (approximate ∩ exact), integer-bp
    * recall@10. `adaptive` joined the ladder in round 13 AFTER the
    * vec4M decade found its recall had silently collapsed at scale
    * (0.08 at 512k, 0.00 at 4M — fixed prefix/shortlist) precisely
    * because it was the one serve face the audit never covered: a
    * face can be gate-green (its oracle replays the algorithm) and
    * cost-flat while returning garbage — only a recall audit catches
    * that class.
    *
    * Plan shape: each method's own (documented) plan runs once; the
    * audit overlay is joins over query-set-sized frames — at 100 TB the
    * exact side runs on the SAMPLED queries only, which is exactly how
    * production recall audits bound their cost. Build-heavy methods are
    * audited SERVE-COST-SHAPED (the round-10 verdict finding): `graph`
    * runs against the persisted adjacency ([[GraphAnn
    * .simSearchGraphCached]] — self-healing first build, spec-pinned
    * row-identical to the inline trainer), because a card whose purpose
    * is "continuously runnable" must not pay an index BUILD per
    * invocation; the remaining methods' fits are one-pass
    * (lsh: seeded planes, sq8: a min/max agg) or probe-bounded
    * (ivf/pq: small-k Lloyd over the sampled corpus) and stay inline.
    *
    * SQL-CHECKED since round 11 (the C102 export-the-learned-half
    * posture): the method top-k LISTS — outputs of learned indexes,
    * genuinely engine-path-dependent for pq/sq8/graph — export as ONE
    * (method, query_id, vec_id) side-table, and the DuckDB oracle
    * replays the part that IS deterministic: the exact brute-force
    * ground truth from the corpus (the C6 construction) and the whole
    * overlay arithmetic (per-query ground size, hits, integer-bp
    * recall) — so the audit's MEASUREMENT is engine-verified even
    * where its subjects are not. */
  def annRecallAudit(s: SparkSession, dir: String): DataFrame =
    recallOverlay(s, dir, AuditListsPath, Seq(
      "lsh" -> simSearchLsh(s, dir),
      "ivf" -> simSearchIvfInline(s, dir),
      "pq" -> ProductQuant.simSearchPqInline(s, dir),
      "sq8" -> ScalarQuant.simSearchSq8(s, dir),
      "graph" -> GraphAnn.simSearchGraphCached(s, dir),
      "adaptive" -> simSearchAdaptive(s, dir)))

  /** C87a: the audit against the PERSISTED serve indexes (IVF-PQ and
    * OPQ ArtifactStore tables) — "are the artifacts we actually serve
    * from still good", the batch companion to the D21 drift monitor:
    * D21 watches quantization error rise; this measures the recall the
    * degradation actually costs, on the same stored model the daily
    * probes use. First call builds the artifacts (self-healing, the
    * *_cached convention); warm calls audit without retraining.
    * SQL-CHECKED since round 11 with the C87 machinery over its own
    * exported list table. */
  def annRecallAuditCached(s: SparkSession, dir: String): DataFrame =
    recallOverlay(s, dir, AuditCachedListsPath, Seq(
      "ivfpq" -> IvfPq.simSearchIvfPqCached(s, dir),
      "opq" -> Opq.simSearchOpqCached(s, dir),
      "graph" -> GraphAnn.simSearchGraphCached(s, dir)))

  private def recallOverlay(s: SparkSession, dir: String, exportPath: String,
                            methods: Seq[(String, DataFrame)]): DataFrame = {
    import s.implicits._
    exportSide(methods.map { case (m, df) =>
      df.select(lit(m).as("method"), col("query_id"), col("vec_id"))
    }.reduce(_ unionAll _), exportPath)
    val lists = s.read.parquet(exportPath)
    val exact = simSearchTopk(s, dir).select(col("query_id"), col("vec_id"))
    val exactK = exact.groupBy(col("query_id")).agg(count(lit(1)).as("exact_k"))
    val hits = lists.join(exact, Seq("query_id", "vec_id"), "left_semi")
      .groupBy(col("method"), col("query_id")).agg(count(lit(1)).as("hits"))
    // every (method × query) keeps its row even at 0 hits: the method
    // universe is code (the Seq above), the query set is exactK's
    methods.map(_._1).toDF("method").crossJoin(exactK)
      .join(hits, Seq("method", "query_id"), "left")
      .select(col("method"), col("query_id"), col("exact_k"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .withColumn("recall_bp", expr("hits * 10000 div exact_k"))
      .orderBy(col("method"), col("query_id"))
  }

  val AuditListsPath: String = sidePath("audit_lists")
  val AuditCachedListsPath: String = sidePath("audit_cached_lists")

  /** C87/C87a oracle: method lists as data, exact side + overlay
    * arithmetic replayed (the C6 ground-truth construction). */
  private def recallAuditOracle(path: String, methods: Seq[String]): String =
    s"""WITH m AS (SELECT method, query_id, vec_id FROM '$path/*.parquet'),
       |v0 AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
       |       FROM embeddings),
       |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v0
       |      WHERE sqrt(list_dot_product(e, e)) > 0),
       |q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM n
       |      WHERE vec_id < 5),
       |c AS (SELECT query_id, vec_id,
       |             round(list_dot_product(qe, e)/(qn*nrm), 4) AS cosine
       |      FROM q, n WHERE vec_id <> query_id),
       |ex AS (SELECT query_id, vec_id FROM (
       |        SELECT *, rank() OVER (PARTITION BY query_id
       |          ORDER BY cosine DESC, vec_id) AS rnk FROM c) WHERE rnk <= 10),
       |ek AS (SELECT query_id, count(*)::BIGINT AS exact_k FROM ex GROUP BY 1),
       |mm AS (SELECT unnest(${methods.map("'" + _ + "'").mkString("[", ", ", "]")}) AS method),
       |h AS (SELECT m.method, m.query_id, count(*)::BIGINT AS hits
       |      FROM m JOIN ex USING (query_id, vec_id) GROUP BY 1, 2)
       |SELECT mm.method, ek.query_id, ek.exact_k,
       |       coalesce(h.hits, 0)::BIGINT AS hits,
       |       coalesce(h.hits, 0)::BIGINT * 10000 // ek.exact_k AS recall_bp
       |FROM mm CROSS JOIN ek
       |LEFT JOIN h ON h.method = mm.method AND h.query_id = ek.query_id
       |ORDER BY mm.method, ek.query_id""".stripMargin

  val annRecallAuditOracle: String =
    recallAuditOracle(AuditListsPath,
      Seq("lsh", "ivf", "pq", "sq8", "graph", "adaptive"))
  val annRecallAuditCachedOracle: String =
    recallAuditOracle(AuditCachedListsPath, Seq("ivfpq", "opq", "graph"))

  /** C90: EMBEDDING-SPACE source-divergence card — the diagonal
    * Fréchet distance between every source pair's embedding
    * distribution, completing the drift family in the third space:
    * C39 measures token-distribution divergence, C84 intake-batch
    * drift, D21 index-quantization drift; this one answers "do two
    * SOURCES occupy different regions of embedding space", the number
    * a mixture designer reads before trusting one source as a
    * substitute for another (and the batch-vs-corpus variant is the
    * FID-style intake gate). Per source pair: Σ_d (μ_a−μ_b)²
    * (mean gap), Σ_d (σ_a−σ_b-ish) variance gap, and their sum — the
    * Fréchet/Wasserstein-2² distance under the diagonal-Gaussian
    * approximation (Dowson–Landau 1982; the full-covariance form needs
    * a matrix sqrt no engine-portable oracle can spell, and at D=64
    * the diagonal term is the standard production proxy — FID itself
    * ships diagonal variants for exactly this reason).
    *
    * Plan shape at 100 TB: documents⋈embeddings is the C43 bucketing
    * candidate (narrow projections, id equi-join); the moment pass is
    * ONE posexplode scan partial-aggregated on (source × dim) — a key
    * space of #sources·64, so the shuffle is map-side-combined to
    * nothing; the pair stage joins a #sources·64-row frame with
    * itself. SQL-checked: DuckDB spells the identical moments via
    * generate_series indexing (sum-order fp noise sits ~10 digits
    * below the round-4 reporting precision). */
  def embedDivergence(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("source"))
    val e = Tables(s, dir, "embeddings")
      .where(col("embedding").isNotNull &&
        size(col("embedding")) === EmbeddingDim)
      .select(col("vec_id").as("doc_id"),
        transform(col("embedding"), _.cast("double")).as("e"))
    val byDim = d.join(e, Seq("doc_id"))
      .select(col("source"), posexplode(col("e")).as(Seq("dim", "x")))
      .groupBy(col("source"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("source"), col("dim"), (col("sx") / col("n")).as("mu"),
        greatest(col("sxx") / col("n") -
          (col("sx") / col("n")) * (col("sx") / col("n")), lit(0.0)).as("vr"))
    val a = byDim.select(col("source").as("source_a"), col("dim"),
      col("mu").as("ma"), col("vr").as("va"))
    val b = byDim.select(col("source").as("source_b"), col("dim"),
      col("mu").as("mb"), col("vr").as("vb"))
    val meanGap = (col("ma") - col("mb")) * (col("ma") - col("mb"))
    val varGap = col("va") + col("vb") -
      lit(2.0) * sqrt(greatest(col("va") * col("vb"), lit(0.0)))
    a.join(b, Seq("dim")).where(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(round(sum(meanGap), 4).as("mean_gap_sq"),
        round(sum(varGap), 4).as("var_gap"),
        round(sum(meanGap + varGap), 4).as("frechet_d2"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** C90 oracle: identical moments + pair fold in DuckDB. */
  val embedDivergenceOracle: String =
    """WITH de AS (
      |  SELECT d.source, list_transform(e.embedding, x -> x::DOUBLE) AS e
      |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      |  WHERE e.embedding IS NOT NULL AND len(e.embedding) = 64),
      |bd AS (
      |  SELECT source, i - 1 AS dim, count(*) AS n,
      |         sum(e[i]) AS sx, sum(e[i]*e[i]) AS sxx
      |  FROM de, unnest(generate_series(1, len(e))) AS t(i)
      |  GROUP BY source, i),
      |m AS (
      |  SELECT source, dim, sx/n AS mu,
      |         greatest(sxx/n - (sx/n)*(sx/n), cast(0 AS DOUBLE)) AS vr
      |  FROM bd)
      |SELECT a.source AS source_a, b.source AS source_b,
      |  round(sum((a.mu-b.mu)*(a.mu-b.mu)), 4) AS mean_gap_sq,
      |  round(sum(a.vr + b.vr
      |            - 2*sqrt(greatest(a.vr*b.vr, cast(0 AS DOUBLE)))), 4)
      |    AS var_gap,
      |  round(sum((a.mu-b.mu)*(a.mu-b.mu) + a.vr + b.vr
      |            - 2*sqrt(greatest(a.vr*b.vr, cast(0 AS DOUBLE)))), 4)
      |    AS frechet_d2
      |FROM m a JOIN m b ON a.dim = b.dim AND a.source < b.source
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** C13: per-label vector statistics (norms + mean component).
    * Unlike the similarity faces, this REPORT face keeps degenerate
    * (null / zero-norm) vectors visible: `n` counts every row and
    * `n_degenerate` counts the failed-encoder outputs, so a bad
    * embedding feed shows up in the card instead of silently shrinking
    * it; the norm/component stats are over the healthy rows only. */
  def embedStats(s: SparkSession, dir: String): DataFrame = {
    // empty-array guard: size 0 would be an ANSI divide-by-zero; such a
    // row is degenerate anyway and lands in n_degenerate
    val meanComp = when(size(col("e")) === 0, lit(null).cast("double"))
      .otherwise(aggregate(col("e"), lit(0.0), (acc, x) => acc + x) / size(col("e")))
    val deg = col("nrm").isNull || col("nrm") <= 0
    Vectors.withNorm(Tables(s, dir, "embeddings"), "embedding",
        dropDegenerate = false)
      .select(col("label"), col("nrm"), meanComp.as("mean_c"), deg.as("deg"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        count(when(col("deg"), lit(1))).as("n_degenerate"),
        round(avg(when(!col("deg"), col("nrm"))), 4).as("avg_norm"),
        round(min(when(!col("deg"), col("nrm"))), 4).as("min_norm"),
        round(max(when(!col("deg"), col("nrm"))), 4).as("max_norm"),
        round(avg(when(!col("deg"), col("mean_c"))), 4).as("avg_mean_comp"))
      .orderBy(col("label"))
  }

  /** C100: dimension-TRUNCATION recall audit (the Matryoshka question,
    * Kusupati et al. NeurIPS 2022: "can we serve d < D dims?") — for
    * d ∈ {8, 16, 32, 64}, the exact cosine top-10 per query computed in
    * the d-dim PREFIX space vs the full-dim top-10 as ground truth,
    * micro-averaged recall per d in integer bp. Sits beside the C87
    * method audit: C87 asks which INDEX to serve from, this asks how
    * many DIMENSIONS the index needs — 8-dim vectors are an 8× memory /
    * bandwidth cut on every face that carries `e`.
    *
    * Plan: ONE projection adds the four prefix norms per vector (narrow,
    * codegen), the C6 broadcast-query scored pass computes all four
    * prefix cosines per (query, corpus) row, a generator explodes them
    * to (d, cos) rows, and the per-(query, d) top-10 is the same
    * round-before-rank window as C6 (partial WindowGroupLimit map-side —
    * the final window sees ≤ 10 rows per map partition). Zero-norm
    * PREFIXES (a vector whose first d dims are all 0 — possible even
    * for healthy vectors) are dropped per-d with a mirrored guard, the
    * ANSI-div posture of Vectors.withNorm applied per prefix space.
    * SQL-checked: slices, dots, and norms are the same left-to-right
    * folds every cosine oracle already rests on. */
  def annDimAudit(s: SparkSession, dir: String): DataFrame = {
    val dims = Seq(8, 16, 32, 64)
    val v0 = emb(s, dir)
    def pref(d: Int, c: Column): Column = slice(c, 1, d)
    def prefNorm(d: Int): Column = sqrt(Vectors.dot(pref(d, col("e")), pref(d, col("e"))))
    val v = v0.select(col("vec_id") +: col("e") +:
      dims.map(d => prefNorm(d).as(s"n$d")): _*)
    val queries = v.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id") +: col("e").as("qe") +:
        dims.map(d => col(s"n$d").as(s"qn$d")): _*)
    val scored = v.where(col("vec_id") >= 5).crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        explode(array(dims.map { d =>
          struct(lit(d).as("dims"),
            when(col(s"n$d") > 0 && col(s"qn$d") > 0,
              round(Vectors.dot(pref(d, col("qe")), pref(d, col("e"))) /
                (col(s"qn$d") * col(s"n$d")), 4)).as("cosine"))
        }: _*)).as("dc"))
      .select(col("query_id"), col("vec_id"),
        col("dc.dims").as("dims"), col("dc.cosine").as("cosine"))
      .where(col("cosine").isNotNull)
    val w = Window.partitionBy(col("dims"), col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    val top = scored.withColumn("rnk", rank().over(w)).where(col("rnk") <= 10)
      .select(col("dims"), col("query_id"), col("vec_id"))
    val truth = top.where(col("dims") === 64)
      .select(col("query_id"), col("vec_id"), lit(1L).as("__hit"))
    top.join(truth, Seq("query_id", "vec_id"), "left")
      .groupBy(col("dims"))
      .agg(countDistinct(col("query_id")).as("queries"),
        coalesce(sum(col("__hit")), lit(0L)).as("hits"),
        count(lit(1)).as("returned"))
      .crossJoin(broadcast(truth.agg(count(lit(1)).as("truth"))))
      .withColumn("recall_bp", expr("hits * 10000 div truth"))
      .select(col("dims"), col("queries"), col("returned"), col("hits"),
        col("truth"), col("recall_bp"))
      .orderBy(col("dims"))
  }

  /** Corpus-count knee where [[simSearchAdaptive]] retires the prefix
    * funnel in favor of the exact scan — the round-13 vec4M decade's
    * finding closed as code (the C5b posture transposed). Two measured
    * facts force the retirement rather than a deeper operating point:
    * (1) RECALL: the d=16 prefix estimate of a 64-dim cosine carries
    * noise σ = 1/√16 = 0.25 while the top-100 prefix cut among n
    * near-isotropic vectors rises like z(100/n)·σ — recall@10 vs the
    * face's own exact truth, measured this round across the scales:
    * 0.70/0.68 at the two 500-vector gates, 0.48 at 2k, 0.22 at 8k,
    * 0.06 at 64k, 0.08 at 512k, 0.00 at 4M. No fixed shortlist survives
    * growth, and holding the shortlist as a corpus FRACTION restores
    * recall only by making stage 2 linear in n — a funnel that no
    * longer funnels. (2) COST: on inline 64-dim vectors the funnel
    * never beats the exact scan anyway (2.22 s vs topk's 1.67 s at
    * 512k, 5.89 vs 4.01 at 4M) — stage 1 still scans every row, and
    * parquet cannot prune array PREFIXES, so the "4× less bandwidth"
    * the funnel pattern is built around only exists where prefixes are
    * materialized as their own column/table (the wide-dim production
    * deployment this face demonstrates the pattern for), never inline
    * on this geometry. The funnel therefore exists below the knee as
    * the documented C100-informed serving-pattern demonstration at the
    * gate corpora, and hands over to the exact scan past it — recall
    * 1.0 at strictly lower measured cost. 2048 = the tightest power of
    * two above the largest gate corpus (2000); every scale decade
    * (8k/64k/512k/4M) routes exact. */
  val AdaptiveFunnelKnee: Long = 2048L

  /** C104: ADAPTIVE two-stage retrieval (the serving pattern the C100
    * audit informs — Kusupati et al.'s adaptive retrieval / the
    * funnel-serving shape): SHORTLIST with cheap d=16 prefix cosines
    * (4× less bandwidth per candidate), then EXACT full-dim rescore of
    * only the top-`shortlist` prefix candidates, final top-10. At
    * 100 TB the first stage is the one that touches the corpus — it
    * reads a quarter of every vector; the rescore touches `shortlist`
    * rows per query. The C100 card says how much recall the shortlist
    * stage risks (800 bp @ d=8 on these random vectors — hence d=16
    * and a deep 100-candidate shortlist here, recall rescued by the
    * rescore); deterministic round-before-rank at both stages,
    * SQL-checked.
    *
    * KNEE-ROUTED since round 14 (see [[AdaptiveFunnelKnee]]): past the
    * knee the fixed shortlist's recall is measured collapsed (0.00 at
    * 4M) while the funnel never out-runs the exact scan on this
    * geometry, so the face routes to [[exactTopkFrom]] over its own
    * corpus contract (vec_id ≥ 5) — recall 1.0 at the exact scan's
    * cost (4.0 s at 4M vs the funnel's 5.89 s). Below the knee — all
    * gate SFs — the face IS the funnel, bit-identical to every
    * previous round, so the registered oracle replays unchanged
    * (Verify asserts the route; AdaptiveFunnelSpec pins both branches
    * and the boundary). */
  def simSearchAdaptive(s: SparkSession, dir: String,
      prefixDim: Int = 16, shortlist: Int = 100,
      knee: Long = AdaptiveFunnelKnee): DataFrame = {
    val v0 = emb(s, dir)
    if (v0.count() <= knee) simSearchAdaptiveFunnel(v0, prefixDim, shortlist)
    else exactTopkFrom(v0, v0.where(col("vec_id") >= 5))
  }

  /** The below-knee funnel branch of [[simSearchAdaptive]], on an
    * explicit [[Vectors.withNorm]] frame — exposed so the spec can pin
    * branch identity and measure recall per scale. */
  private[ops] def simSearchAdaptiveFunnel(v0: DataFrame,
      prefixDim: Int, shortlist: Int): DataFrame = {
    def pref(c: Column): Column = slice(c, 1, prefixDim)
    val v = v0.select(col("vec_id"), col("e"), col("nrm"),
      sqrt(Vectors.dot(pref(col("e")), pref(col("e")))).as("np"))
      .where(col("np") > 0)
    val queries = v.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("e").as("qe"),
        col("nrm").as("qn"), col("np").as("qnp"))
    val preCos = Vectors.dot(pref(col("qe")), pref(col("e"))) / (col("qnp") * col("np"))
    val scored = v.where(col("vec_id") >= 5).crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id"), col("e"), col("nrm"),
        col("qe"), col("qn"), round(preCos, 4).as("pre"))
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(col("pre").desc, col("vec_id"))
    val short = scored.withColumn("prnk", rank().over(w1))
      .where(col("prnk") <= shortlist)
    val full = Vectors.cosine(col("qe"), col("e"), col("qn"), col("nrm"))
    val rescored = short.select(col("query_id"), col("vec_id"),
      round(full, 4).as("cosine"))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    rescored.withColumn("rnk", rank().over(w2)).where(col("rnk") <= 10)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("rnk"), col("vec_id"))
  }

  /** C104 oracle: both stages replayed over list_slice prefixes. */
  val simSearchAdaptiveOracle: String =
    """WITH v0 AS (
      |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
      |  FROM embeddings),
      |v AS (SELECT vec_id, e,
      |             sqrt(list_dot_product(e, e)) AS nrm,
      |             sqrt(list_dot_product(e[1:16], e[1:16])) AS np
      |      FROM v0
      |      WHERE sqrt(list_dot_product(e[1:16], e[1:16])) > 0),
      |q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn, np AS qnp
      |      FROM v WHERE vec_id < 5),
      |sc AS (
      |  SELECT query_id, vec_id, v.e, v.nrm, qe, qn,
      |         round(list_dot_product(qe[1:16], v.e[1:16]) / (qnp * np), 4) AS pre
      |  FROM v, q WHERE vec_id >= 5),
      |s1 AS (SELECT *, rank() OVER (PARTITION BY query_id
      |                              ORDER BY pre DESC, vec_id) AS prnk
      |       FROM sc),
      |short AS (SELECT * FROM s1 WHERE prnk <= 100),
      |re AS (SELECT query_id, vec_id,
      |              round(list_dot_product(qe, e)/(qn*nrm), 4) AS cosine
      |       FROM short),
      |r AS (SELECT *, rank() OVER (PARTITION BY query_id
      |                             ORDER BY cosine DESC, vec_id) AS rnk
      |      FROM re)
      |SELECT query_id, rnk, vec_id, cosine FROM r WHERE rnk <= 10
      |ORDER BY query_id, rnk, vec_id""".stripMargin

  /** C100 oracle: the identical construction over list_slice prefixes. */
  val annDimAuditOracle: String = {
    val dims = Seq(8, 16, 32, 64)
    val prefCos = dims.map { d =>
      s"""    struct_pack(dims := $d, cosine := CASE
         |      WHEN sqrt(list_dot_product(e[1:$d], e[1:$d])) > 0
         |       AND sqrt(list_dot_product(qe[1:$d], qe[1:$d])) > 0
         |      THEN round(list_dot_product(qe[1:$d], e[1:$d]) /
         |           (sqrt(list_dot_product(qe[1:$d], qe[1:$d])) *
         |            sqrt(list_dot_product(e[1:$d], e[1:$d]))), 4) END)""".stripMargin
    }.mkString(",\n")
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 5),
       |sc0 AS (
       |  SELECT query_id, vec_id, unnest([
       |$prefCos
       |  ]) AS dc
       |  FROM v, q WHERE vec_id >= 5),
       |sc AS (SELECT query_id, vec_id, dc.dims AS dims, dc.cosine AS cosine
       |       FROM sc0 WHERE dc.cosine IS NOT NULL),
       |r AS (SELECT *, rank() OVER (PARTITION BY dims, query_id
       |                             ORDER BY cosine DESC, vec_id) AS rnk
       |      FROM sc),
       |top AS (SELECT dims, query_id, vec_id FROM r WHERE rnk <= 10),
       |truth AS (SELECT query_id, vec_id FROM top WHERE dims = 64),
       |tc AS (SELECT count(*)::BIGINT AS truth FROM truth),
       |agg AS (
       |  SELECT top.dims,
       |         count(DISTINCT top.query_id)::BIGINT AS queries,
       |         count(*)::BIGINT AS returned,
       |         count(t.vec_id)::BIGINT AS hits
       |  FROM top LEFT JOIN truth t
       |    ON top.query_id = t.query_id AND top.vec_id = t.vec_id
       |  GROUP BY top.dims)
       |SELECT dims, queries, returned, hits, tc.truth,
       |       hits * 10000 // tc.truth AS recall_bp
       |FROM agg, tc ORDER BY dims""".stripMargin
  }

  /** Per-table DuckDB bucket expressions for a hyperplane LSH table set:
    * the SAME seeded ±1 planes the Spark faces use
    * ([[Vectors.hyperplanes]] is deterministic), INLINED as array
    * literals at oracle-construction time. The sign test is engine-exact
    * because both engines fold the dot product left-to-right over the
    * same doubles (the property every green cosine oracle already rests
    * on), so the buckets — and hence the candidate sets — are
    * bit-identical cross-engine. */
  private def bucketSql(numTables: Int, bitsPerTable: Int, dim: Int,
      seedBase: Long): Seq[String] =
    (0 until numTables).map { l =>
      val planes = Vectors.hyperplanes(bitsPerTable, dim, seedBase + l)
      planes.zipWithIndex.map { case (p, j) =>
        val lits = p.map(x => if (x > 0) "1.0" else "-1.0")
          .mkString("[", ", ", "]::DOUBLE[]")
        s"(CASE WHEN list_dot_product(e, $lits) > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString("(", " + ", ")")
    }

  /** Per-table masked bucket expressions for the ADAPTIVE C7 oracle:
    * all [[Vectors.MaxLshBits]] seeded planes inline (the b-plane set is
    * a row-major prefix of the 12-plane set at the same seed), each
    * plane's term gated on `j < p.b` so the replayed signature width is
    * the scalar the `p` CTE derives from the corpus count — the oracle
    * inlines the RULE, not one operating point. */
  private def maskedBucketSql(numTables: Int, dim: Int,
      seedBase: Long): Seq[String] =
    (0 until numTables).map { l =>
      val planes = Vectors.hyperplanes(Vectors.MaxLshBits, dim, seedBase + l)
      planes.zipWithIndex.map { case (p, j) =>
        val lits = p.map(x => if (x > 0) "1.0" else "-1.0")
          .mkString("[", ", ", "]::DOUBLE[]")
        s"(CASE WHEN $j < p.b AND list_dot_product(e, $lits) > 0 THEN ${1L << j}::BIGINT ELSE 0 END)"
      }.mkString("(", " + ", ")")
    }

  /** C7 oracle: generated from the same (L=4, seed 42+l) plane set as
    * [[simSearchLsh]], replaying the same adaptive operating point —
    * signature width from [[Vectors.adaptiveLshBits]] (an exact integer
    * CASE, no floating log2) and query-side Hamming-1 probes once the
    * width adapts. Banded corpus, probed-bucket-mate candidates in any
    * table, exact round-4 cosine rescore, rank <= 10. */
  val simSearchLshOracle: String = {
    val buckets = maskedBucketSql(numTables = 4, dim = EmbeddingDim,
      seedBase = 42L)
    val bandSelects = buckets.zipWithIndex.map { case (b, l) =>
      s"  SELECT vec_id, e, nrm, $l AS tbl, $b AS bucket FROM n, p"
    }.mkString("\n  UNION ALL\n")
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
       |  FROM embeddings),
       |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
       |      WHERE sqrt(list_dot_product(e, e)) > 0),
       |p AS (SELECT CASE WHEN count(*) <= 8192 THEN 6 ELSE 7 END AS b,
       |             CASE WHEN count(*) > 8192 THEN 1 ELSE 0 END AS r
       |      FROM n),
       |banded AS (
       |$bandSelects),
       |q AS (SELECT query_id, tbl, unnest(probes) AS bucket FROM (
       |        SELECT vec_id AS query_id, tbl,
       |               CASE WHEN p.r = 1 THEN list_prepend(bucket,
       |                 list_transform(range(p.b), j -> xor(bucket, (1::BIGINT << j))))
       |               ELSE [bucket] END AS probes
       |        FROM banded, p WHERE vec_id < 5)),
       |cand AS (
       |  SELECT DISTINCT q.query_id, b.vec_id
       |  FROM banded b JOIN q ON b.tbl = q.tbl AND b.bucket = q.bucket
       |  WHERE b.vec_id <> q.query_id),
       |scored AS (
       |  SELECT cand.query_id, cand.vec_id,
       |         round(list_dot_product(x.e, y.e)/(x.nrm*y.nrm), 4) AS cosine
       |  FROM cand JOIN n x ON cand.query_id = x.vec_id
       |            JOIN n y ON cand.vec_id = y.vec_id),
       |r AS (SELECT *, rank() OVER (PARTITION BY query_id
       |                             ORDER BY cosine DESC, vec_id) AS rnk
       |      FROM scored)
       |SELECT query_id, rnk, vec_id, cosine FROM r WHERE rnk <= 10
       |ORDER BY query_id, rnk, vec_id""".stripMargin
  }

  /** C5a oracle: generated from the same (L=8, bits=2, seed 142+l) plane
    * set as [[dedupEmbeddingLsh]] — label-blocked bucket-mate candidates,
    * exact tau=0.35 rescore, max-cos per pair (identical across the k
    * colliding tables), round-4. */
  val dedupEmbeddingLshOracle: String = {
    val buckets = bucketSql(numTables = 8, bitsPerTable = 2,
      dim = EmbeddingDim, seedBase = 142L)
    val bandSelects = buckets.zipWithIndex.map { case (b, l) =>
      s"  SELECT vec_id, label, e, nrm, $l AS tbl, $b AS bucket FROM n"
    }.mkString("\n  UNION ALL\n")
    s"""WITH v AS (
       |  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS e
       |  FROM embeddings),
       |n AS (SELECT vec_id, label, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
       |      WHERE sqrt(list_dot_product(e, e)) > 0),
       |banded AS (
       |$bandSelects),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label
       |  FROM banded a JOIN banded b
       |    ON a.label = b.label AND a.tbl = b.tbl AND a.bucket = b.bucket
       |    AND a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, cand.label AS label,
       |       round(list_dot_product(x.e, y.e)/(x.nrm*y.nrm), 4) AS cosine
       |FROM cand JOIN n x ON cand.vec_a = x.vec_id
       |          JOIN n y ON cand.vec_b = y.vec_id
       |WHERE list_dot_product(x.e, y.e)/(x.nrm*y.nrm) >= 0.35
       |ORDER BY vec_a, vec_b""".stripMargin
  }
}
