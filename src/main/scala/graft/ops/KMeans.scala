package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Spherical k-means (Lloyd's algorithm under cosine similarity) —
  * LEARNED centroids for the IVF index, replacing the label column the
  * C16 build borrows as its clustering.
  *
  * Iteration shape at 100 TB:
  *  - ASSIGN is the shuffle-free narrow argmax the IVF fix introduced:
  *    centroids fold into one broadcast array row and
  *    [[graft.functions.NearestCentroids]] scores each vector in place —
  *    the corpus is scanned once per round and never exchanged.
  *  - UPDATE is the (cluster, dim) partial-aggregating mean the C14
  *    centroid query uses — a giant cluster spreads over `dim` keys, so
  *    no reducer owns a whole cluster.
  *  - Only the k-row centroid frame iterates, and it is eagerly
  *    localCheckpoint'ed each round — the corpus frame's plan never
  *    deepens (the Cluster.scala lesson).
  *
  * Cosine is scale-invariant in the centroid, so the plain per-dimension
  * mean IS the optimal update for the cosine objective — the classical
  * EM argument applies and the mean-cosine objective is non-decreasing
  * round over round (KMeansSpec pins this). A cluster that loses every
  * member drops out; ids keep their init positions.
  */
object KMeans {

  final case class Fit(assignments: DataFrame, centroids: DataFrame,
                       objective: Seq[Double])

  /** Expected members per cell the adaptive cluster count targets.
    * 512 keeps the within-cell quadratic stages small (512² ≈ 2.6·10⁵
    * 16-byte-code comparisons per cell) and was MEASURED, not guessed:
    * at the sf1 curve sweep (8k vectors) the earlier 4096 target left
    * k at the minK floor and the Σcell² candidate stage went
    * super-linear (dedup_semantic_pq 6.9× on 4× data); 512 starts
    * growing k at 4k vectors, exactly where the quadratic term starts
    * to bite. */
  val TargetCellSize: Long = 512L

  /** Centroid-count ceiling: the assignment argmax broadcasts all
    * centroids, so cells are capped at 2¹⁸ ≈ 262k (~134 MB at 64
    * float64 dims). Beyond n = MaxCells·cell ≈ 134M vectors, expected
    * cell size grows linearly again — the documented trade; past that
    * regime the production answer is hierarchical/partitioned coarse
    * quantization, not a bigger broadcast. */
  val MaxCells: Int = 1 << 18

  /** The SURVEY §5 scale lever AS CODE, not prose: derive the
    * cluster/cell count from corpus size so per-cell work stays
    * bounded as the corpus grows —
    * `k = clamp(ceil(n / cell), minK, maxK)`.
    * Every k-means-backed face (semantic dedup C37/C76/C79, IVF
    * C16a/C44, knn_graph C68, embed_kmeans C22, corpus_topics C59)
    * derives its k through this: at the test SFs (n ≤ minK·cell =
    * 4096) it resolves to minK = 8, so results are unchanged there;
    * at 10⁹ vectors it yields the MaxCells ceiling (262k cells of
    * ~3.8k expected members). By construction n / adaptiveK(n) ≤ cell
    * for every n up to MaxCells·cell (AdaptiveKSpec pins the bound,
    * the resolves-to-8 regime, and the ceiling). Hot cells beyond the
    * expectation are handled downstream by the G×G grid split the
    * pair joins already carry. */
  def adaptiveK(n: Long, targetCellSize: Long = TargetCellSize,
      minK: Int = 8, maxK: Int = MaxCells): Int = {
    require(targetCellSize >= 1, s"targetCellSize must be positive: $targetCellSize")
    require(minK >= 1 && maxK >= minK, s"bad k bounds: [$minK, $maxK]")
    val cells = (math.max(n, 0L) + targetCellSize - 1L) / targetCellSize
    math.min(math.max(minK.toLong, cells), maxK.toLong).toInt
  }

  /** `v` needs (vec_id, e: array<double>, nrm) — [[Vectors.withNorm]]
    * output. Init: the k lowest vec_ids (deterministic; callers wanting
    * k-means|| can pass their own via `initCentroids`). */
  /** `trackObjective=false` (the production setting) skips the
    * per-round objective scan — one fewer pass over the corpus per
    * round; the spec turns it on to pin monotonicity.
    * `rows` (when the caller already counted the corpus for
    * [[adaptiveK]]) makes the up-front spread row-aware — see
    * [[Vectors.ensureParallelism]]. */
  def fit(v0: DataFrame, k: Int, iters: Int,
          initCentroids: Option[DataFrame] = None,
          trackObjective: Boolean = false,
          rows: Long = -1L): Fit = {
    require(k >= 1, s"k must be positive: $k")
    require(iters >= 1, s"iters must be positive: $iters")
    // one up-front spread beats `iters` serial assign passes over an
    // unsplittable single-rowgroup scan (Vectors.ensureParallelism doc)
    val v = Vectors.ensureParallelism(v0, rows)
    // cluster ids are the seed vec_ids themselves — any atomic id works
    // for the argmax, and it avoids a global row-number window over the
    // seed set (id contiguity buys nothing)
    val init = initCentroids.getOrElse {
      v.orderBy(col("vec_id")).limit(k)
        .select(col("vec_id").as("cluster"), col("e").as("ce"), col("nrm").as("cn"))
    }

    var cents = init.localCheckpoint(true)
    var objective = Vector.empty[Double]
    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      val centsArr = cents.agg(array_sort(collect_list(
        struct(col("cluster"), col("ce"), col("cn")))).as("cents"))
      assigned = v.crossJoin(broadcast(centsArr))
        .select(col("vec_id"), col("e"), col("nrm"),
          graft.functions.NearestCentroids(col("e"), col("cents"), 1)
            .getItem(0).as("cluster"))
      if (trackObjective) {
        objective :+= assigned.join(broadcast(cents), Seq("cluster"))
          .agg(avg(Vectors.cosine(col("e"), col("ce"), col("nrm"), col("cn"))))
          .head.getDouble(0)
      }
      val next = assigned
        .select(col("cluster"), posexplode(col("e")).as(Seq("dim", "comp")))
        .groupBy(col("cluster"), col("dim"))
        .agg(avg(col("comp")).as("m"))
        .groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          x => x.getField("m")).as("ce0"))
      cents = Vectors.withNorm(next, "ce0")
        .select(col("cluster"), col("e").as("ce"), col("nrm").as("cn"))
        .localCheckpoint(true)
    }
    Fit(assigned.select(col("vec_id"), col("cluster")), cents, objective)
  }

  /** Query face (`embed_kmeans`): [[adaptiveK]]-derived learned
    * clusters over the embeddings corpus (resolves to 8 at the test
    * SFs), 4 Lloyd rounds; per-cluster population and tightness.
    * SQL-CHECKED since round 11 (the C59 learned-state-as-data
    * posture): the last-round assignment (which lags the returned
    * centroids by one Lloyd update — data by construction) and the
    * centroid table export at [[KmeansAssignPath]]/[[KmeansCentsPath]],
    * and the DuckDB oracle replays the cosine-tightness card from
    * them. */
  def embedKmeans(s: SparkSession, dir: String): DataFrame = {
    // materialize once + row-aware spread (round-15): 4 Lloyd rounds +
    // the final card join all re-scan this frame
    val (v, n) = Vectors.materializeSpread(
      Vectors.withNorm(Tables(s, dir, "embeddings"), "embedding")
        .select(col("vec_id"), col("e"), col("nrm")))
    val f = fit(v, k = adaptiveK(n), iters = 4, rows = n)
    graft.ops.VectorQueries.exportSide(
      f.assignments.select(col("vec_id"), col("cluster")), KmeansAssignPath)
    graft.ops.VectorQueries.exportSide(
      f.centroids.select(col("cluster"), col("ce"), col("cn")), KmeansCentsPath)
    s.read.parquet(KmeansAssignPath)
      .join(broadcast(s.read.parquet(KmeansCentsPath)), Seq("cluster"))
      .join(v, Seq("vec_id"))
      .withColumn("cos", Vectors.cosine(col("e"), col("ce"), col("nrm"), col("cn")))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("cos")), 4).as("avg_cos"),
        round(min(col("cos")), 4).as("min_cos"),
        round(max(col("cn")), 4).as("centroid_norm"))
      .orderBy(col("cluster"))
  }

  /** C59: corpus topic cards — the "what is actually IN this corpus"
    * view a dataset card leads with: the k-means clusters over the
    * embedding space, each labeled by its top-5 CHARACTERISTIC terms
    * from the text side (the C43 cross-modal id join: embeddings and
    * documents share the id). Terms rank by LIFT — in-cluster document
    * share over corpus document share (the c-TF-IDF idea BERTopic
    * popularized): ubiquitous terms sink to lift ≈ 1 on their own, so
    * no stopword cutoff can empty a cluster's label set, and every
    * cluster always surfaces its most distinctive vocabulary. Ties on
    * (count desc, term) per §4. Plan: the cluster fit is
    * metadata-bound (k centroid rows broadcast per round); labeling is
    * one distinct-token explode, a vocabulary-sized df rollup, an id
    * equi-join to the assignments (the canonical bucketing candidate),
    * and the C28 partial-WindowGroupLimit top-5 per cluster — no
    * global sort.
    *
    * SQL-CHECKED since round 11 (the C56 cuts-are-data posture, taken
    * one step further): the LEARNED half — the cluster assignment — is
    * exported as a parquet side-table at [[TopicsAssignPath]], and the
    * DuckDB oracle consumes it as DATA while replaying everything
    * deterministic from the corpus itself (the distinct-token df, the
    * cluster sizes, the lift arithmetic, the top-5 ranking). The
    * Viterbi analog of the split: the learned state is spec-bounded
    * (KMeansSpec determinism + assignment-is-argmax), the arithmetic
    * downstream of it is engine-verified. Lift ships as INTEGER bp via
    * the floor idiom (§4: per-row round() of arbitrary doubles is not
    * parity-safe; floor(x·10⁴ + 0.5) is pure IEEE). */
  def corpusTopics(s: SparkSession, dir: String): DataFrame = {
    // materialize once + row-aware spread (the embedKmeans rationale)
    val (v, n) = Vectors.materializeSpread(
      Vectors.withNorm(Tables(s, dir, "embeddings"), "embedding")
        .select(col("vec_id"), col("e"), col("nrm")))
    val f = fit(v, k = adaptiveK(n), iters = 4, rows = n)
    f.assignments.select(col("vec_id").as("doc_id"), col("cluster"))
      .coalesce(1).write.mode("overwrite").parquet(TopicsAssignPath)
    val assign = s.read.parquet(TopicsAssignPath)
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(Text.tokens(col("text")))).as("term"))
    val total = Tables(s, dir, "documents").agg(count(lit(1)).as("nd"))
    val dfAll = toks.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val sizes = assign.groupBy(col("cluster")).agg(count(lit(1)).as("n_docs"))
    val counts = toks.join(assign, Seq("doc_id"))
      .groupBy(col("cluster"), col("term"))
      .agg(count(lit(1)).as("docs_with_term"))
      .join(dfAll, Seq("term"))
      .join(broadcast(sizes), Seq("cluster"))
      .crossJoin(broadcast(total))
      .withColumn("lift_bp", floor(col("docs_with_term").cast("double")
        * col("nd") * lit(10000) / (col("df") * col("n_docs")) + lit(0.5))
        .cast("long"))
    import org.apache.spark.sql.expressions.Window
    counts
      .withColumn("rank", row_number().over(Window.partitionBy(col("cluster"))
        .orderBy(col("lift_bp").desc, col("docs_with_term").desc, col("term"))))
      .where(col("rank") <= 5)
      .select(col("cluster"), col("n_docs"), col("rank"),
        col("term"), col("docs_with_term"), col("lift_bp"))
      .orderBy(col("cluster"), col("rank"))
  }

  /** Where [[corpusTopics]] exports the learned assignment for the
    * oracle ("the learned clusters ARE data"). tmpdir-fixed so the
    * statically-built oracle string and the face agree on the path;
    * Verify/gate runs are serial, so the last face invocation's export
    * is always the one the immediately-following DuckDB replay reads. */
  val TopicsAssignPath: String =
    s"${sys.props("java.io.tmpdir")}/graft_topics_assign.parquet"

  /** [[embedKmeans]]'s learned-state exports (same posture). */
  val KmeansAssignPath: String =
    s"${sys.props("java.io.tmpdir")}/graft_kmeans_assign.parquet"
  val KmeansCentsPath: String =
    s"${sys.props("java.io.tmpdir")}/graft_kmeans_cents.parquet"

  /** C22 oracle: the exported assignment + centroid tables as data,
    * the cosine-tightness card replayed from them (left-to-right dot
    * parity; post-agg round-4 per §4). */
  val embedKmeansOracle: String =
    s"""WITH asg AS (SELECT vec_id, cluster FROM '$KmeansAssignPath/*.parquet'),
       |cents AS (SELECT cluster, ce, cn FROM '$KmeansCentsPath/*.parquet'),
       |v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
       |      FROM embeddings),
       |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
       |      WHERE sqrt(list_dot_product(e, e)) > 0),
       |j AS (SELECT a.cluster, c.cn,
       |             list_dot_product(n.e, c.ce)/(n.nrm*c.cn) AS cos
       |      FROM n JOIN asg a USING (vec_id) JOIN cents c USING (cluster))
       |SELECT cluster, count(*)::BIGINT AS n_vecs,
       |       round(avg(cos), 4) AS avg_cos,
       |       round(min(cos), 4) AS min_cos,
       |       round(max(cn), 4) AS centroid_norm
       |FROM j GROUP BY cluster ORDER BY cluster""".stripMargin

  /** C59 oracle: the exported assignment as data + everything else
    * replayed from the corpus (df, sizes, integer-bp lift, top-5). */
  val topicsOracle: String =
    s"""WITH assign AS (
       |  SELECT doc_id, cluster FROM '$TopicsAssignPath/*.parquet'),
       |toks AS (
       |  SELECT doc_id, unnest(list_distinct(string_split(
       |    trim(regexp_replace(lower(text),'\\s+',' ','g')),' '))) AS term
       |  FROM documents),
       |tot AS (SELECT count(*)::BIGINT AS nd FROM documents),
       |dfa AS (SELECT term, count(*)::BIGINT AS df FROM toks GROUP BY 1),
       |sz AS (SELECT cluster, count(*)::BIGINT AS n_docs FROM assign GROUP BY 1),
       |cnt AS (
       |  SELECT a.cluster, t.term, count(*)::BIGINT AS docs_with_term
       |  FROM toks t JOIN assign a USING (doc_id) GROUP BY 1, 2),
       |lifted AS (
       |  SELECT c.cluster, sz.n_docs, c.term, c.docs_with_term,
       |         CAST(floor(c.docs_with_term::DOUBLE * tot.nd * 10000
       |           / (dfa.df * sz.n_docs) + 0.5) AS BIGINT) AS lift_bp
       |  FROM cnt c JOIN dfa USING (term) JOIN sz USING (cluster), tot),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY cluster
       |    ORDER BY lift_bp DESC, docs_with_term DESC, term) AS rank
       |  FROM lifted)
       |SELECT cluster, n_docs, CAST(rank AS INT) AS rank, term,
       |       docs_with_term, lift_bp
       |FROM ranked WHERE rank <= 5
       |ORDER BY cluster, rank""".stripMargin
}
