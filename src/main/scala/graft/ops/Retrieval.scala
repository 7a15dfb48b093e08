package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Lexical (BM25) and hybrid (BM25 + vector, RRF-fused) retrieval over
  * the document corpus — the search family the ANN ladder (SURVEY §2.C
  * C6–C7, C16, C38, C44, C51, C89) deliberately does not cover: exact
  * term-match ranking, and its fusion with semantic ranks. A
  * training-data pipeline runs this shape for retrieval-based
  * decontamination (find the corpus documents most similar to each eval
  * item LEXICALLY — the published complement of the n-gram gates C23/C29
  * and the embedding gate C83) and as the serving baseline any hybrid
  * search deployment starts from.
  *
  * Query-set convention: docs 0–4 are the held-out "benchmark" items
  * (the C23/C29/C80 convention); the corpus is docs >= 5. A query is the
  * item's own distinct token set.
  *
  * Scale design (100 TB):
  *  - The postings frame (tf) is ONE token explode + partial-aggregating
  *    groupBy — the C20 shape; document length and document frequency
  *    both derive FROM tf (its rows are already distinct (doc, term)
  *    pairs), so the corpus is tokenized exactly once.
  *  - The query side is eval-sized by definition and BROADCASTS; the
  *    corpus never shuffles for the term match — the only wide exchange
  *    after tf is the per-(item, doc) score rollup.
  *  - Query-term work is bounded two ways, both deterministic integer
  *    predicates mirrored exactly in the oracle: junk-grade terms are
  *    dropped at df·10 > N·9 (a term in over 90% of the corpus has
  *    idf ≈ 0 and the hottest postings list), and each query keeps only
  *    its 8 RAREST surviving terms (rank by (df, term) — the classic
  *    query-term-selection bound: per-item postings work is capped by
  *    the 8 smallest lists regardless of query length). Production
  *    WAND/impact-ordered skipping optimizes the same bound without
  *    changing which terms can score.
  *  - Scores stay engine-exact: every step is IEEE +,-,×,÷ on integers
  *    (correctly rounded in both engines, evaluated in the spelled
  *    order) except the single `ln` of the idf, whose cross-engine ULP
  *    is absorbed by the round-4 card (the C42 precedent); ranking runs
  *    on the ROUNDED score with rank() and a doc_id tie-break (the C6
  *    convention), so the top-k cut is deterministic cross-engine.
  *
  * BM25 constants: k1 = 1.2, b = 0.75 (the Robertson defaults), Lucene's
  * always-positive idf = ln(1 + (N − df + 0.5)/(df + 0.5)).
  */
object Retrieval {
  private def docs(s: SparkSession, dir: String) = Tables(s, dir, "documents")
  private def emb(s: SparkSession, dir: String) =
    Vectors.withNorm(Tables(s, dir, "embeddings"), "embedding")

  /** Tokenized (doc_id, term) frame, empty pseudo-token dropped (the
    * C42 tfFrame convention: a zero-token doc has no terms, not one ""
    * term). */
  private def tok(s: SparkSession, dir: String): DataFrame =
    // doc-level hash-spread (round-15, the tfFrame rationale): the
    // tokenize+explode otherwise runs inside the single-rowgroup scan
    // task; the per-doc postings groupBy clusters on the same key
    Vectors.ensureParallelismBy(docs(s, dir), col("doc_id"))
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("term"))
      .where(col("term") =!= "")

  /** The fitted retrieval pieces: postings (tf), doc lengths (dl), and
    * the per-item kept-term model with idf attached — shared by the
    * batch ranking and the D25 streaming triage fit. */
  private[graft] def fitted(s: SparkSession, dir: String,
      consumerActions: Int = 1)
      : (DataFrame, DataFrame, DataFrame) = {
    val t = tok(s, dir)
    // postings: one explode + one partial-agg groupBy; dl and df both
    // derive from tf so the corpus tokenizes once (the C20 tf/df shape).
    // The cache is scoped to the CALLER's action count: the inline
    // faces materialize once, but the C97a first build runs THREE
    // artifact saves — releasing after the first would re-tokenize the
    // corpus for the dl and qk saves (the round-10 advice finding)
    val tf = t.where(col("doc_id") >= 5)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    CacheScope.releaseAfterActions(s, consumerActions, tf)
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val scalars = dl.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val qterms = t.where(col("doc_id") < 5)
      .select(col("doc_id").as("item_id"), col("term")).distinct()
    // query side: eval-sized ⋈ vocabulary-sized df, junk-floored and
    // capped to the 8 rarest terms per item — always the broadcast side
    // of the postings join; the window runs on the eval-sized frame
    val qsel = Window.partitionBy(col("item_id"))
      .orderBy(col("df").asc, col("term"))
    val idf = log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val qk = qterms.join(df, Seq("term")).crossJoin(broadcast(scalars))
      .where(col("df") * 10 <= col("n") * 9)
      .withColumn("__r", row_number().over(qsel)).where(col("__r") <= 8)
      .select(col("term"), col("item_id"), col("df"), col("n"), col("avgdl"),
        idf.as("idf"))
    (tf, dl, qk)
  }

  /** The per-item kept-term model (item_id, term, df, n, avgdl, idf) —
    * the frozen stats the streaming triage collapses to literals. */
  private[graft] def queryModel(s: SparkSession, dir: String): DataFrame =
    fitted(s, dir)._3

  /** The serve half: score + rank a (tf, dl, qk-with-idf) triple —
    * shared by the inline face, the hybrid fusion, and the persisted
    * C97a serve face (identical arithmetic tree by construction). */
  private def rankFrom(tf: DataFrame, dl: DataFrame, qk: DataFrame): DataFrame = {
    val tfn = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    val scored = tf.join(broadcast(qk), Seq("term"))
      .join(dl, Seq("doc_id"))
      .groupBy(col("item_id"), col("doc_id"))
      .agg(round(sum(col("idf") * tfn), 4).as("score"))
    val w = Window.partitionBy(col("item_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rnk", rank().over(w))
  }

  /** The scored-and-ranked BM25 top-10 frame (item_id, doc_id, score,
    * rnk) — shared by the C97 face and the C98 hybrid fusion. */
  private[graft] def bm25Ranked(s: SparkSession, dir: String): DataFrame = {
    val (tf, dl, qk) = fitted(s, dir)
    rankFrom(tf, dl, qk).where(col("rnk") <= 10)
  }

  /** C97a: BM25 search against a PERSISTED index — postings, document
    * lengths, and the fitted query model live in the ArtifactStore
    * (self-healing first build), so a serve invocation never
    * re-tokenizes the corpus: the recurring cost is the scoring join +
    * the map-side-limited top-k, the number a lexical-serving
    * deployment actually watches. Result-identical to [[searchBm25]]
    * by contract (same serve half over the same frames), so it carries
    * the SAME DuckDB oracle — the C56a posture. */
  def searchBm25Cached(s: SparkSession, dir: String): DataFrame = {
    if (!ArtifactStore.has(s, dir, "bm25_tf", "bm25_dl", "bm25_qk")) {
      // three saves = three actions over the shared postings cache
      val (tf, dl, qk) = fitted(s, dir, consumerActions = 3)
      ArtifactStore.save(tf, dir, "bm25_tf")
      ArtifactStore.save(dl, dir, "bm25_dl")
      ArtifactStore.save(qk, dir, "bm25_qk")
    }
    rankFrom(
      ArtifactStore.load(s, dir, "bm25_tf"),
      ArtifactStore.load(s, dir, "bm25_dl"),
      ArtifactStore.load(s, dir, "bm25_qk"))
      .where(col("rnk") <= 10)
      .select(col("item_id"), col("rnk"), col("doc_id"), col("score"))
      .orderBy(col("item_id"), col("rnk"), col("doc_id"))
  }

  /** C97: BM25 top-10 corpus documents per benchmark item. */
  def searchBm25(s: SparkSession, dir: String): DataFrame =
    bm25Ranked(s, dir)
      .select(col("item_id"), col("rnk"), col("doc_id"), col("score"))
      .orderBy(col("item_id"), col("rnk"), col("doc_id"))

  /** C103: HARD-NEGATIVE mining — per benchmark item, the BM25 ranks
    * 11–50: lexically similar but non-top documents, the standard
    * negative pool a contrastive-embedding training pipeline exports
    * (DPR/SBERT-style "BM25 hard negatives": random negatives are too
    * easy, the top-k are presumed positives, the band between is where
    * the training signal lives). Same machinery and plan as C97 with a
    * deeper map-side-limited rank cut; the band edges ride as
    * parameters. SQL-checked with the same generated arithmetic. */
  def retrievalNegatives(s: SparkSession, dir: String,
      lo: Int = 11, hi: Int = 50): DataFrame = {
    val (tf, dl, qk) = fitted(s, dir)
    rankFrom(tf, dl, qk)
      .where(col("rnk") >= lo && col("rnk") <= hi)
      .select(col("item_id"), col("rnk"), col("doc_id"), col("score"))
      .orderBy(col("item_id"), col("rnk"), col("doc_id"))
  }

  /** The cosine top-10 per item over the embedding corpus (vec_id >= 5),
    * the C6 plan restricted to the benchmark-item queries: broadcast
    * query side, corpus streams through the scored projection, round-4
    * cosine ranked with rank() + vec_id tie-break. */
  private[graft] def cosineRanked(s: SparkSession, dir: String): DataFrame = {
    val v = emb(s, dir)
    val queries = v.where(col("vec_id") < 5)
      .select(col("vec_id").as("item_id"), col("e").as("qe"), col("nrm").as("qn"))
    val cos = Vectors.cosine(col("qe"), col("e"), col("qn"), col("nrm"))
    val scored = v.where(col("vec_id") >= 5).crossJoin(broadcast(queries))
      .select(col("item_id"), col("vec_id").as("doc_id"), round(cos, 4).as("cosine"))
    val w = Window.partitionBy(col("item_id"))
      .orderBy(col("cosine").desc, col("doc_id"))
    scored.withColumn("rnk", rank().over(w)).where(col("rnk") <= 10)
  }

  /** C98: hybrid retrieval — reciprocal-rank fusion (Cormack et al.
    * SIGIR 2009, k = 60) of the BM25 top-10 and the cosine top-10 per
    * item. RRF needs only the RANKS, which the round-before-rank
    * convention makes integer-identical cross-engine, so the fused
    * score 1/(60+r_bm25) + 1/(60+r_cos) is bit-exact IEEE arithmetic —
    * the whole fusion SQL-checks with no new ln anywhere. Docs on only
    * one list keep their one term (the standard RRF treatment of
    * disjoint result lists); both inputs are top-10 frames, so the
    * fusion join is query-set-sized regardless of corpus size. */
  def searchHybrid(s: SparkSession, dir: String): DataFrame = {
    val bm = bm25Ranked(s, dir)
      .select(col("item_id"), col("doc_id"), col("rnk").as("bm25_rnk"))
    val cs = cosineRanked(s, dir)
      .select(col("item_id"), col("doc_id"), col("rnk").as("cos_rnk"))
    val fused = bm.join(cs, Seq("item_id", "doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(60) + col("bm25_rnk")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(60) + col("cos_rnk")), lit(0.0)), 6))
    val w = Window.partitionBy(col("item_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rnk", rank().over(w)).where(col("rnk") <= 10)
      .select(col("item_id"), col("rnk"), col("doc_id"), col("rrf"),
        col("bm25_rnk"), col("cos_rnk"))
      .orderBy(col("item_id"), col("rnk"), col("doc_id"))
  }

  /** Shared oracle CTE chain: the ranked BM25 frame, spelled with the
    * identical arithmetic tree (operand promotion to DOUBLE at the same
    * points — DuckDB would otherwise run the 0.5-offsets in DECIMAL). */
  private val bm25Ctes: String =
    """tok AS (
      |  SELECT doc_id,
      |         unnest(string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ')) AS term
      |  FROM documents),
      |tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
      |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
      |       FROM tok2 WHERE doc_id >= 5 GROUP BY 1, 2),
      |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1),
      |sc AS (SELECT count(*)::BIGINT AS n,
      |              sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
      |dft AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
      |qt AS (SELECT DISTINCT doc_id AS item_id, term FROM tok2 WHERE doc_id < 5),
      |qk0 AS (SELECT qt.term, qt.item_id, dft.df, sc.n, sc.avgdl,
      |               row_number() OVER (PARTITION BY qt.item_id
      |                                  ORDER BY dft.df, qt.term) AS r
      |        FROM qt JOIN dft USING (term), sc WHERE dft.df * 10 <= sc.n * 9),
      |qk AS (SELECT term, item_id, df, n, avgdl FROM qk0 WHERE r <= 8),
      |contrib AS (
      |  SELECT qk.item_id, tf.doc_id,
      |         ln(1.0::DOUBLE + (qk.n - qk.df + 0.5::DOUBLE) / (qk.df + 0.5::DOUBLE)) *
      |         ((tf.tf * 2.2::DOUBLE) /
      |          (tf.tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * dl.dl / qk.avgdl))) AS c
      |  FROM tf JOIN qk USING (term) JOIN dl USING (doc_id)),
      |bms AS (SELECT item_id, doc_id, round(sum(c), 4) AS score
      |        FROM contrib GROUP BY 1, 2),
      |bmr AS (SELECT *, rank() OVER (PARTITION BY item_id
      |                               ORDER BY score DESC, doc_id) AS rnk
      |        FROM bms)""".stripMargin

  val bm25Oracle: String =
    s"""WITH $bm25Ctes
       |SELECT item_id, rnk, doc_id, score FROM bmr WHERE rnk <= 10
       |ORDER BY item_id, rnk, doc_id""".stripMargin

  /** C103 oracle: the same generated chain, rank band 11–50. */
  val negativesOracle: String =
    s"""WITH $bm25Ctes
       |SELECT item_id, rnk, doc_id, score FROM bmr
       |WHERE rnk >= 11 AND rnk <= 50
       |ORDER BY item_id, rnk, doc_id""".stripMargin

  val hybridOracle: String =
    s"""WITH $bm25Ctes,
       |v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
       |      FROM embeddings),
       |nv AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v
       |       WHERE sqrt(list_dot_product(e, e)) > 0),
       |q AS (SELECT vec_id AS item_id, e AS qe, nrm AS qn FROM nv WHERE vec_id < 5),
       |cscored AS (SELECT item_id, vec_id AS doc_id,
       |                   round(list_dot_product(qe, e)/(qn*nrm), 4) AS cosine
       |            FROM q, nv WHERE vec_id >= 5),
       |csr AS (SELECT *, rank() OVER (PARTITION BY item_id
       |                               ORDER BY cosine DESC, doc_id) AS rnk
       |        FROM cscored),
       |bmtop AS (SELECT item_id, doc_id, rnk AS bm25_rnk FROM bmr WHERE rnk <= 10),
       |cstop AS (SELECT item_id, doc_id, rnk AS cos_rnk FROM csr WHERE rnk <= 10),
       |fused AS (
       |  SELECT coalesce(b.item_id, c.item_id) AS item_id,
       |         coalesce(b.doc_id, c.doc_id) AS doc_id,
       |         b.bm25_rnk, c.cos_rnk,
       |         round(coalesce(1.0::DOUBLE / (60 + b.bm25_rnk), 0.0::DOUBLE) +
       |               coalesce(1.0::DOUBLE / (60 + c.cos_rnk), 0.0::DOUBLE), 6) AS rrf
       |  FROM bmtop b FULL OUTER JOIN cstop c
       |    ON b.item_id = c.item_id AND b.doc_id = c.doc_id),
       |fr AS (SELECT *, rank() OVER (PARTITION BY item_id
       |                              ORDER BY rrf DESC, doc_id) AS rnk
       |       FROM fused)
       |SELECT item_id, rnk, doc_id, rrf, bm25_rnk, cos_rnk
       |FROM fr WHERE rnk <= 10
       |ORDER BY item_id, rnk, doc_id""".stripMargin
}
