package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Retrieval, Text}

/** D25: retrieval-scored intake triage — the C97 BM25 face turned to
  * watch the CORPUS side at intake, completing the decontamination
  * intake family (D13 catches verbatim n-gram leaks, D22 paraphrased
  * embedding-space leaks; this ranks arrivals by retrieval RELEVANCE to
  * the benchmark items, the published retrieval-based-decontamination
  * shape, so a near-miss rewrite that dodges exact n-grams but reuses
  * the item's rare vocabulary still surfaces).
  *
  * STATELESS by construction (the D16/D19 posture): the batch fit
  * collapses the standing corpus's statistics — each item's kept query
  * terms with their idf, and the corpus avgdl — to LITERALS at stream
  * construction time (eval-sized by the C97 bound: ≤ 8 terms per item),
  * so scoring an arrival is one narrow codegen'd projection folding
  * over the document's own token array: no explode, no join, no
  * watermark, no state store (`stateOperators` spec-pinned empty). A
  * document's tf for a query term is a higher-order filter count over
  * its own tokens — definitionally the batch postings count. Model
  * refresh is an explicit restart (the versioned-artifact cutover
  * posture D15/D16 document, vs the D11/D14 per-micro-batch re-plan).
  *
  * The per-item scores ride along as an audit array; the headline
  * columns are the argmax item and its score (ties → lowest item_id),
  * and [[gateStream]] QUARANTINES above-cut arrivals (the
  * FAILED_TO_CONVERT routing posture — a retrieval hit is evidence for
  * review, not silent deletion).
  */
object StreamingRetrieval {

  /** One benchmark item's kept query terms with frozen idf. */
  case class ItemTerms(itemId: Long, terms: Seq[(String, Double)])

  /** The frozen retrieval model: per-item kept terms + corpus avgdl. */
  case class Bm25Model(items: Seq[ItemTerms], avgdl: Double)

  /** Batch fit at `dir` — the same junk-floored rarest-8 selection and
    * Lucene idf the C97 face computes (shared code, not a copy). */
  def fit(s: SparkSession, dir: String): Bm25Model = {
    val rows = Retrieval.queryModel(s, dir)
      .select(col("item_id"), col("term"), col("idf"), col("avgdl"))
      .collect()
    require(rows.nonEmpty, "retrieval fit found no scoreable query terms")
    val avgdl = rows.head.getAs[Double]("avgdl")
    val items = rows.groupBy(_.getAs[Long]("item_id")).toSeq
      .sortBy(_._1)
      .map { case (id, rs) =>
        ItemTerms(id, rs.map(r =>
          (r.getAs[String]("term"), r.getAs[Double]("idf"))).toSeq.sortBy(_._1))
      }
    Bm25Model(items, avgdl)
  }

  /** Score every arriving document against every item — stateless.
    * Adds: `scores` (array of (item_id, score) structs, the audit
    * column), `best_item`, `best_score`. The BM25 arithmetic is the
    * batch face's tree with the frozen stats as literals; tf and dl
    * come from the document's own token array. */
  def scoreStream(docs: DataFrame, model: Bm25Model,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    def tfOf(term: String): Column =
      size(filter(col("__ts"), x => x === lit(term)))
    def scoreOf(it: ItemTerms): Column =
      it.terms.map { case (term, idf) =>
        val tf = tfOf(term)
        when(tf > 0,
          lit(idf) * ((tf * lit(k1 + 1.0)) /
            (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / lit(model.avgdl)))))
          .otherwise(lit(0.0))
      }.reduce(_ + _)
    // argmax via struct max on (score, -item_id): ties pick the LOWEST
    // item id (item ids are non-negative, so negation inverts the order).
    // An EMPTY benchmark (first deploy) needs a TYPED empty literal —
    // bare array() is array<null> and fails getField at analysis; the
    // arrivals then carry scores=[] and null best_* (round-12 sweep)
    val scoreArr =
      if (model.items.isEmpty)
        array().cast("array<struct<item_id:bigint,score:double>>")
      else array(model.items.map(it =>
        struct(lit(it.itemId).as("item_id"), scoreOf(it).as("score"))): _*)
    val bestNeg = array_max(transform(col("scores"),
      s => struct(s.getField("score").as("s"), (-s.getField("item_id")).as("ni"))))
    docs
      .withColumn("__ts", filter(Text.tokens(col("text")), t => t =!= ""))
      .withColumn("__dl", size(col("__ts")))
      .withColumn("scores", scoreArr)
      .withColumn("best_item", -bestNeg.getField("ni"))
      .withColumn("best_score", bestNeg.getField("s"))
      .drop("__ts", "__dl")
  }

  /** The quarantine gate: routes arrivals whose best BM25 relevance to
    * any benchmark item clears `cut` to review. */
  def gateStream(docs: DataFrame, model: Bm25Model, cut: Double): DataFrame =
    scoreStream(docs, model)
      // null best_score (empty benchmark) is "nothing to leak": unflagged
      .withColumn("retrieval_flagged",
        coalesce(col("best_score") >= cut, lit(false)))
}
