package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The §2.C operators composed the way a training-data pipeline actually
  * runs them: quality gate → exact dedup → MinHash near-dup removal.
  * Each stage keeps the lowest doc id of its duplicate cluster (stable,
  * deterministic keeper), and each is a bounded-cost plan: narrow
  * quality projection, one hash shuffle, LSH-banded candidate join.
  */
object Pipeline {

  final case class CorpusStats(input: Long, afterQuality: Long,
                               afterExact: Long, afterNearDup: Long)

  /** Minimum quality score (see [[TextQueries.textQuality]] formula). */
  val MinQuality = 0.5

  /** Quality gate: tokens/stopword/length folded score >= `minQ`.
    * NULL text scores 0 and drops — without the explicit guard,
    * Spark's null-SKIPPING `least` would hand a null-stats row
    * maximum credit on two of the three score terms (0.7 total) and
    * pass it; TextEdgeSpec pins the fix. */
  def qualityFilter(docs: DataFrame, textCol: String,
                    minQ: Double = MinQuality): DataFrame =
    docs.withColumn("__st", graft.functions.TokenMarkerStats(col(textCol)))
      .where(Text.qualityScoreFromStats(col("__st")) >= minQ)
      .drop("__st")

  /** Decontamination stage: drop documents sharing ≥ `minHits` distinct
    * bigrams with the benchmark frame (the C23 rule as a pipeline cut —
    * the gate every corpus passes before a training export so eval
    * items can't grade their own training data). The benchmark side is
    * eval-scale and broadcasts; at a 100-benchmark union the C72
    * bloom-gated face is the same gate with a fixed-size prefilter. */
  def dropContaminated(docs: DataFrame, bench: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text",
                       benchTextCol: String = "text",
                       minHits: Int = 3): DataFrame = {
    val bg = bench
      .select(explode(Dedup.shingles(col(benchTextCol), 2)).as("ngram"))
      .distinct()
    val flagged = docs
      .select(col(idCol), explode(Dedup.shingles(col(textCol), 2)).as("ngram"))
      .join(broadcast(bg), Seq("ngram"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
      .where(col("n_hits") >= minHits)
      .select(col(idCol))
    docs.join(flagged, Seq(idCol), "left_anti")
  }

  /** Keep the min-id document of every exact-duplicate cluster. */
  def dropExactDups(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keeper = min(col(idCol))
      .over(Window.partitionBy(Text.contentHash(col(textCol))))
    docs.withColumn("__keeper", keeper)
      .where(col(idCol) === col("__keeper"))
      .drop("__keeper")
  }

  /** Keep the min-id document of every MinHash-LSH near-dup cluster.
    * Candidates come from [[Dedup.minhashCandidates]]; a doc is dropped
    * iff some candidate partner has a smaller id (no transitive-closure
    * chasing — single-link per pair, the standard streaming-friendly
    * approximation). */
  def dropNearDups(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val losers = Dedup.minhashCandidates(docs, idCol, textCol)
      .select(col("doc_b").as(idCol)).distinct()
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** The transitively-correct variant: connected components over the
    * candidate pairs, keep each component's min-id. Pair-greedy
    * [[dropNearDups]] under-deletes on shapes like A~C, B~C with A≁B
    * (it keeps both A and B; the component keeps only A). Costs the
    * iterative label propagation on top of candidate generation —
    * bounded by component diameter (Cluster.scala). */
  def dropNearDupsClustered(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pairs = Dedup.minhashCandidates(docs, idCol, textCol)
      .select(col("doc_a"), col("doc_b"))
    val keepers = Cluster.connectedComponents(docs.select(col(idCol)), pairs, idCol)
      .where(col("id") === col("cluster_id"))
      .select(col("id").as(idCol))
    docs.join(keepers, Seq(idCol), "left_semi")
  }

  /** The C70 posture threaded into the pipeline: clusters like
    * [[dropNearDupsClustered]], but each component keeps its
    * HIGHEST-scoring member under `score` (doc_id tie-break) instead of
    * the min id — the clean original survives, not whichever copy was
    * ingested first. Same plan plus one score projection and a
    * cluster-bounded rank. */
  def dropNearDupsByScore(docs: DataFrame, idCol: String, textCol: String,
                          score: org.apache.spark.sql.Column): DataFrame = {
    val pairs = Dedup.minhashCandidates(docs, idCol, textCol)
      .select(col("doc_a"), col("doc_b"))
    val cc = Cluster.connectedComponents(docs.select(col(idCol)), pairs, idCol)
      .withColumnRenamed("id", idCol)
    val ranked = docs.select(col(idCol), score.as("__q")).join(cc, Seq(idCol))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("cluster_id"))
          .orderBy(col("__q").desc, col(idCol))))
    docs.join(ranked.where(col("__rk") === 1).select(col(idCol)),
      Seq(idCol), "left_semi")
  }

  /** Full cleaning pass; returns (cleaned corpus, per-stage counts).
    * Each stage is persisted so the four stage counts and the returned
    * frame execute every stage ONCE (not re-deriving quality → exact →
    * near-dup per action); intermediates are unpersisted here. With
    * `persistResult` (default) the RETURNED frame stays cached so the
    * caller's materialization is also single-pass — the caller owns
    * unpersisting it; pass false to get a recompute-on-use frame with
    * no cache lifetime to manage. */
  /** The whole pipeline as one call: clean (quality gate → exact dedup →
    * clustered near-dup removal) → apply mixture weights (epoch copies)
    * → deal deterministic train/val/test folds → write partitioned by
    * fold. Returns the per-stage stats plus per-fold row counts. Every
    * stage is the library operator already proven individually; this is
    * the composition a corpus ships through. */
  def exportTrainingData(docs: DataFrame, outPath: String,
                         weights: Map[String, Double],
                         idCol: String = "doc_id", textCol: String = "text",
                         groupCol: String = "source",
                         benchmark: Option[DataFrame] = None,
                         benchTextCol: String = "text"): (CorpusStats, Map[String, Long]) = {
    val (cleaned, stats) = cleanCorpus(docs, idCol, textCol,
      persistResult = true, clusteredNearDup = true)
    // decontamination last: dedup must not resurrect a leaked doc by
    // keeping a contaminated copy of a cluster whose clean copy dropped
    val clean = benchmark.fold(cleaned)(b =>
      dropContaminated(cleaned, b, idCol, textCol, benchTextCol))
    val dealt = Sample.sampleMixture(clean, idCol, groupCol, weights)
      .withColumn("fold", Sample.splitColumn(col(idCol), Sample.DemoCuts, "test"))
    dealt.write.mode("overwrite").partitionBy("fold").parquet(outPath)
    cleaned.unpersist(blocking = false)
    val foldCounts = dealt.sparkSession.read.parquet(outPath)
      .groupBy(col("fold")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (stats, foldCounts)
  }

  def cleanCorpus(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text",
                  persistResult: Boolean = true,
                  clusteredNearDup: Boolean = false): (DataFrame, CorpusStats) = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val q = qualityFilter(docs, textCol).persist(MEMORY_AND_DISK)
    val e = dropExactDups(q, idCol, textCol).persist(MEMORY_AND_DISK)
    val n0 = if (clusteredNearDup) dropNearDupsClustered(e, idCol, textCol)
             else dropNearDups(e, idCol, textCol)
    val n = if (persistResult) n0.persist(MEMORY_AND_DISK) else n0
    val stats = CorpusStats(docs.count(), q.count(), e.count(), n.count())
    q.unpersist(blocking = false)
    e.unpersist(blocking = false)
    (n, stats)
  }
}
