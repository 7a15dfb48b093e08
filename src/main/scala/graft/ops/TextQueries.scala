package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** SparkEntry-facing text-pipeline queries (SURVEY §2.C — C1, C8–C11).
  *
  * All are single-pass narrow projections over `documents` followed by one
  * aggregation — at 100 TB each is a scan→map→partial-agg→final-agg plan
  * with no joins and one small shuffle on the (low-cardinality) group key.
  */
object TextQueries {
  private def docs(s: SparkSession, dir: String) = Tables(s, dir, "documents")

  /** C1: exact dedup — md5 over normalized text, min-doc_id keeper, dup
    * accounting per source. The window over the hash shuffles once on the
    * hash (uniformly distributed — no skew by construction). */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("source"),
      Text.contentHash(col("text")).as("h"))
    val keeper = min(col("doc_id")).over(Window.partitionBy(col("h")))
    d.withColumn("keeper", keeper)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        countDistinct(col("h")).as("uniq_docs"),
        sum(when(col("doc_id") =!= col("keeper"), 1L).otherwise(0L)).as("dup_docs"),
        min(col("h")).as("min_h"),
        max(col("h")).as("max_h"))
      .orderBy(col("source"))
  }

  /** C8: language ID — marker-vocabulary argmax vs the labeled lang
    * column, reported as a confusion matrix. Marker counts come from one
    * native [[graft.functions.TokenMarkerStats]] scan; the argmax cascade
    * mirrors the oracle SQL's CASE (earlier language wins ties). */
  def textLangid(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .select(col("lang"), graft.functions.TokenMarkerStats(col("text")).as("st"))
    val (en, es, de, fr) =
      (col("st.en"), col("st.es"), col("st.de"), col("st.fr"))
    val predicted =
      when(en === 0 && es === 0 && de === 0 && fr === 0, "und")
        .when(en >= es && en >= de && en >= fr, "en")
        .when(es >= de && es >= fr, "es")
        .when(de >= fr, "de")
        .otherwise("fr")
    d.select(col("lang"), predicted.as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted"))
  }

  /** C9: quality scoring — token count, stopword ratio, average token
    * length folded into a [0,1] score; per-source aggregate. */
  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .select(col("source"), graft.functions.TokenMarkerStats(col("text")).as("st"))
    val nTok = col("st.ws_tokens").cast("double")
    val stopRatio = col("st.stop").cast("double") / nTok
    val avgLen = col("st.alpha_len").cast("double") / nTok
    val score = lit(0.4) * least(nTok / 100.0, lit(1.0)) +
      lit(0.3) * least(stopRatio * 10.0, lit(1.0)) +
      lit(0.3) * when(avgLen >= 3.0 && avgLen <= 8.0, 1.0).otherwise(0.0)
    d.select(col("source"), nTok.as("n_tok"), stopRatio.as("stop_ratio"), score.as("q"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        round(avg(col("n_tok")), 4).as("avg_tokens"),
        round(avg(col("stop_ratio")), 4).as("avg_stop_ratio"),
        round(avg(col("q")), 4).as("avg_quality"),
        sum(when(col("q") >= 0.7, 1L).otherwise(0L)).as("n_good"))
      .orderBy(col("source"))
  }

  /** Shared per-doc quality-score projection (the C9 formula; doc_id
    * carried so C70's keeper selection can rank within clusters).
    * NULL text scores 0.0 — Spark's null-skipping `least` would
    * otherwise hand null stats 0.7 (Pipeline.qualityFilter has the
    * same guard; the testdata corpus contains no nulls, so the gates
    * are unaffected — this is the 100 TB crawl defense). */
  private[graft] def qualityScores(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        graft.functions.TokenMarkerStats(col("text")).as("st"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        Text.qualityScoreFromStats(col("st")).as("q"))

  /** C19: per-source quality percentile cutoffs (p25/p50/p90) — the
    * numbers a filtering pipeline actually sets its thresholds from.
    * EXACT face: Spark's sort-based `percentile` buffers each group's
    * values, fine while groups are bounded; the 100 TB path is
    * [[qualityPercentileApprox]] (same shape, bounded-memory sketch —
    * the q8 exact/approx treatment). */
  def qualityPercentile(s: SparkSession, dir: String): DataFrame =
    qualityScores(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        expr("percentile(q, array(0.25D, 0.5D, 0.9D))").as("p"))
      .select(col("source"), col("docs"),
        round(element_at(col("p"), 1), 4).as("q25"),
        round(element_at(col("p"), 2), 4).as("q50"),
        round(element_at(col("p"), 3), 4).as("q90"))
      .orderBy(col("source"))

  /** C19a: the scale face — GK-sketch `percentile_approx` with bounded
    * memory per group regardless of group size. At group sizes under
    * the accuracy parameter the sketch is in its EXACT regime and
    * returns the element at 1-based rank `1 + ceil(p·(n−1))` (measured
    * per source at the gate SF; note this is NOT `quantile_disc`'s
    * floor convention), so the driver gate hash-checks this face
    * against that rank spelled explicitly in SQL; the spec
    * additionally bounds approx-regime divergence from the exact
    * face. */
  def qualityPercentileApprox(s: SparkSession, dir: String): DataFrame =
    qualityScores(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        expr("percentile_approx(q, array(0.25D, 0.5D, 0.9D), 10000)").as("p"))
      .select(col("source"), col("docs"),
        round(element_at(col("p"), 1), 4).as("q25"),
        round(element_at(col("p"), 2), 4).as("q50"),
        round(element_at(col("p"), 3), 4).as("q90"))
      .orderBy(col("source"))

  /** C20: TF-IDF top terms — the per-document salient-term extraction a
    * retrieval/labeling pipeline runs over a corpus. Plan shape at
    * 100 TB: tokens explode narrow; tf is a partial-aggregating groupBy
    * on (doc, term); df a partial-aggregating distinct-count on term
    * (hot stopword terms are exactly the high-df ones, and partial
    * aggregation absorbs them map-side); the corpus size N is an
    * agg-to-scalar broadcast; the final top-3 is a per-doc window over
    * each doc's vocabulary — bounded by document length, never corpus
    * size. */
  def textTfidf(s: SparkSession, dir: String): DataFrame = {
    val tok = docs(s, dir)
      .select(col("doc_id"),
        explode(Text.tokens(col("text"))).as("term"))
    // tf is the postings frame BOTH consumers read (the scored join side
    // and the df roll-up); cache it so the corpus explode+agg runs once —
    // Spark's exchange reuse does not dedupe the two branches (measured:
    // 3 scans without the persist). The cache is scoped to the query's
    // own materialization, not the session (CacheScope drops it after the
    // next action completes).
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    CacheScope.releaseAfterAction(s, tf)
    // df derives FROM tf: its rows are already unique (doc, term) pairs,
    // so counting them per term IS the document frequency
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs(s, dir).agg(count(lit(1)).as("__n"))
    val scored = tf.join(df, Seq("term")).crossJoin(n)
      .withColumn("score",
        col("tf") * (log((col("__n") + 1.0) / (col("df") + 1.0)) + 1.0))
    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rnk", row_number().over(byDoc))
      .where(col("rnk") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("score"), 4).as("score"), col("rnk"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** C21: corpus n-gram frequency table — the primitive behind
    * contamination checks and LM memorization audits. Bigrams come from
    * the same native [[graft.functions.WordShingles]] single-pass
    * expression the dedup path uses (n=2, distinct-per-doc), so
    * occurrences == document frequency here by construction, and the
    * whole query is one explode + one partial-aggregating groupBy with a
    * global top-k. The top-k is two-phase by construction: rank over a
    * single ordered column only after the aggregate has collapsed the
    * corpus to distinct n-grams. */
  def ngramCounts(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), 2)).as("ngram"))
      .groupBy(col("ngram"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .orderBy(col("df").desc, col("ngram"))
      .limit(20)

  /** C23: benchmark decontamination — flag corpus documents that share
    * >= 3 distinct bigrams with a held-out "benchmark" set (here: docs
    * 0–4). The benchmark n-gram set is small by definition, so it
    * BROADCASTS and the corpus side never shuffles for the membership
    * test — the only exchange is the final per-doc hit count. This is
    * the eval-leakage gate every training-data pipeline runs before a
    * corpus ships. */
  def textContamination(s: SparkSession, dir: String): DataFrame = {
    val bg = docs(s, dir)
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), 2)).as("ngram"))
    val bench = bg.where(col("doc_id") < 5).select(col("ngram")).distinct()
    bg.where(col("doc_id") >= 5)
      .join(broadcast(bench), Seq("ngram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
      .where(col("n_hits") >= 3)
      .orderBy(col("doc_id"))
  }

  /** C29: benchmark CONTAINMENT decontamination — for each (corpus doc,
    * benchmark item) pair, the share of the item's distinct n-grams the
    * doc contains. The C23 hit-count gate asks "does this doc touch the
    * benchmark at all"; containment is the published decontamination
    * rule ("drop docs containing ≥X% of an eval item") and needs the
    * per-ITEM normalizer. Plan: one shingle explode, broadcast of the
    * (item, ngram) set (benchmarks are eval-sized — always the small
    * side), per-(doc, item) partial-agg counts, integer basis points
    * (`common*10000 div item_size` — exact BIGINT; a rounded rational
    * like n/32 lands exactly on a .5 digit and diverges across
    * engines). */
  def textContainment(s: SparkSession, dir: String): DataFrame = {
    val sh = docs(s, dir)
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), 2)).as("ngram"))
    val bench = sh.where(col("doc_id") < 5)
      .select(col("doc_id").as("item_id"), col("ngram"))
    val itemSize = bench.groupBy(col("item_id")).agg(count(lit(1)).as("item_size"))
    sh.where(col("doc_id") >= 5)
      .join(broadcast(bench), Seq("ngram"))
      .groupBy(col("doc_id"), col("item_id"))
      .agg(count(lit(1)).as("common"))
      .join(broadcast(itemSize), Seq("item_id"))
      .withColumn("containment_bp", expr("common * 10000 div item_size"))
      .where(col("containment_bp") >= 1000)
      .select(col("doc_id"), col("item_id"), col("common"), col("item_size"),
        col("containment_bp"))
      .orderBy(col("doc_id"), col("item_id"))
  }

  /** C80: per-benchmark-ITEM leakage report — the transpose of the C23
    * doc-side gate, and the report an eval owner actually reads: for
    * every benchmark item, how badly did it leak into the training
    * corpus, and which document is the worst offender. C23/C29 answer
    * "which corpus docs to drop"; this answers "which eval items are
    * no longer trustworthy" — the decision is made per ITEM (retire or
    * re-draw the item) and needs the per-item rollup, not the doc
    * list.
    *
    * Per item: distinct-bigram size, docs sharing ≥3 grams (the C23
    * rule, per item), docs at ≥1000 bp containment (the C29 rule), the
    * maxima, and the argmax document (ties to the lowest doc_id).
    * Plan: the C29 broadcast join + per-(doc, item) partial-agg counts,
    * then ONE more per-item rollup — item count is eval-sized, so the
    * rollup is trivially bounded. SQL-checked. */
  def contaminationItems(s: SparkSession, dir: String): DataFrame = {
    val sh = docs(s, dir)
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), 2)).as("ngram"))
    val bench = sh.where(col("doc_id") < 5)
      .select(col("doc_id").as("item_id"), col("ngram"))
    val itemSize = bench.groupBy(col("item_id")).agg(count(lit(1)).as("item_size"))
    val hits = sh.where(col("doc_id") >= 5)
      .join(broadcast(bench), Seq("ngram"))
      .groupBy(col("doc_id"), col("item_id"))
      .agg(count(lit(1)).as("common"))
      .join(broadcast(itemSize), Seq("item_id"))
      .withColumn("cbp", expr("common * 10000 div item_size"))
    val byItem = Window.partitionBy(col("item_id"))
      .orderBy(col("cbp").desc, col("doc_id"))
    val perItem = hits
      .withColumn("rk", row_number().over(byItem))
      .groupBy(col("item_id"))
      .agg(count(when(col("common") >= 3, lit(1))).as("n_docs_hit"),
        count(when(col("cbp") >= 1000, lit(1))).as("n_docs_1000bp"),
        max(col("common")).as("max_common"),
        max(col("cbp")).as("max_containment_bp"),
        max(when(col("rk") === 1, col("doc_id"))).as("worst_doc"))
    itemSize.join(perItem, Seq("item_id"), "left")
      .select(col("item_id"), col("item_size"),
        coalesce(col("n_docs_hit"), lit(0L)).as("n_docs_hit"),
        coalesce(col("n_docs_1000bp"), lit(0L)).as("n_docs_1000bp"),
        col("max_common"), col("max_containment_bp"), col("worst_doc"))
      .orderBy(col("item_id"))
  }

  /** C10: token counting — whitespace tokens and BPE-ish regex pieces. */
  def textTokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("lang"), graft.functions.TokenMarkerStats(col("text")).as("st"))
      .select(col("lang"), col("st.ws_tokens").as("ws"), col("st.re_tokens").as("re_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(col("ws")).as("ws_tokens"),
        sum(col("re_tok")).as("re_tokens"),
        round(avg(col("ws")), 4).as("avg_ws"),
        max(col("re_tok")).as("max_re"))
      .orderBy(col("lang"))

  /** C26: repetition/diversity profile — the Gopher-style quality rules
    * (distinct-token ratio, top-token share) a pretraining pipeline
    * filters on before dedup even starts: heavily repetitive documents
    * (boilerplate, keyword stuffing, degenerate generations) carry low
    * distinct ratios and a dominant top token. Plan shape at 100 TB:
    * one token explode, a partial-aggregating (doc, term) count, a
    * per-doc roll-up on the SAME doc key (no second shuffle class), and
    * a tiny per-source profile — every stage map-side combines, and no
    * task ever holds more than one document's vocabulary. */
  def textRepetition(s: SparkSession, dir: String): DataFrame = {
    val tc = docs(s, dir)
      .select(col("doc_id"), col("source"),
        explode(Text.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("source"), col("term"))
      .agg(count(lit(1)).as("n"))
    val perDoc = tc.groupBy(col("doc_id"), col("source"))
      .agg(sum(col("n")).as("total"), count(lit(1)).as("uniq"),
        max(col("n")).as("top"))
      .select(col("source"),
        (col("uniq").cast("double") / col("total")).as("distinct_ratio"),
        (col("top").cast("double") / col("total")).as("top_share"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        round(avg(col("distinct_ratio")), 4).as("avg_distinct_ratio"),
        round(avg(col("top_share")), 4).as("avg_top_share"),
        sum(when(col("distinct_ratio") < 0.5, 1L).otherwise(0L)).as("n_repetitive"))
      .orderBy(col("source"))
  }

  /** C27: PII-style redaction — email and phone patterns replaced by
    * typed placeholders, with per-source audit counts and an md5 over
    * the redacted text proving both engines produced byte-identical
    * output. The corpus is synthetic (no real contact strings), so the
    * query first PLANTS deterministic ones derived from doc_id; the
    * operator under test is the redaction itself — two narrow
    * codegen'd regexp projections (emails first, then phones over the
    * already-redacted text so a digit-bearing address never
    * double-counts), which is the whole plan at 100 TB: no shuffle
    * until the per-source audit roll-up. */
  def textRedact(s: SparkSession, dir: String): DataFrame = {
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
    val planted = docs(s, dir).select(col("doc_id"), col("source"),
      concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com or +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("t"))
    planted
      .withColumn("n_email", regexp_count(col("t"), lit(emailRe)))
      .withColumn("r1", regexp_replace(col("t"), emailRe, "<EMAIL>"))
      .withColumn("n_phone", regexp_count(col("r1"), lit(phoneRe)))
      .withColumn("redacted", regexp_replace(col("r1"), phoneRe, "<PHONE>"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(col("n_email")).as("emails_redacted"),
        sum(col("n_phone")).as("phones_redacted"),
        min(md5(col("redacted"))).as("sample_hash"))
      .orderBy(col("source"))
  }

  /** C101: explicit-WORDLIST gate — the list-based filter every
    * production pipeline runs beside the statistical batteries (C4's
    * "bad word" page drops, RefinedWeb's NSFW URL/word lists): flag
    * documents whose blocklisted-token SHARE clears a cut
    * (fraction-based, the published rule — an absolute count would
    * auto-flag every long document). Distinct from C9/C46 (statistical
    * quality) and C27 (redaction rewrites content; this GATES documents
    * wholesale). Plan: one token explode → per-doc conditional
    * partial-agg (hits via a membership test against the tiny literal
    * list — no join), per-source rollup; pure integer arithmetic
    * (`hits·10⁴ ≥ total·cut_bp`), SQL-checked. Absent-from-corpus list
    * entries cost nothing and flag nothing (spec-pinned). */
  def textBlocklist(s: SparkSession, dir: String,
      blocklist: Seq[String] = DefaultBlocklist, cutBp: Int = 600): DataFrame = {
    val tok = docs(s, dir)
      .select(col("doc_id"), col("source"),
        explode(Text.tokens(col("text"))).as("term"))
      .where(col("term") =!= "")
    val perDoc = tok.groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("total"),
        sum(when(col("term").isin(blocklist: _*), 1L).otherwise(0L)).as("hits"))
    // row-keeping degenerate posture: a token-less (empty/whitespace)
    // document has no terms to flag but still IS a document of its
    // source — left-join the stats back so the `docs` denominator
    // counts it, unflagged (total=0 short-circuits the flag; the share
    // denominators take the saturating floor)
    val allDocs = docs(s, dir).select(col("doc_id"), col("source"))
    allDocs.join(perDoc, Seq("doc_id", "source"), "left")
      .select(col("source"),
        coalesce(col("total"), lit(0L)).as("total"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(col("hits")).as("block_tokens"),
        sum(col("total")).as("total_tokens"),
        sum(when(col("total") > 0 && col("hits") * 10000 >= col("total") * cutBp, 1L)
          .otherwise(0L)).as("flagged_docs"))
      .withColumn("flagged_bp", expr("flagged_docs * 10000 div docs"))
      .withColumn("block_share_bp",
        expr("block_tokens * 10000 div greatest(total_tokens, 1)"))
      .orderBy(col("source"))
  }

  /** The demo blocklist: one term that exists in the synthetic corpus
    * and two that don't (robustness: absent entries are free). */
  private[graft] val DefaultBlocklist: Seq[String] = Seq("slow", "drop", "error")

  /** C101 oracle: same explode, membership, integer share arithmetic. */
  val blocklistOracle: String =
    """WITH tok AS (
      |  SELECT doc_id, source,
      |         unnest(string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ')) AS term
      |  FROM documents),
      |t2 AS (SELECT doc_id, source, term FROM tok WHERE term <> ''),
      |pd AS (
      |  SELECT doc_id, source, count(*)::BIGINT AS total,
      |         sum(CASE WHEN term IN ('slow','drop','error')
      |                  THEN 1 ELSE 0 END)::BIGINT AS hits
      |  FROM t2 GROUP BY 1, 2),
      |d AS (
      |  SELECT a.source, coalesce(pd.total, 0)::BIGINT AS total,
      |         coalesce(pd.hits, 0)::BIGINT AS hits
      |  FROM documents a LEFT JOIN pd
      |    ON a.doc_id = pd.doc_id AND a.source = pd.source)
      |SELECT source, count(*)::BIGINT AS docs,
      |       sum(hits)::BIGINT AS block_tokens,
      |       sum(total)::BIGINT AS total_tokens,
      |       sum(CASE WHEN total > 0 AND hits * 10000 >= total * 600
      |                THEN 1 ELSE 0 END)::BIGINT AS flagged_docs,
      |       (sum(CASE WHEN total > 0 AND hits * 10000 >= total * 600
      |                 THEN 1 ELSE 0 END)::BIGINT
      |        * 10000) // count(*) AS flagged_bp,
      |       (sum(hits)::BIGINT * 10000)
      |         // greatest(sum(total)::BIGINT, 1) AS block_share_bp
      |FROM d GROUP BY source ORDER BY source""".stripMargin

  /** Shared C30/C31 chunk frame: one row per sliding token window.
    *
    * Chunk rule: windows of `width` tokens starting at every `stride`
    * offset that begins inside the document (starts 0, S, 2S, … < n) —
    * fully covering, deterministic, and expressible identically in both
    * engines (`sequence`/`generate_series` + array slice). Tail windows
    * shorten to the remaining tokens. The whole thing is a narrow
    * projection + generator over one scan — no shuffle, so at 100 TB it
    * is pure map work; only the consumer's aggregation exchanges data. */
  private[ops] def chunkFrame(s: SparkSession, dir: String,
                              width: Int, stride: Int): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("source"),
      Text.tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
    d.select(col("doc_id"), col("source"), col("n"), col("toks"),
        posexplode(sequence(lit(0), greatest(col("n") - 1, lit(0)), lit(stride)))
          .as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("source"), col("chunk_idx"),
        least(lit(width), col("n") - col("start")).as("chunk_tokens"),
        md5(array_join(slice(col("toks"), col("start") + 1, lit(width)), " "))
          .as("chunk_hash"))
  }

  /** C30: sliding-window chunking — the context-window preparation step
    * of a training pipeline (split each document into width-32 token
    * windows at stride 24, 8-token overlap). Emits one row per chunk
    * with its token count and content hash. */
  def textChunk(s: SparkSession, dir: String): DataFrame =
    chunkFrame(s, dir, width = 32, stride = 24)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_tokens"),
        col("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** C31: chunk-level exact dedup (the paragraph-dedup of CCNet /
    * RefinedWeb, over C30's windows): a chunk is a duplicate when the
    * same token window appears earlier in the corpus (position order —
    * `doc_id * 2^20 + chunk_idx`; chunk counts are bounded far below
    * 2^20 by document length). Like [[dedupExact]] the only exchange is
    * one window shuffle on the (uniform) hash, then the per-source
    * roll-up; duplicate share is reported in integer basis points (an
    * exact BIGINT — a rounded rational diverges across engines). */
  def dedupChunk(s: SparkSession, dir: String): DataFrame = {
    val posKey = (col("doc_id") * lit(1048576L)) + col("chunk_idx")
    val keeper = min(posKey).over(Window.partitionBy(col("chunk_hash")))
    chunkFrame(s, dir, width = 32, stride = 24)
      .withColumn("pos_key", posKey)
      .withColumn("keeper", keeper)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("pos_key") =!= col("keeper"), 1L).otherwise(0L))
          .as("dup_chunks"))
      .withColumn("dup_bp", expr("dup_chunks * 10000 div n_chunks"))
      .orderBy(col("source"))
  }

  /** C82: chunk-granularity ORIGIN attribution — C78's who-copies-whom
    * flow matrix re-expressed at the C30/C31 training-window
    * granularity. The span card (C78) attributes maximal duplicated
    * substrings; THIS card attributes the width-32/stride-24 windows a
    * packing pipeline actually emits, so its `adopted_chunks` is the
    * number of training windows the C31 keeper rule would drop,
    * partitioned by where their content first appeared. Origin = the
    * minimum `pos_key` occurrence of a chunk content — deliberately the
    * SAME rule C31 uses to pick the kept window, so "the original"
    * names the same window in the dedup share and the attribution card
    * (ChunkOriginSpec pins the mass-conservation invariant:
    * Σ adopted_chunks over this card = Σ dup_chunks over C31's card).
    * The diagonal is within-source recycling.
    *
    * Plan shape: the shared C30/C31 chunk frame (narrow, shuffle-free)
    * then one window shuffle on the uniform `chunk_hash` — identical
    * cost to C31 itself; the attribution join matches each adopted
    * occurrence to its content's one origin row (content-group
    * cardinality, never corpus²) and the roll-up is S² rows at most. */
  def chunkOriginCard(s: SparkSession, dir: String): DataFrame = {
    val posKey = (col("doc_id") * lit(1048576L)) + col("chunk_idx")
    val byContent = Window.partitionBy(col("chunk_hash"))
    val firstCopy = Window.partitionBy(col("chunk_hash")).orderBy(col("pos_key"))
    val marked = chunkFrame(s, dir, width = 32, stride = 24)
      .withColumn("pos_key", posKey)
      .withColumn("copies", count(lit(1)).over(byContent))
      .withColumn("rk", row_number().over(firstCopy))
      .where(col("copies") > 1)
    val origin = marked.where(col("rk") === 1)
      .select(col("chunk_hash"), col("source").as("src_from"))
    marked.where(col("rk") > 1)
      .join(origin, Seq("chunk_hash"))
      .groupBy(col("src_from"), col("source").as("src_to"))
      .agg(countDistinct(col("chunk_hash")).as("n_contents"),
        count(lit(1)).as("adopted_chunks"),
        sum(col("chunk_tokens")).cast("bigint").as("adopted_tokens"))
      .orderBy(col("src_from"), col("src_to"))
  }

  /** C82 oracle: the identical construction in DuckDB over the shared
    * chunk-rule CTE (the dedup_chunk oracle's frame + the C78-style
    * origin window). */
  val chunkOriginOracle: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |         string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ') AS toks
      |  FROM documents),
      |n AS (SELECT doc_id, source, toks, len(toks) AS n FROM d),
      |e AS (SELECT doc_id, source, toks, n,
      |             unnest(generate_series(0, greatest(n-1, 0), 24)) AS start
      |      FROM n),
      |ch AS (SELECT doc_id, source,
      |              doc_id * 1048576 + start // 24 AS pos_key,
      |              least(32, n - start) AS chunk_tokens,
      |              md5(array_to_string(list_slice(toks, start+1, start+32), ' ')) AS chunk_hash
      |       FROM e),
      |m AS (SELECT source, pos_key, chunk_tokens, chunk_hash,
      |             count(*) OVER (PARTITION BY chunk_hash) AS copies,
      |             row_number() OVER (PARTITION BY chunk_hash ORDER BY pos_key) AS rk
      |      FROM ch),
      |dup AS (SELECT * FROM m WHERE copies > 1),
      |org AS (SELECT chunk_hash, source AS src_from FROM dup WHERE rk = 1)
      |SELECT o.src_from, a.source AS src_to,
      |       cast(count(DISTINCT a.chunk_hash) AS BIGINT) AS n_contents,
      |       cast(count(*) AS BIGINT) AS adopted_chunks,
      |       cast(sum(a.chunk_tokens) AS BIGINT) AS adopted_tokens
      |FROM dup a JOIN org o USING (chunk_hash)
      |WHERE a.rk > 1
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** C33: quality-filter funnel — the per-stage survivor report every
    * pretraining pipeline publishes (the C4/RefinedWeb "documents
    * remaining after each rule" table). Stages apply CUMULATIVELY:
    * length (n_chars >= 100) → quality (the C9 score >= 0.5) →
    * diversity (distinct-token ratio >= 0.5, the Gopher repetition
    * rule) → unique (exact-hash first-occurrence keeper).
    *
    * Plan shape at 100 TB: every per-doc flag comes from ONE scan's
    * narrow projection (the distinct-token ratio uses `array_distinct`
    * on the token array — per-row work, never an explode+regroup); the
    * keeper flag is the dedup path's single hash-window shuffle; the
    * funnel itself is one global aggregate whose stage rows are
    * unpivoted from the single result row with `stack` — no windows
    * over the output, no second pass. */
  def qualityFunnel(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("n_chars"),
      graft.functions.TokenMarkerStats(col("text")).as("st"),
      Text.contentHash(col("text")).as("h"),
      size(array_distinct(Text.tokens(col("text")))).as("uniq"))
    val nTok = col("st.ws_tokens").cast("double")
    val stopRatio = col("st.stop").cast("double") / nTok
    val avgLen = col("st.alpha_len").cast("double") / nTok
    val q = lit(0.4) * least(nTok / 100.0, lit(1.0)) +
      lit(0.3) * least(stopRatio * 10.0, lit(1.0)) +
      lit(0.3) * when(avgLen >= 3.0 && avgLen <= 8.0, 1.0).otherwise(0.0)
    d.withColumn("keeper", min(col("doc_id")).over(Window.partitionBy(col("h"))))
      .select(
        when(col("n_chars") >= 100, 1L).otherwise(0L).as("f_len"),
        when(q >= 0.5, 1L).otherwise(0L).as("f_q"),
        when(col("uniq").cast("double") / nTok >= 0.5, 1L).otherwise(0L).as("f_div"),
        when(col("doc_id") === col("keeper"), 1L).otherwise(0L).as("f_uniq"))
      .agg(count(lit(1)).as("total"),
        sum(col("f_len")).as("s1"),
        sum(col("f_len") * col("f_q")).as("s2"),
        sum(col("f_len") * col("f_q") * col("f_div")).as("s3"),
        sum(col("f_len") * col("f_q") * col("f_div") * col("f_uniq")).as("s4"))
      .select(expr(
        "stack(5, '0_all', total, 0L, '1_length', s1, total - s1, " +
          "'2_quality', s2, s1 - s2, '3_diversity', s3, s2 - s3, " +
          "'4_unique', s4, s3 - s4) AS (stage, survivors, dropped)"))
      .orderBy(col("stage"))
  }

  /** C34: corpus dataset card — the (source × lang) inventory a mixture
    * designer reads before setting weights: docs, chars, whitespace
    * tokens, and mean doc length at every rollup level (per cell, per
    * source, grand total). One scan, partial-aggregating ROLLUP (the
    * Expand adds 3 rows per input — map-side combine collapses them
    * before the one shuffle on the tiny (source, lang) key space). */
  def corpusStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("source"), col("lang"), col("n_chars"),
        graft.functions.TokenMarkerStats(col("text")).as("st"))
      .select(col("source"), col("lang"), col("n_chars"),
        col("st.ws_tokens").cast("long").as("ws"))
      .rollup(col("source"), col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(col("n_chars")).as("chars"),
        sum(col("ws")).as("tokens"),
        round(avg(col("ws")), 4).as("avg_tokens"))
      .select(coalesce(col("source"), lit("ALL")).as("source"),
        coalesce(col("lang"), lit("ALL")).as("lang"),
        col("docs"), col("chars"), col("tokens"), col("avg_tokens"))
      .orderBy(col("source"), col("lang"))

  /** C35: normalization audit — the canonicalization pass (lowercase,
    * whitespace collapse, trim — [[Text.normalized]], the exact form
    * the dedup hashes key on) as its own reporting operator. The
    * synthetic corpus is ALREADY canonical (zero docs would change —
    * a vacuous gate), so like [[textRedact]] the query first PLANTS
    * deterministic mess derived from doc_id (leading spaces + uppercase
    * for doc_id%3==0, doubled inter-word spaces for doc_id%3==1, a
    * third left clean) — the operator under test is the normalization
    * itself: per-source docs changed, chars shed, docs RECOVERED to the
    * original canonical form (proving normalize ∘ denormalize =
    * identity), and an md5 witness of byte-identical canonical output.
    * Pure narrow projection + per-source aggregate — no shuffle before
    * the roll-up at any scale. */
  def textNormalize(s: SparkSession, dir: String): DataFrame = {
    val messy = when(col("doc_id") % 3 === 0, concat(lit("  "), upper(col("text"))))
      .when(col("doc_id") % 3 === 1, regexp_replace(col("text"), " ", "  "))
      .otherwise(col("text"))
    docs(s, dir)
      .select(col("source"), col("text"), messy.as("t"))
      .withColumn("norm", Text.normalized(col("t")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(when(col("norm") =!= col("t"), 1L).otherwise(0L)).as("changed"),
        sum((length(col("t")) - length(col("norm"))).cast("long")).as("chars_removed"),
        sum(when(col("norm") === Text.normalized(col("text")), 1L).otherwise(0L))
          .as("recovered"),
        min(md5(col("norm"))).as("sample_hash"))
      .orderBy(col("source"))
  }

  /** C39: per-source token-distribution DRIFT vs the whole corpus — the
    * mixture-health check a pipeline runs when a new source (or a new
    * crawl of an old one) lands: how far does this source's unigram
    * distribution sit from the corpus it joins? Distance is the L1 gap
    * in integer basis points over the corpus's top-30 terms (exact
    * BIGINT arithmetic — a float KL/JS divergence would diverge across
    * engines in the last digit), with each source's top-30 coverage
    * reported beside it.
    *
    * Plan shape at 100 TB: one token explode into a partial-aggregating
    * (source, term) count — map-side combine absorbs hot stopword terms;
    * the cached count frame feeds all three consumers (source totals,
    * corpus roll-up, probe join) so the explode shuffle runs once; the
    * top-30 collapses to a broadcast; and the probe grid is
    * |sources|×30 rows — driver-free, but never bigger than a dim
    * table. */
  def corpusDivergence(s: SparkSession, dir: String): DataFrame = {
    val st = docs(s, dir)
      .select(col("source"), explode(Text.tokens(col("text"))).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    CacheScope.releaseAfterAction(s, st)
    val srcTotals = st.groupBy(col("source")).agg(sum(col("n")).as("src_tokens"))
    val corpus = st.groupBy(col("term")).agg(sum(col("n")).as("cn"))
    val corpusTotal = corpus.agg(sum(col("cn")).as("ct"))
    val top = corpus.orderBy(col("cn").desc, col("term")).limit(30)
      .crossJoin(corpusTotal)
      .select(col("term"), expr("cn * 10000 div ct").as("corpus_bp"))
    srcTotals.crossJoin(broadcast(top))
      .join(st, Seq("source", "term"), "left")
      .withColumn("src_bp", expr("coalesce(n, 0) * 10000 div src_tokens"))
      .groupBy(col("source"), col("src_tokens"))
      .agg(sum(col("src_bp")).as("top_coverage_bp"),
        sum(abs(col("src_bp") - col("corpus_bp"))).as("divergence_bp"))
      .orderBy(col("source"))
  }

  /** C84: intake-batch TEXT drift — the text-side counterpart of the
    * D21 vector-index staleness monitor, and the card an ingest owner
    * reads before promoting a day's batch: per source, how do the
    * arriving documents (the `doc_id % 5 == 4` batch convention C74/C79
    * use) compare against the standing corpus on quality, length, and
    * vocabulary? A feed that silently switched encoding, started
    * truncating, or began emitting a new domain shows up as a quality/
    * length gap or a novel-vocabulary spike BEFORE it pollutes the
    * lake. `q_drift` is the difference of the two (4dp-rounded) means;
    * `novel_bp` = batch-distinct terms unseen in THAT source's standing
    * vocabulary, in integer bp of batch-distinct (a brand-new source
    * reads 10000 — maximally novel, standing columns NULL).
    *
    * Plan shape at 100 TB: the stats leg is ONE scan with conditional
    * partial aggs (no split-join); the vocabulary leg is one token
    * explode → (source, term) partial agg (map-side combine absorbs hot
    * terms, the textRepetition shape) → per-source rollup. SQL-checked. */
  def corpusBatchDrift(s: SparkSession, dir: String): DataFrame = {
    val b = (col("doc_id") % 5) === 4
    val stats = qualityScores(s, dir)
      .withColumn("b", b)
      .groupBy(col("source"))
      .agg(
        count(when(!col("b"), lit(1))).as("standing_docs"),
        count(when(col("b"), lit(1))).as("batch_docs"),
        round(avg(when(!col("b"), col("q"))), 4).as("q_standing"),
        round(avg(when(col("b"), col("q"))), 4).as("q_batch"),
        round(avg(when(!col("b"), col("n_chars"))), 4).as("len_standing"),
        round(avg(when(col("b"), col("n_chars"))), 4).as("len_batch"))
      .withColumn("q_drift", round(col("q_batch") - col("q_standing"), 4))
    val terms = docs(s, dir)
      .select(col("source"), b.as("b"),
        explode(Text.tokens(col("text"))).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(max(when(col("b"), 1).otherwise(0)).as("in_b"),
        max(when(!col("b"), 1).otherwise(0)).as("in_s"))
    val vocab = terms.where(col("in_b") === 1)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("batch_terms"),
        sum(when(col("in_s") === 0, 1L).otherwise(0L)).as("novel_terms"))
      .withColumn("novel_bp", expr("novel_terms * 10000 div batch_terms"))
    stats.join(vocab, Seq("source"), "left")
      .select(col("source"), col("standing_docs"), col("batch_docs"),
        col("q_standing"), col("q_batch"), col("q_drift"),
        col("len_standing"), col("len_batch"),
        coalesce(col("batch_terms"), lit(0L)).as("batch_terms"),
        coalesce(col("novel_terms"), lit(0L)).as("novel_terms"),
        col("novel_bp"))
      .orderBy(col("source"))
  }

  /** C84 oracle: the identical conditional-agg + vocabulary construction
    * (the text_quality q formula with the null-text guard). */
  val corpusBatchDriftOracle: String =
    """WITH d AS (
      |  SELECT doc_id, source, n_chars, text,
      |         doc_id % 5 = 4 AS b,
      |         trim(regexp_replace(lower(text),'\s+',' ','g')) AS norm
      |  FROM documents),
      |m AS (
      |  SELECT source, b, n_chars,
      |    CASE WHEN text IS NULL THEN 0.0 ELSE
      |      0.4*least(cast(len(string_split(norm,' ')) AS DOUBLE)/100.0, 1.0)
      |      + 0.3*least((cast(len(list_filter(string_split(norm,' '),
      |            x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
      |          / cast(len(string_split(norm,' ')) AS DOUBLE))*10.0, 1.0)
      |      + 0.3*(CASE WHEN cast(length(replace(norm,' ','')) AS DOUBLE)
      |                         / cast(len(string_split(norm,' ')) AS DOUBLE)
      |                       BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.0 END)
      |    END AS q
      |  FROM d),
      |st AS (
      |  SELECT source,
      |         cast(count(*) FILTER (NOT b) AS BIGINT) AS standing_docs,
      |         cast(count(*) FILTER (b) AS BIGINT) AS batch_docs,
      |         round(avg(q) FILTER (NOT b), 4) AS q_standing,
      |         round(avg(q) FILTER (b), 4) AS q_batch,
      |         round(avg(n_chars) FILTER (NOT b), 4) AS len_standing,
      |         round(avg(n_chars) FILTER (b), 4) AS len_batch
      |  FROM m GROUP BY source),
      |tk AS (
      |  SELECT source, b, unnest(string_split(norm,' ')) AS term
      |  FROM d WHERE text IS NOT NULL),
      |tm AS (
      |  SELECT source, term,
      |         max(CASE WHEN b THEN 1 ELSE 0 END) AS in_b,
      |         max(CASE WHEN NOT b THEN 1 ELSE 0 END) AS in_s
      |  FROM tk GROUP BY source, term),
      |vc AS (
      |  SELECT source, cast(count(*) AS BIGINT) AS batch_terms,
      |         cast(sum(CASE WHEN in_s = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS novel_terms
      |  FROM tm WHERE in_b = 1 GROUP BY source)
      |SELECT st.source, standing_docs, batch_docs,
      |       q_standing, q_batch,
      |       round(q_batch - q_standing, 4) AS q_drift,
      |       len_standing, len_batch,
      |       cast(coalesce(vc.batch_terms, 0) AS BIGINT) AS batch_terms,
      |       cast(coalesce(vc.novel_terms, 0) AS BIGINT) AS novel_terms,
      |       vc.novel_terms * 10000 // vc.batch_terms AS novel_bp
      |FROM st LEFT JOIN vc ON st.source = vc.source
      |ORDER BY st.source""".stripMargin

  /** C40: vocabulary coverage table — the top-50 corpus terms with each
    * term's share and the cumulative coverage curve (the table a
    * tokenizer designer reads to size a vocabulary: how many tokens do
    * the first N entries cover?). Integer basis points throughout.
    *
    * Plan shape at 100 TB: token explode → partial-aggregating term
    * counts (map-side combine absorbs hot terms) → global top-50 via
    * agg+limit (two-phase TakeOrdered, never a full sort) → the
    * rank/cumsum window runs on the LIMIT'd 50-row frame only — a
    * single-partition window is fine when the input is 50 rows by
    * construction. */
  def textVocab(s: SparkSession, dir: String): DataFrame = {
    val tc = docs(s, dir)
      .select(explode(Text.tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
    val tot = tc.agg(sum(col("n")).as("t"))
    val top = tc.crossJoin(broadcast(tot))
      .orderBy(col("n").desc, col("term")).limit(50)
      .select(col("term"), col("n"), expr("n * 10000 div t").as("share_bp"))
    val w = Window.orderBy(col("n").desc, col("term"))
    top.withColumn("rank", row_number().over(w))
      .withColumn("cum_share_bp", sum(col("share_bp"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("rank"), col("term"), col("n"), col("share_bp"),
        col("cum_share_bp"))
      .orderBy(col("rank"))
  }

  /** C41: document-length histogram per source — the dataset-card length
    * distribution (fixed 100-char buckets, per-source share in integer
    * basis points). One narrow projection + a partial-aggregating
    * groupBy on the tiny (source, bucket) key space; the per-source
    * share window runs on the aggregated frame (≤ a few rows per
    * source), never the corpus. */
  def corpusLengths(s: SparkSession, dir: String): DataFrame = {
    val perSrc = Window.partitionBy(col("source"))
    docs(s, dir).select(col("source"), expr("n_chars div 100").as("bucket"))
      .groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("docs"))
      .withColumn("src_docs", sum(col("docs")).over(perSrc))
      .select(col("source"), col("bucket"),
        (col("bucket") * 100).as("lo_chars"), col("docs"),
        expr("docs * 10000 div src_docs").as("share_bp"))
      .orderBy(col("source"), col("bucket"))
  }

  /** C42: unigram cross-entropy scoring — the CCNet-style perplexity
    * filter shape: score every document against the corpus's own
    * unigram language model (H(doc) = −Σ tf·ln p(term) / Σ tf, p from
    * corpus counts), report the per-source distribution. Low H = made
    * of common words; high H = rare-word-heavy (or noise). The real
    * CCNet filters on a 5-gram KenLM; the unigram face keeps the same
    * pipeline shape — score → per-source distribution → threshold —
    * with the LM swappable.
    *
    * Plan shape at 100 TB: the cached (doc, term, tf) frame feeds both
    * the LM roll-up and the scoring join, so the explode runs once; the
    * LM join is a term equi-join (the LM can be vocabulary-sized —
    * partial aggregation absorbed the hot terms already, and nothing
    * requires it to broadcast); the corpus total is one agg-to-scalar
    * broadcast. The card's round-4 aggregates absorb the ln ULP
    * differences between engines, so this face is hash-checked
    * against a DuckDB re-spelling of the same LM arithmetic;
    * PerplexitySpec additionally recounts driver-side. */
  def textPerplexity(s: SparkSession, dir: String): DataFrame =
    xentPerDoc(s, dir).groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        round(avg(col("xent")), 4).as("avg_xent"),
        round(min(col("xent")), 4).as("min_xent"),
        round(max(col("xent")), 4).as("max_xent"))
      .orderBy(col("source"))

  /** The per-doc term-frequency frame the unigram-LM faces score. */
  private def tfFrame(s: SparkSession, dir: String): DataFrame = {
    // doc-level hash-spread (round-15): tokenize+explode otherwise run
    // inside the single-rowgroup scan task; the per-doc groupBy below
    // clusters on the same key, so no second exchange appears (no-op on
    // already-parallel inputs — the at-scale case)
    val tf = Vectors.ensureParallelismBy(docs(s, dir), col("doc_id"))
      .select(col("doc_id"), col("source"),
        explode(Text.tokens(col("text"))).as("term"))
      // an empty doc splits to one "" pseudo-token; it is not a term —
      // zero-token docs drop out of LM scoring entirely (defined), they
      // don't score against a phantom symbol
      .where(col("term") =!= "")
      .groupBy(col("doc_id"), col("source"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    CacheScope.releaseAfterAction(s, tf)
    tf
  }

  /** Cross-entropy of each doc against an explicit (term, tn) unigram
    * table with total-count frame `tot` — the recurring scoring pass,
    * separable from LM training so the C56a face can run it against
    * persisted tables. */
  private def xentFrom(tf: DataFrame, lm: DataFrame, tot: DataFrame): DataFrame =
    tf.join(lm, Seq("term")).crossJoin(broadcast(tot))
      .groupBy(col("doc_id"), col("source"))
      .agg((-(sum(col("tf") * log(col("tn").cast("double") / col("t"))) /
        sum(col("tf")))).as("xent"))

  /** The shared (doc_id, source, xent) scoring frame behind C42/C56:
    * corpus-self-trained unigram LM. */
  private def xentPerDoc(s: SparkSession, dir: String): DataFrame = {
    val tf = tfFrame(s, dir)
    val lm = tf.groupBy(col("term")).agg(sum(col("tf")).as("tn"))
    val tot = lm.agg(sum(col("tn")).as("t"))
    xentFrom(tf, lm, tot)
  }

  /** C56: CCNet head/middle/tail buckets — the FILTERING step of CCNet
    * (Wenzek et al. 2020) downstream of the C42 scorer: per source,
    * deal documents into perplexity terciles; `head` is the most
    * fluent third a pipeline keeps, `tail` what it drops or LM-filters
    * harder. Done the way it must be done at 100 TB: the tercile CUTS
    * come from a mergeable `percentile_approx` sketch per source
    * (map-side combined — the corpus never shuffles for ranking) and
    * documents bucket by comparing to their source's broadcast cuts —
    * NOT a per-source ntile window, which would sort billions of rows
    * per source partition. Hash-checked: each engine buckets its own
    * xent against its own cuts (a cut IS a data value, so the compare
    * is self-consistent per engine) and the round-4/integer-bp card
    * absorbs ln ULP noise; PerplexitySpec pins tercile sizes, boundary
    * monotonicity, and the partition property. */
  def qualityCcnet(s: SparkSession, dir: String): DataFrame = {
    val per = xentPerDoc(s, dir)
    val cuts = per.groupBy(col("source"))
      .agg(percentile_approx(col("xent"),
        array(lit(1.0 / 3), lit(2.0 / 3)), lit(10000)).as("cuts"))
    ccnetCard(per, cuts)
  }

  /** C56a: C56 against a PERSISTED scorer — the production CCNet shape
    * (the LM and tercile cuts are trained once on a reference slice and
    * shipped; every incoming batch is scored and bucketed against the
    * STORED tables). First invocation persists the unigram LM, its
    * total, and the per-source cuts ([[graft.ops.ArtifactStore]]); warm
    * invocations run only the scoring join + bucket compare.
    * PerplexitySpec pins equality to the inline face. */
  def qualityCcnetCached(s: SparkSession, dir: String): DataFrame = {
    val tf = tfFrame(s, dir)
    if (!ArtifactStore.has(s, dir, "ccnet_lm", "ccnet_n", "ccnet_cuts")) {
      val lm = tf.groupBy(col("term")).agg(sum(col("tf")).as("tn"))
      val tot = lm.agg(sum(col("tn")).as("t"))
      val per = xentFrom(tf, lm, tot)
      ArtifactStore.save(lm, dir, "ccnet_lm")
      ArtifactStore.save(tot, dir, "ccnet_n")
      ArtifactStore.save(per.groupBy(col("source"))
        .agg(percentile_approx(col("xent"),
          array(lit(1.0 / 3), lit(2.0 / 3)), lit(10000)).as("cuts")),
        dir, "ccnet_cuts")
    }
    val s2 = tf.sparkSession
    ccnetCard(
      xentFrom(tf, ArtifactStore.load(s2, dir, "ccnet_lm"),
        ArtifactStore.load(s2, dir, "ccnet_n")),
      ArtifactStore.load(s2, dir, "ccnet_cuts"))
  }

  /** The bucket-and-roll-up tail shared by C56/C56a: deal docs into
    * head/middle/tail by their source's broadcast cuts, report counts,
    * integer-bp shares, and mean xent. */
  private def ccnetCard(per: DataFrame, cuts: DataFrame): DataFrame = {
    // The cuts ARE data values (a doc's own xent). A recomputed xent can
    // drift in its final ulps with cache/join order, which would flip
    // that boundary doc's bucket run-to-run; comparing at 10 dp absorbs
    // ulp drift without changing any real decision.
    val bucketed = per.join(broadcast(cuts), Seq("source"))
      .withColumn("bucket",
        when(round(col("xent"), 10) <= round(element_at(col("cuts"), 1), 10), "head")
          .when(round(col("xent"), 10) <= round(element_at(col("cuts"), 2), 10), "middle")
          .otherwise("tail"))
    bucketed.groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("docs"), round(avg(col("xent")), 4).as("avg_xent"))
      .select(col("source"), col("bucket"), col("docs"),
        expr("docs * 10000 div sum(docs) over (partition by source)").as("share_bp"),
        col("avg_xent"))
      .orderBy(col("source"), col("bucket"))
  }

  /** C65: two-phase CURRICULUM ("annealing") mixture plan — the
    * end-of-training recipe recent open recipes describe (MiniCPM's
    * two-stage schedule, Llama 3's final-phase quality upweighting):
    * a `main` phase trains on every document at natural per-source
    * share, then an `anneal` phase narrows to the highest-quality
    * slice — here the HEAD perplexity tercile per source, C56's own
    * bucketing — and re-shares within what survives. Output is the
    * phase × source plan table a trainer consumes: docs, token mass,
    * and integer-bp share of the phase's tokens.
    *
    * Plan shape: the C42 scoring frame + per-source tercile cuts
    * (mergeable percentile sketch, broadcast — never a rank window
    * over the corpus), a narrow bucket comparison, and two tiny
    * phase×source rollups from ONE pass over the scored frame
    * (phases spelled as an explode over the membership flags, so the
    * corpus is not re-scanned per phase). SQL-checked: every output
    * column is an integer, so despite the ln inside, the DuckDB oracle
    * (which replays the scoring and takes the cut with quantile_disc —
    * probed to share percentile_approx's exact-regime rank convention)
    * hash-matches; MixtureAnnealSpec additionally cross-checks the
    * anneal counts against C56's head bucket and pins share
    * arithmetic. */
  def mixtureAnneal(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir).select(col("doc_id"),
      size(Text.tokens(col("text"))).cast("long").as("tok"))
    val per = xentPerDoc(s, dir).join(toks, Seq("doc_id"))
    val cuts = per.groupBy(col("source"))
      .agg(percentile_approx(col("xent"), lit(1.0 / 3), lit(10000)).as("head_cut"))
    val phased = per.join(broadcast(cuts), Seq("source"))
      .select(col("source"), col("tok"),
        // rounded cut compare for the same ulp-drift reason as ccnetCard
        explode(when(round(col("xent"), 10) <= round(col("head_cut"), 10),
            array(lit("main"), lit("anneal")))
          .otherwise(array(lit("main")))).as("phase"))
    val perPhase = Window.partitionBy(col("phase"))
    phased.groupBy(col("phase"), col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("tok")).as("tokens"))
      .withColumn("phase_tokens", sum(col("tokens")).over(perPhase))
      .select(col("phase"), col("source"), col("docs"), col("tokens"),
        expr("tokens * 10000 div phase_tokens").as("share_bp"))
      .orderBy(col("phase"), col("source"))
  }

  /** C42a: bigram-LM cross-entropy with stupid backoff — the full CCNet
    * shape the unigram face (C42) stubs: a language model TRAINED ON A
    * HELD-IN SLICE (even doc_ids — CCNet trains on Wikipedia, scores
    * Common Crawl; the parity split is the deterministic stand-in)
    * scores EVERY document, so held-out docs genuinely hit unseen
    * bigrams and exercise the backoff path. Stupid backoff (Brants et
    * al., "Large Language Models in Machine Translation", EMNLP 2007 —
    * the scheme built for distributed counting at this scale):
    * S(w2|w1) = c(w1,w2)/c(w1) when the bigram was seen, else
    * α·c(w2)/N, else α²/N for OOV, α = 0.4. All counts come from ONE
    * bigram frame over the training slice: c(w1) = Σ_w2 c(w1,w2)
    * (occurrences as a context), c(w2) = Σ_w1 c(w1,w2) (occurrences
    * as a target), N = Σ c — self-consistent and exactly reproducible
    * driver-side (PerplexitySpec recounts the backoff math).
    *
    * Plan shape at 100 TB: bigrams come straight out of the token
    * array (arrays_zip of the array with its own tail — no positional
    * self-join), one per-doc partial-aggregated tf frame feeds both
    * the LM roll-up and the scoring join; LM joins are equi-joins on
    * term keys (vocabulary²-bounded but corpus-capped — never forced
    * broadcast); the scalar N is the only broadcast. Docs with <2
    * tokens have no bigram and drop out (documented; none at the test
    * SFs). Hash-checked: the round-4 card absorbs ln ULP noise and the
    * whole backoff fold re-spells in DuckDB SQL. backoff_bp
    * (share of scored mass that took a backoff route, in basis
    * points) is integer — the non-vacuity evidence that held-out docs
    * actually backed off. */
  def textPerplexityBigram(s: SparkSession, dir: String): DataFrame = {
    val alpha = 0.4
    val (grams, c12, c1, c2, n) = bigramLm(s, dir)
    val p = col("c12").isNotNull
    val backoff1 = col("c12").isNull && col("c2").isNotNull
    val prob =
      when(p, col("c12").cast("double") / col("c1"))
        .when(backoff1, lit(alpha) * col("c2") / col("n"))
        .otherwise(lit(alpha * alpha) / col("n"))
    val perDoc = grams
      .join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .join(c2, Seq("w2"), "left")
      .crossJoin(broadcast(n))
      .groupBy(col("doc_id"), col("source"))
      .agg((-(sum(col("tf") * log(prob)) / sum(col("tf")))).as("xent"),
        sum(when(p, lit(0L)).otherwise(col("tf"))).as("backed"),
        sum(col("tf")).as("mass"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        round(avg(col("xent")), 4).as("avg_xent"),
        round(min(col("xent")), 4).as("min_xent"),
        round(max(col("xent")), 4).as("max_xent"),
        expr("sum(backed) * 10000 div sum(mass)").as("backoff_bp"))
      .orderBy(col("source"))
  }

  /** Shared C42a/C42b machinery: the persisted per-doc bigram tf frame
    * and the held-in-slice (even doc_ids) LM count frames
    * (c(w1,w2), c(w1), c(w2), N) — see [[textPerplexityBigram]]'s doc
    * for the plan-shape argument. */
  private def bigramLm(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    // doc-level hash-spread (the tfFrame rationale)
    val toks = Vectors.ensureParallelismBy(docs(s, dir), col("doc_id"))
      .select(col("doc_id"), col("source"), Text.tokens(col("text")).as("ts"))
    val grams = toks.select(col("doc_id"), col("source"),
        explode(arrays_zip(
          slice(col("ts"), lit(1), greatest(size(col("ts")) - 1, lit(0))),
          slice(col("ts"), lit(2), greatest(size(col("ts")) - 1, lit(0))))).as("g"))
      .select(col("doc_id"), col("source"),
        col("g.0").as("w1"), col("g.1").as("w2"))
      .groupBy(col("doc_id"), col("source"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    CacheScope.releaseAfterAction(s, grams)
    val train = grams.where(col("doc_id") % 2 === 0)
    val c12 = train.groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val c2 = c12.groupBy(col("w2")).agg(sum(col("c12")).as("c2"))
    val n = c12.agg(sum(col("c12")).as("n"))
    (grams, c12, c1, c2, n)
  }

  /** C42b: the C42a bigram LM scored through a KENLM-STYLE QUANTIZED
    * table ([[LmQuant]]: 8-bit equal-frequency codebooks, the
    * `build_binary -q8` shape) — the memory face of LM filtering at
    * 100 TB: the seen-bigram and unigram-backoff log-prob columns each
    * collapse to one byte per entry plus a 256-double codebook, an 8×
    * shrink of the table a scoring join must carry, while the OOV
    * constant stays exact (a single value needs no code). Reports, per
    * source, the quantized and full-precision cross-entropies side by
    * side with the absolute drift — the evidence that the 8× smaller
    * table preserves the filtering decision. Rows-only (ln doubles);
    * QuantLmSpec pins the drift bound, codebook size, and that the
    * full-precision column reproduces C42a exactly. */
  def textPerplexityQuantized(s: SparkSession, dir: String): DataFrame = {
    val (grams, c12, c1, c2, n) = bigramLm(s, dir)
    val (seen, uni, oov) = quantTables(c12, c1, c2, n)
    // SQL-checked since round 11: the quantized tables ARE the learned
    // state (their ln-valued log-probs and sketch-cut codebooks are
    // engine-path-dependent) — export them and score from the RE-READ
    // copies, so the DuckDB replay consumes the identical doubles; the
    // scoring join, per-doc xent, and the drift card replay (round-4
    // absorbs sum-order ulp, the C42/C42a posture)
    graft.ops.VectorQueries.exportSide(seen, QlmSeenPath)
    graft.ops.VectorQueries.exportSide(uni, QlmUniPath)
    graft.ops.VectorQueries.exportSide(oov, QlmOovPath)
    scoreQuantized(grams, s.read.parquet(QlmSeenPath),
      s.read.parquet(QlmUniPath), s.read.parquet(QlmOovPath))
  }

  private def qlmSidePath(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_$name.parquet"
  val QlmSeenPath: String = qlmSidePath("qlm_seen")
  val QlmUniPath: String = qlmSidePath("qlm_uni")
  val QlmOovPath: String = qlmSidePath("qlm_oov")
  val QlmcSeenPath: String = qlmSidePath("qlmc_seen")
  val QlmcUniPath: String = qlmSidePath("qlmc_uni")
  val QlmcOovPath: String = qlmSidePath("qlmc_oov")

  /** C42b/C42c oracle: quantized LM tables as data; the gram frame,
    * the scoring coalesce-join, per-doc cross-entropies, and the
    * per-source drift card replayed. */
  private def qlmOracle(seenPath: String, uniPath: String,
      oovPath: String): String =
    s"""WITH d AS (SELECT doc_id, source,
       |    string_split(trim(regexp_replace(lower(text),'\\s+',' ','g')),' ') AS ts
       |  FROM documents),
       |g0 AS (SELECT doc_id, source,
       |    unnest(list_zip(ts[1:len(ts)-1], ts[2:len(ts)])) AS g FROM d),
       |gr AS (SELECT doc_id, source, g[1] AS w1, g[2] AS w2 FROM g0),
       |tfq AS (SELECT doc_id, source, w1, w2, cast(count(*) AS BIGINT) AS tf
       |        FROM gr GROUP BY doc_id, source, w1, w2),
       |seen AS (SELECT w1, w2, lp_s, q_s FROM '$seenPath/*.parquet'),
       |uni AS (SELECT w2, lp_u, q_u FROM '$uniPath/*.parquet'),
       |oov AS (SELECT lp_oov FROM '$oovPath/*.parquet'),
       |sc AS (SELECT f.doc_id, f.source, f.tf,
       |              coalesce(se.q_s, u.q_u, o.lp_oov) AS lpq,
       |              coalesce(se.lp_s, u.lp_u, o.lp_oov) AS lpf
       |       FROM tfq f
       |       LEFT JOIN seen se ON se.w1 = f.w1 AND se.w2 = f.w2
       |       LEFT JOIN uni u ON u.w2 = f.w2
       |       CROSS JOIN oov o),
       |x AS (SELECT doc_id, source,
       |             -(sum(tf * lpq) / sum(tf)) AS xq,
       |             -(sum(tf * lpf) / sum(tf)) AS xf
       |      FROM sc GROUP BY doc_id, source)
       |SELECT source, count(*)::BIGINT AS docs,
       |       round(avg(xq), 4) AS avg_xent_q8,
       |       round(avg(xf), 4) AS avg_xent,
       |       round(avg(abs(xq - xf)), 4) AS avg_abs_dev,
       |       round(max(abs(xq - xf)), 4) AS max_abs_dev
       |FROM x GROUP BY source ORDER BY source""".stripMargin

  val textPerplexityQuantizedOracle: String =
    qlmOracle(QlmSeenPath, QlmUniPath, QlmOovPath)
  val textPerplexityQuantizedCachedOracle: String =
    qlmOracle(QlmcSeenPath, QlmcUniPath, QlmcOovPath)

  /** C42c: C42b scored against PERSISTED quantized LM tables — the
    * production shape (train the LM once, ship the 8-bit tables, score
    * every batch against them). First invocation builds + persists the
    * seen/uni/oov tables ([[graft.ops.ArtifactStore]]); warm
    * invocations never execute the count aggregates at all (the table
    * plans stay lazy), so this bench entry measures the recurring
    * scoring join alone. QuantLmSpec pins equality to the inline
    * face. */
  def textPerplexityQuantizedCached(s: SparkSession, dir: String): DataFrame = {
    val (grams, c12, c1, c2, n) = bigramLm(s, dir)
    if (!ArtifactStore.has(s, dir, "qlm_seen", "qlm_uni", "qlm_oov")) {
      val (seen, uni, oov) = quantTables(c12, c1, c2, n)
      ArtifactStore.save(seen, dir, "qlm_seen")
      ArtifactStore.save(uni, dir, "qlm_uni")
      ArtifactStore.save(oov, dir, "qlm_oov")
    }
    val seen = ArtifactStore.load(s, dir, "qlm_seen")
    val uni = ArtifactStore.load(s, dir, "qlm_uni")
    val oov = ArtifactStore.load(s, dir, "qlm_oov")
    // own exported copies of the shipped tables for the DuckDB replay
    graft.ops.VectorQueries.exportSide(seen, QlmcSeenPath)
    graft.ops.VectorQueries.exportSide(uni, QlmcUniPath)
    graft.ops.VectorQueries.exportSide(oov, QlmcOovPath)
    scoreQuantized(grams, seen, uni, oov)
  }

  /** The 8-bit LM tables from the bigram counts: seen-bigram and
    * unigram-backoff log-probs each quantized to a byte + codebook,
    * the OOV constant exact. */
  private def quantTables(c12: DataFrame, c1: DataFrame, c2: DataFrame,
      n: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val alpha = 0.4
    val seen = LmQuant.quantize(
        c12.join(c1, Seq("w1"))
          .select(col("w1"), col("w2"),
            log(col("c12").cast("double") / col("c1")).as("lp")),
        "lp", bits = 8)
      .select(col("w1"), col("w2"), col("lp").as("lp_s"), col("q").as("q_s"))
    val uni = LmQuant.quantize(
        c2.crossJoin(broadcast(n))
          .select(col("w2"), log(lit(alpha) * col("c2") / col("n")).as("lp")),
        "lp", bits = 8)
      .select(col("w2"), col("lp").as("lp_u"), col("q").as("q_u"))
    val oov = n.select(log(lit(alpha * alpha) / col("n")).as("lp_oov"))
    (seen, uni, oov)
  }

  /** The recurring scoring pass: per-doc quantized + full cross-entropy
    * from the LM tables, rolled up per source. */
  private def scoreQuantized(grams: DataFrame, seen: DataFrame, uni: DataFrame,
      oov: DataFrame): DataFrame = {
    val lpFull = coalesce(col("lp_s"), col("lp_u"), col("lp_oov"))
    val lpQ = coalesce(col("q_s"), col("q_u"), col("lp_oov"))
    val perDoc = grams
      .join(seen, Seq("w1", "w2"), "left")
      .join(uni, Seq("w2"), "left")
      .crossJoin(broadcast(oov))
      .groupBy(col("doc_id"), col("source"))
      .agg((-(sum(col("tf") * lpQ) / sum(col("tf")))).as("xq"),
        (-(sum(col("tf") * lpFull) / sum(col("tf")))).as("xf"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        round(avg(col("xq")), 4).as("avg_xent_q8"),
        round(avg(col("xf")), 4).as("avg_xent"),
        round(avg(abs(col("xq") - col("xf"))), 4).as("avg_abs_dev"),
        round(max(abs(col("xq") - col("xf"))), 4).as("max_abs_dev"))
      .orderBy(col("source"))
  }

  /** C45: duplicated-span detection — the span-level dedup signal from
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better" (ACL 2022): find text RANGES that recur across the corpus
    * (boilerplate, templates, quoted chunks), not just whole-document
    * dups. Their suffix array is replaced by the standard distributed
    * approximation: hash every L-token window (L=8), keep windows whose
    * hash recurs anywhere in the corpus, and merge ADJACENT duplicated
    * window positions per doc into maximal spans (gaps-and-islands:
    * pos − row_number is constant within a run of consecutive
    * positions). Every duplicated span of ≥L tokens is caught and its
    * full token mass reported as the islands' interval union.
    *
    * Plan shape at 100 TB: one narrow gram projection (transform over
    * the token array — the doc never self-joins), ONE shuffle on the
    * uniform gram hash for the recurrence count, one per-doc window for
    * the island merge, then a tiny per-source roll-up. All-integer
    * output (span counts, token mass, share in basis points) — exact
    * cross-engine, SQL-checked. */
  def textDupSpans(s: SparkSession, dir: String): DataFrame = {
    val L = 8
    val toks = docs(s, dir)
      .select(col("doc_id"), col("source"), Text.tokens(col("text")).as("ts"))
    val tot = toks.groupBy(col("source"))
      .agg(sum(size(col("ts"))).as("total_tokens"))
    val grams = toks.where(size(col("ts")) >= L)
      .select(col("doc_id"), col("source"),
        posexplode(transform(sequence(lit(1), size(col("ts")) - (L - 1)),
          i => md5(concat_ws(" ", slice(col("ts"), i, lit(L)))))).as(Seq("p0", "h")))
      .select(col("doc_id"), col("source"), (col("p0") + 1).as("pos"), col("h"))
    val dup = grams
      .withColumn("c", count(lit(1)).over(Window.partitionBy(col("h"))))
      .where(col("c") > 1)
    val spans = dup
      .withColumn("grp", col("pos") -
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .groupBy(col("doc_id"), col("source"), col("grp"))
      .agg(min(col("pos")).as("s"), max(col("pos")).as("e"))
    val perSrc = spans.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("dwd"),
        count(lit(1)).as("ds"),
        sum(col("e") - col("s") + L).as("dtm"))
    tot.join(perSrc, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("dwd"), lit(0L)).as("docs_with_dups"),
        coalesce(col("ds"), lit(0L)).as("dup_spans"),
        coalesce(col("dtm"), lit(0L)).as("dup_token_mass"),
        expr("coalesce(dtm, 0L) * 10000 div total_tokens").as("share_bp"))
      .orderBy(col("source"))
  }

  /** C46: Gopher-style rule-based quality filter (Rae et al. 2021,
    * Appendix A shape): a battery of cheap deterministic document
    * rules evaluated in one pass, reported as per-source pass counts
    * per rule plus the all-rules survivor count. Rules (bounds chosen
    * to discriminate on this corpus — each passes some and fails some
    * documents, so no rule is a vacuous gate):
    *   r_len      — whitespace token count in [25, 100000]
    *   r_wordlen  — mean word length in [3, 4.5]; spelled in pure
    *                integer arithmetic (the normalized text has
    *                single spaces, so Σ|token| = chars − n + 1 and
    *                the band is 3n ≤ chars−n+1 ∧ 2(chars−n+1) ≤ 9n —
    *                no double division on a comparison path, §4)
    *   r_stop     — ≥4 stopword occurrences ([[Text.stopwords]])
    *   r_uniq     — unique-token fraction ≥ 45% (20·uniq ≥ 9·n)
    * One narrow projection (the native [[graft.functions.TokenMarkerStats]]
    * scan supplies token and stopword counts) + one tiny per-source
    * aggregate — scan-bound at any corpus size, like the C9 scorer. */
  def qualityGopher(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("source"),
      graft.functions.TokenMarkerStats(col("text")).as("st"),
      length(Text.normalized(col("text"))).cast("long").as("chars"),
      size(array_distinct(Text.tokens(col("text")))).cast("long").as("uniq"))
    val n = col("st.ws_tokens").cast("long")
    val sumLen = col("chars") - n + 1
    val rLen = n >= 25 && n <= 100000
    val rWordlen = lit(3) * n <= sumLen && lit(2) * sumLen <= lit(9) * n
    val rStop = col("st.stop") >= 4
    val rUniq = lit(20) * col("uniq") >= lit(9) * n
    d.select(col("source"),
        rLen.cast("long").as("f_len"), rWordlen.cast("long").as("f_wordlen"),
        rStop.cast("long").as("f_stop"), rUniq.cast("long").as("f_uniq"),
        (rLen && rWordlen && rStop && rUniq).cast("long").as("f_all"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(col("f_len")).as("p_len"),
        sum(col("f_wordlen")).as("p_wordlen"),
        sum(col("f_stop")).as("p_stop"),
        sum(col("f_uniq")).as("p_uniq"),
        sum(col("f_all")).as("p_all"))
      .orderBy(col("source"))
  }

  /** C48: token heavy hitters via sketch-then-rescore — the top-20
    * terms by EXACT count, found without ever aggregating the full
    * vocabulary. The exact spelling ([[textVocab]]) shuffles one row
    * per distinct term — fine while the vocabulary is small, but a
    * web-scale corpus has billions of distinct tokens and the exact
    * top-k becomes a full vocabulary aggregation. Two passes instead:
    * (1) a [[graft.functions.FrequentItems]] Misra–Gries sketch (k=64
    * counters) caps every partial aggregate at 64 counters, so the
    * shuffle carries 64 rows per map task REGARDLESS of vocabulary
    * size and the survivors are a candidate superset of every term
    * with frequency > n/65; (2) the ≤64 candidates broadcast back
    * over the corpus and one semi-joined count aggregate rescores
    * them EXACTLY — the shuffle again carries ≤64 terms per task.
    * The reported top-20 equals the true top-20 whenever the 20th
    * frequency exceeds n/65 (the MG coverage guarantee; the spec
    * checks it on the test corpus), which is precisely the regime a
    * heavy-hitter report is for. Both passes are narrow re-scans —
    * at 100 TB, re-reading the corpus beats caching an exploded
    * token column. Exact counts make this face hash-checkable. */
  def tokenTopkSketch(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(explode(Text.tokens(col("text"))).as("term"))
    val cand = toks
      .agg(graft.functions.FrequentItems(col("term"), 64).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term").as("term"))
    // ≤64 rows post-agg: the unpartitioned rank window is bounded
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("term"))
    toks.join(broadcast(cand), Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= 20)
      .select(col("rank"), col("term"), col("n"))
      .orderBy(col("rank"))
  }

  /** C11: duplicate fingerprint groups — md5 of the sorted distinct token
    * set; emits only groups with >1 member (the reorder-dup clusters). */
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("keeper"),
        max(col("doc_id")).as("max_doc"))
      .where(col("n_docs") > 1)
      .orderBy(col("fp"))

  /** C93: Zipf DECAY card — how fast token frequency falls with rank,
    * measured at rank doublings. A natural corpus follows n(r) ∝ r^−s
    * with s ≈ 1, so n(r)/n(2r) ≈ 2^s ≈ 2; machine-generated or
    * template-spam corpora flatten (ratio → 1) or cliff (ratio ≫ 2),
    * which makes this the one-glance "is this corpus statistically
    * natural language" check next to the C40 vocabulary card. The
    * rank-doubling RATIO is a discrete slope estimate that needs no
    * logarithm — the whole card stays integer-bp, engine-exact
    * (log/pow are not correctly-rounded across libms; ÷ on BIGINTs
    * is). Plan = ONE token-histogram groupBy (the C40 shuffle), a
    * 64-row top-k, and a self-join of the 64-row frame — nothing
    * after the histogram touches the corpus. */
  def corpusZipf(s: SparkSession, dir: String): DataFrame = {
    val tc = docs(s, dir)
      .select(explode(Text.tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("n").desc, col("term"))
    // 64 rows: the unpartitioned rank window is bounded by the limit
    val top = tc.orderBy(col("n").desc, col("term")).limit(64)
      .withColumn("rank", row_number().over(w).cast("int"))
    val doubled = top.select((col("rank") / 2).cast("int").as("rank"),
      col("n").as("n_2r"), col("rank").as("__r2"))
      .where(col("__r2") % 2 === 0).drop("__r2")
    top.join(doubled, Seq("rank"))
      .where(col("rank").isin(1, 2, 4, 8, 16, 32))
      .select(col("rank"), col("term"), col("n"), col("n_2r"),
        expr("(n * 10000) div n_2r").as("ratio_bp"))
      .orderBy(col("rank"))
  }

  /** C93 oracle: identical rank-doubling construction in DuckDB. */
  val corpusZipfOracle: String =
    """WITH tc AS (
      |  SELECT term, count(*) AS n
      |  FROM (SELECT unnest(string_split(trim(regexp_replace(lower(text),
      |          '\s+',' ','g')),' ')) AS term FROM documents)
      |  GROUP BY term),
      |top AS (
      |  SELECT term, cast(n AS BIGINT) AS n,
      |         cast(row_number() OVER (ORDER BY n DESC, term) AS INT) AS rank
      |  FROM tc ORDER BY n DESC, term LIMIT 64)
      |SELECT a.rank, a.term, a.n, b.n AS n_2r,
      |       (a.n * 10000) // b.n AS ratio_bp
      |FROM top a JOIN top b ON b.rank = a.rank * 2
      |WHERE a.rank IN (1, 2, 4, 8, 16, 32)
      |ORDER BY a.rank""".stripMargin

  /** C94: tokenizer ECONOMICS per language — fertility (subword pieces
    * per whitespace word) and bytes-per-piece, the numbers a
    * multilingual token-budget owner reads before converting "N docs
    * per language" into "N training tokens per language" (fertility
    * differences of 2–4× between scripts are why doc-count mixes and
    * token-count mixes disagree; cf. the mT5/XLM-R fertility tables).
    * Uses the same regex-piece counter as C10 (`text_tokens`), so the
    * two cards can never diverge on what a "token" is. All ratios in
    * integer centi/bp units — engine-exact. Plan = one narrow scan
    * with both counters in a single codegen'd projection, partial-agg
    * to L rows. */
  def tokenFertility(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("lang"), col("n_chars"),
      size(Text.tokens(col("text"))).cast("long").as("ws"),
      Text.regexTokenCount(col("text")).cast("long").as("re_tok"))
    d.groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(col("ws")).as("words"),
        sum(col("re_tok")).as("re_tokens"),
        sum(col("n_chars")).as("chars"))
      .select(col("lang"), col("docs"), col("words"), col("re_tokens"),
        col("chars"),
        expr("(re_tokens * 10000) div greatest(words, 1)").as("fertility_bp"),
        expr("(chars * 100) div greatest(re_tokens, 1)").as("chars_per_tok_c"))
      .orderBy(col("lang"))
  }

  /** C94 oracle: identical integer ratios in DuckDB. */
  val tokenFertilityOracle: String =
    """WITH m AS (
      |  SELECT lang, n_chars,
      |    cast(len(string_split(trim(regexp_replace(lower(text),
      |      '\s+',' ','g')),' ')) AS BIGINT) AS ws,
      |    cast(len(regexp_extract_all(trim(regexp_replace(lower(text),
      |      '\s+',' ','g')),'[a-z0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tok
      |  FROM documents)
      |SELECT lang, count(*) AS docs,
      |       cast(sum(ws) AS BIGINT) AS words,
      |       cast(sum(re_tok) AS BIGINT) AS re_tokens,
      |       cast(sum(n_chars) AS BIGINT) AS chars,
      |       (cast(sum(re_tok) AS BIGINT) * 10000)
      |         // greatest(cast(sum(ws) AS BIGINT), 1) AS fertility_bp,
      |       (cast(sum(n_chars) AS BIGINT) * 100)
      |         // greatest(cast(sum(re_tok) AS BIGINT), 1) AS chars_per_tok_c
      |FROM m GROUP BY lang ORDER BY lang""".stripMargin

  /** C95: PREFIX-hash dedup — the CCNet-style cheap first pass: hash
    * only the first 256 normalized characters. Boilerplate families
    * (mirrored pages, templated articles, truncation variants) share
    * prefixes long before they share full bodies, so the prefix pass
    * catches a superset of C1's exact dups at the same single-scan
    * cost — and the per-source EXTRA mass it flags beyond exact is
    * precisely the cheap-pass yield a pipeline owner weighs against
    * the C2/C3 near-dup passes. Keeper = min doc_id per prefix group;
    * since exact-hash groups refine prefix groups, prefix_dups ≥
    * exact_dups per source BY CONSTRUCTION (spec-pinned theorem).
    * Both hashes ride one projection — one corpus scan, one window
    * shuffle on the uniformly-distributed prefix hash. */
  def dedupPrefix(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("source"),
      md5(substring(Text.normalized(col("text")), 1, 256)).as("ph"),
      Text.contentHash(col("text")).as("eh"))
    val pKeep = min(col("doc_id")).over(Window.partitionBy(col("ph")))
    val eKeep = min(col("doc_id")).over(Window.partitionBy(col("eh")))
    d.withColumn("p_keeper", pKeep).withColumn("e_keeper", eKeep)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        countDistinct(col("ph")).as("prefix_groups"),
        sum(when(col("doc_id") =!= col("p_keeper"), 1L).otherwise(0L))
          .as("prefix_dups"),
        sum(when(col("doc_id") =!= col("e_keeper"), 1L).otherwise(0L))
          .as("exact_dups"))
      .withColumn("extra_bp",
        expr("((prefix_dups - exact_dups) * 10000) div greatest(docs, 1)"))
      .orderBy(col("source"))
  }

  /** C95 oracle: identical two-window construction in DuckDB. */
  val dedupPrefixOracle: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    md5(substr(trim(regexp_replace(lower(text),'\s+',' ','g')),1,256)) AS ph,
      |    md5(trim(regexp_replace(lower(text),'\s+',' ','g'))) AS eh
      |  FROM documents),
      |k AS (
      |  SELECT source, doc_id, ph,
      |         min(doc_id) OVER (PARTITION BY ph) AS p_keeper,
      |         min(doc_id) OVER (PARTITION BY eh) AS e_keeper
      |  FROM d)
      |SELECT source, count(*) AS docs,
      |       cast(count(DISTINCT ph) AS BIGINT) AS prefix_groups,
      |       cast(sum(CASE WHEN doc_id <> p_keeper THEN 1 ELSE 0 END) AS BIGINT) AS prefix_dups,
      |       cast(sum(CASE WHEN doc_id <> e_keeper THEN 1 ELSE 0 END) AS BIGINT) AS exact_dups,
      |       ((cast(sum(CASE WHEN doc_id <> p_keeper THEN 1 ELSE 0 END) AS BIGINT)
      |         - cast(sum(CASE WHEN doc_id <> e_keeper THEN 1 ELSE 0 END) AS BIGINT)) * 10000)
      |         // greatest(count(*), 1) AS extra_bp
      |FROM k GROUP BY source ORDER BY source""".stripMargin
}
