package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Deterministic training-data mixture sampling.
  *
  * Composing a training corpus means re-weighting sources: down-sample
  * the over-represented ones, repeat ("epoch") the scarce high-quality
  * ones. Doing that with `rand()` makes every rerun a different corpus
  * and every task retry a correctness bug; the pipeline answer is a
  * CONTENT-KEYED coin — a document is kept (and how many times) as a
  * pure function of its id, so the sample is reproducible row-by-row
  * across reruns, engines, and partitionings.
  *
  * A weight w yields floor(w) guaranteed copies plus one more with
  * probability frac(w), decided by comparing a 24-bit md5 bucket of the
  * id against a precomputed hex threshold — pure string/integer ops that
  * evaluate bit-identically in Spark and DuckDB (SURVEY §4). The whole
  * operator is a narrow projection + generator: no shuffle, no state —
  * it scales embarrassingly.
  */
object Sample {

  /** Zero-padded lowercase 6-hex uniform bucket of `id` in [0, 16^6). */
  def bucketHex(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt + "|"), id.cast("string"))), 1, 6)

  /** Threshold hex for keep-probability `frac` — bucketHex < this keeps. */
  def hexThreshold(frac: Double): String =
    f"${math.floor(frac * (1 << 24)).toLong}%06x"

  /** One output row per sampled COPY: input columns + `copies` (total for
    * the row) + `copy_idx` (1..copies). Rows whose group is absent from
    * `weights` use `defaultWeight`; weight 0 drops the group. */
  def sampleMixture(df: DataFrame, idCol: String, groupCol: String,
                    weights: Map[String, Double], defaultWeight: Double = 1.0,
                    salt: String = "mix"): DataFrame = {
    def copiesFor(w: Double): Column = {
      val base = math.floor(w).toInt
      val frac = w - math.floor(w)
      lit(base) + when(bucketHex(col(idCol), salt) < lit(hexThreshold(frac)), 1)
        .otherwise(0)
    }
    val cascade = weights.toSeq.sortBy(_._1).foldLeft(copiesFor(defaultWeight)) {
      case (acc, (g, w)) => when(col(groupCol) === g, copiesFor(w)).otherwise(acc)
    }
    df.withColumn("copies", cascade)
      .where(col("copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(1), col("copies"))))
  }

  /** The demo mixture: source srcN gets weight 0.3 / 0.9 / 1.5 / 2.1 by
    * N % 4 — two down-sampled tiers, two epoch-repeated tiers. */
  val DemoWeights: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> Seq(0.3, 0.9, 1.5, 2.1)(i % 4)).toMap

  /** Query face (`sample_mixture`): the demo mixture over documents. */
  def sampleMixtureQuery(s: SparkSession, dir: String): DataFrame =
    sampleMixture(Tables(s, dir, "documents"), "doc_id", "source", DemoWeights)
      .select(col("doc_id"), col("source"), col("copies").cast("int"),
        col("copy_idx").cast("int"))
      .orderBy(col("doc_id"), col("copy_idx"))

  /** Stratified EXACT-COUNT sample: the `perGroup` lowest content-coins
    * of every group — "exactly N eval docs per source", reproducible
    * across reruns/engines/partitionings like every sampler here. Plan:
    * one window rank per group over the md5 coin (per-group top-k — the
    * partial WindowGroupLimit keeps each map task's top `perGroup`
    * before the exchange, so the shuffle carries k rows per group per
    * task, not the corpus). Deterministic total order: coin then id. */
  def sampleStratified(df: DataFrame, idCol: String, groupCol: String,
                       perGroup: Int, salt: String = "strat"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(bucketHex(col(idCol), salt), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= perGroup)
      .drop("__rk")
  }

  /** Query face (`sample_stratified`): 20 docs per source. */
  def sampleStratifiedQuery(s: SparkSession, dir: String): DataFrame =
    sampleStratified(Tables(s, dir, "documents"), "doc_id", "source", 20)
      .select(col("doc_id"), col("source"))
      .orderBy(col("source"), col("doc_id"))

  /** C47: per-source document cap (the RefinedWeb-style "per-domain
    * cap" composition rule): at most `cap` documents survive per
    * source, chosen by the lowest content-keyed md5 coins —
    * deterministic under reruns, engines, and repartitioning like
    * every sampler here, and immune to ingestion order (a crawl that
    * happens to deliver one domain first gets no advantage). Same
    * window-rank plan as [[sampleStratified]] (per-group top-k over
    * the coin with the partial WindowGroupLimit), but reported as the
    * before/after audit a mixture designer reads: per-source
    * population, survivors, dropped overflow, surviving token mass
    * and its integer-bp share of the source's tokens. */
  def sampleCapSourceQuery(s: SparkSession, dir: String): DataFrame = {
    val cap = 15
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("source"),
      size(Text.tokens(col("text"))).cast("long").as("tok"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(bucketHex(col("doc_id"), "cap"), col("doc_id"))
    d.withColumn("__rk", row_number().over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(when(col("__rk") <= cap, 1L).otherwise(0L)).as("kept"),
        sum(when(col("__rk") > cap, 1L).otherwise(0L)).as("dropped"),
        sum(when(col("__rk") <= cap, col("tok")).otherwise(0L)).as("kept_tokens"),
        sum(col("tok")).as("__src_tokens"))
      .select(col("source"), col("docs"), col("kept"), col("dropped"),
        col("kept_tokens"),
        expr("(kept_tokens * 10000) div __src_tokens").as("kept_share_bp"))
      .orderBy(col("source"))
  }

  /** C63: DSIR — Data Selection via Importance Resampling (Xie et al.,
    * "Data Selection for Language Models via Importance Resampling",
    * NeurIPS 2023): pick raw documents whose hashed-n-gram distribution
    * looks like a TARGET corpus (their setup: target = Wikipedia, raw =
    * Common Crawl; here the deterministic stand-in is target = the
    * `lang = 'en'` slice, raw = everything). The published recipe,
    * Spark-first:
    *
    *  1. features = unigrams + bigrams hashed into B buckets
    *     (`pmod(xxhash64(gram), B)` — their "hashed n-gram" trick: the
    *     bucket table is CONSTANT-sized no matter the vocabulary);
    *  2. two smoothed bag-of-buckets models from ONE aggregate pass:
    *     p (target) and q (raw), add-one smoothing;
    *  3. per-doc importance log-weight  log w = Σ_b c_b·(ln p_b − ln q_b)
    *     via a BROADCAST join of the per-doc bucket counts against the
    *     B-row log-ratio table;
    *  4. Gumbel top-k — their sampling-without-replacement step — with
    *     the Gumbel noise g = −ln(−ln u) drawn from the repo's
    *     content-keyed md5 coin, so the "random" resample is a pure
    *     function of content: rerun-, engine- and partition-stable.
    *
    * Plan shape at 100 TB: narrow explode → one partial-aggregated
    * shuffle on (doc, bucket) → broadcast ratio join (B rows) → one
    * per-doc aggregate → TakeOrderedAndProject top-k (per-partition
    * heaps; the corpus never globally sorts). Rows-only (ln doubles);
    * DsirSpec recounts the weights and selection driver-side and pins
    * the target-enrichment property. */
  def dsirSelectQuery(s: SparkSession, dir: String): DataFrame = {
    val k = 100
    val u = (conv(bucketHex(col("doc_id"), "dsir"), 16, 10).cast("long") + 1) /
      lit(((1 << 24) + 1).toDouble)
    val gumbel = -log(-log(u))
    dsirScores(Tables(s, dir, "documents"), col("lang") === "en", DsirBuckets)
      .withColumn("__score", col("logw") + gumbel)
      .orderBy(col("__score").desc, col("doc_id")).limit(k)
      .select(col("doc_id"), col("source"), col("lang"),
        round(col("logw"), 4).as("logw"))
      .orderBy(col("doc_id"))
  }

  /** C63's hashed-feature bucket count — shared constant so the batch
    * face, the streaming gate fit, and the specs agree. */
  val DsirBuckets = 1024

  /** Unigrams + bigrams of `text` (the DSIR feature set). */
  def dsirGrams(text: Column): Column = {
    val ts = Text.tokens(text)
    val tail = greatest(size(ts) - 1, lit(0))
    concat(ts, zip_with(slice(ts, lit(1), tail), slice(ts, lit(2), tail),
      (a, b) => concat_ws(" ", a, b)))
  }

  /** The (b, lr) log-ratio table plus totals behind DSIR: smoothed
    * target vs raw bag-of-buckets models from one aggregate pass over
    * the exploded hashed features. Columns: b, t, r, lr (plus tt, rt
    * carried for the smoothing default). */
  def dsirRatioTable(d: DataFrame, isTarget: Column, buckets: Int): DataFrame = {
    val grams = d.select(isTarget.as("is_t"), explode(dsirGrams(col("text"))).as("g"))
      .select(col("is_t"), pmod(xxhash64(col("g")), lit(buckets.toLong)).as("b"))
    val tab = grams.groupBy(col("b"))
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("t"),
        count(lit(1)).as("r"))
    val tots = tab.agg(sum(col("t")).as("tt"), sum(col("r")).as("rt"))
    tab.crossJoin(broadcast(tots))
      .select(col("b"), col("t"), col("r"), col("tt"), col("rt"),
        (log((col("t") + 1).cast("double") / (col("tt") + buckets)) -
          log((col("r") + 1).cast("double") / (col("rt") + buckets))).as("lr"))
  }

  /** Per-doc DSIR importance log-weights over `d` (needs doc_id,
    * source, lang, text): Σ_b c_b·lr_b via a broadcast join of the
    * per-doc bucket counts against the B-row ratio table. */
  def dsirScores(d: DataFrame, isTarget: Column, buckets: Int): DataFrame = {
    val cb = d.select(col("doc_id"), col("source"), col("lang"),
        explode(dsirGrams(col("text"))).as("g"))
      .select(col("doc_id"), col("source"), col("lang"),
        pmod(xxhash64(col("g")), lit(buckets.toLong)).as("b"))
      .groupBy(col("doc_id"), col("source"), col("lang"), col("b"))
      .agg(count(lit(1)).as("c"))
    val ratio = dsirRatioTable(d, isTarget, buckets).select(col("b"), col("lr"))
    cb.join(broadcast(ratio), Seq("b"))
      .groupBy(col("doc_id"), col("source"), col("lang"))
      .agg(sum(col("c") * col("lr")).as("logw"))
  }

  /** C52: weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    * 2006): each document draws the content-keyed uniform coin u and
    * ranks by u^(1/w); the global top-k IS an exact weighted sample
    * without replacement. Weights here are token counts — the
    * length-proportional draw a mixture designer uses when token mass,
    * not document count, is the budget. The coin integer is the SAME
    * md5 hex bucket every sampler uses, so u = (c+1)/2^24 is an exact
    * dyadic both engines compute identically, and the only double step
    * (pow) ranks keys spread ~1/n apart — engine ulp differences can
    * never reorder them. Scale shape: one narrow projection + a
    * TakeOrderedAndProject top-k (per-partition heaps merged on the
    * driver, the distributed E-S merge step) — no shuffle, no window,
    * no global sort. */
  def sampleWeightedQuery(s: SparkSession, dir: String): DataFrame = {
    val k = 100
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("source"),
      size(Text.tokens(col("text"))).cast("long").as("tok"))
    val c = conv(bucketHex(col("doc_id"), "wsample"), 16, 10).cast("long")
    val key = pow((c + 1) / lit((1 << 24).toDouble), lit(1.0) / col("tok"))
    d.withColumn("__key", key)
      .orderBy(col("__key").desc, col("doc_id")).limit(k)
      .select(col("doc_id"), col("source"), col("tok"))
      .orderBy(col("doc_id"))
  }

  /** C52 oracle: the identical E-S ranking in DuckDB (hex coin via the
    * 0x-literal cast; 2^24 divisor keeps u an exact dyadic). */
  val weightedOracle: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    cast(len(string_split(trim(regexp_replace(lower(text),
      |      '\s+',' ','g')),' ')) AS BIGINT) AS tok,
      |    CAST(concat('0x', substr(md5('wsample|'||CAST(doc_id AS VARCHAR)),1,6))
      |         AS BIGINT) AS c
      |  FROM documents),
      |top AS (
      |  SELECT doc_id, source, tok
      |  FROM d ORDER BY pow((c+1)/16777216.0, 1.0/tok) DESC, doc_id LIMIT 100)
      |SELECT doc_id, source, tok FROM top ORDER BY doc_id""".stripMargin

  /** C55: mixture/epoch planner — the reweighting arithmetic a corpus
    * designer runs before composing a training mix (the DoReMi /
    * LLaMA-report table shape): the NATURAL share is each source's
    * share of the TOKEN budget (what the model actually trains on);
    * the TARGET here is the equal-per-document mix (each document
    * contributes equally regardless of verbosity — scale-free, no
    * tuned literals), and factor_bp = target/natural is the sampling
    * knob: > 10000 means epoch-repeat the terse source, < 10000
    * subsample the verbose one — exactly the weight [[sampleColumn]]
    * expects. All integer basis points; the only corpus-sized work is
    * the one map-side-combined per-source rollup (S rows out); shares
    * and factors are windows over the S-sized frame. */
  def mixturePlan(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables(s, dir, "documents")
      .select(col("source"), size(Text.tokens(col("text"))).cast("long").as("tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("tok")).as("tokens"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy() // S-sized frame: safe by construction
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tok
      .withColumn("__tok_total", sum(col("tokens")).over(w))
      .withColumn("__doc_total", sum(col("docs")).over(w))
      .select(col("source"), col("docs"), col("tokens"),
        expr("(tokens * 10000) div __tok_total").as("natural_bp"),
        expr("(docs * 10000) div __doc_total").as("target_bp"),
        // greatest(...,1): a source under 1 bp of the token budget must
        // not divide by zero — its factor saturates instead (both
        // engines spell the identical floor, so parity holds)
        expr("(((docs * 10000) div __doc_total) * 10000)" +
          " div greatest((tokens * 10000) div __tok_total, 1)")
          .as("factor_bp"))
      .orderBy(col("source"))
  }

  /** C55 oracle: the identical integer arithmetic in DuckDB. */
  val mixturePlanOracle: String =
    """WITH tok AS (
      |  SELECT source, count(*) AS docs,
      |    cast(sum(len(string_split(trim(regexp_replace(lower(text),
      |      '\s+',' ','g')),' '))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY 1),
      |tot AS (SELECT cast(sum(tokens) AS BIGINT) AS tok_total,
      |               cast(sum(docs) AS BIGINT) AS doc_total FROM tok)
      |SELECT source, docs, tokens,
      |       (tokens * 10000) // tok_total AS natural_bp,
      |       (docs * 10000) // doc_total AS target_bp,
      |       (((docs * 10000) // doc_total) * 10000)
      |         // greatest((tokens * 10000) // tok_total, 1) AS factor_bp
      |FROM tok, tot ORDER BY source""".stripMargin

  /** Deterministic train/val/test split: the same content-keyed coin,
    * cut at cumulative fractions — every rerun and every engine deals
    * each document to the same fold, and a document can never leak
    * between folds under repartitioning. `cuts` are (label, upTo)
    * cumulative upper bounds in order; the last label takes the rest. */
  def splitColumn(id: Column, cuts: Seq[(String, Double)], lastLabel: String,
                  salt: String = "split"): Column = {
    val b = bucketHex(id, salt)
    cuts.foldRight(lit(lastLabel): Column) { case ((label, upTo), rest) =>
      when(b < lit(hexThreshold(upTo)), label).otherwise(rest)
    }
  }

  /** The demo folds: 80/10/10. */
  val DemoCuts: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.9)

  /** Query face (`sample_split`): fold populations per source. */
  def sampleSplitQuery(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("fold", splitColumn(col("doc_id"), DemoCuts, "test"))
      .groupBy(col("source"), col("fold"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
      .orderBy(col("source"), col("fold"))

  /** Oracle generated from [[DemoCuts]]. */
  val splitOracle: String = {
    val whens = DemoCuts.map { case (label, upTo) =>
      s"WHEN substr(md5('split|'||CAST(doc_id AS VARCHAR)),1,6) < '${hexThreshold(upTo)}' THEN '$label'"
    }.mkString("\n           ")
    s"""SELECT source,
       |  CASE $whens
       |       ELSE 'test' END AS fold,
       |  count(*) AS n_docs, cast(sum(n_chars) AS BIGINT) AS chars
       |FROM documents
       |GROUP BY 1, 2 ORDER BY source, fold""".stripMargin
  }

  /** The [[DemoWeights]] copies expression as oracle SQL (shared by the
    * mixture oracles — generated, so the engines can only agree or fail
    * loudly). */
  private[graft] def copiesCaseSql: String = {
    val cases = DemoWeights.toSeq.sortBy(_._1).map { case (g, w) =>
      val base = math.floor(w).toInt
      val thr = hexThreshold(w - math.floor(w))
      s"""    WHEN source = '$g' THEN $base +
         |      CASE WHEN substr(md5('mix|'||CAST(doc_id AS VARCHAR)),1,6) < '$thr'
         |           THEN 1 ELSE 0 END""".stripMargin
    }.mkString("\n")
    s"CASE\n$cases\n    ELSE 1 END"
  }

  /** Oracle generated from [[DemoWeights]] — same thresholds, same md5
    * bucket. */
  val mixtureOracle: String =
    s"""WITH c AS (
       |  SELECT doc_id, source,
       |    $copiesCaseSql AS copies
       |  FROM documents)
       |SELECT doc_id, source, CAST(copies AS INTEGER) AS copies,
       |       CAST(i AS INTEGER) AS copy_idx
       |FROM c, unnest(generate_series(1, copies)) AS t(i)
       |WHERE copies > 0
       |ORDER BY doc_id, copy_idx""".stripMargin

  /** Temperature re-weighting of mixture proportions — the standard
    * knob for balancing skewed source/language distributions: the
    * sampled share of group i becomes n_i^(1/T) / Σ n_j^(1/T), i.e.
    * T=1 keeps natural proportions, larger T flattens toward uniform,
    * T→0 sharpens toward the biggest group. Returned as per-DOCUMENT
    * copy weights for [[sampleMixture]], scaled so the expected output
    * size equals `budget` documents (budget-neutral re-mix). Group
    * counts are metadata-scale (one row per source). */
  def temperatureWeights(counts: Map[String, Long], temperature: Double,
                         budget: Long): Map[String, Double] = {
    require(temperature > 0, s"temperature must be positive: $temperature")
    require(counts.values.forall(_ > 0), "group counts must be positive")
    val powered = counts.view.mapValues(n => math.pow(n.toDouble, 1.0 / temperature))
    val z = powered.values.sum
    powered.map { case (g, p) => g -> (p / z) * budget / counts(g) }.toMap
  }

  /** DuckDB oracle for [[sampleStratifiedQuery]] — the same md5 coin and
    * per-group rank, spelled portably. */
  val stratifiedOracle: String =
    """WITH r AS (
      |  SELECT doc_id, source,
      |         row_number() OVER (PARTITION BY source
      |           ORDER BY substring(md5('strat|' || cast(doc_id AS VARCHAR)), 1, 6),
      |                    doc_id) AS rk
      |  FROM documents)
      |SELECT doc_id, source FROM r WHERE rk <= 20
      |ORDER BY source, doc_id""".stripMargin

  /** Query face (`mixture_tokens`): the token BUDGET the demo mixture
    * buys per source — the number a mixture designer actually wants.
    * Composition: the mixture's exploded copies × the C10 whitespace
    * token count, summed per source (the explode already multiplies, so
    * `sum(ws)` over copies == `sum(ws × copies)`). */
  def mixtureTokensQuery(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
      .withColumn("ws", graft.functions.TokenMarkerStats(col("text")).getField("ws_tokens"))
    sampleMixture(d, "doc_id", "source", DemoWeights)
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("total_copies"),
        sum(col("ws")).as("tokens"))
      .orderBy(col("source"))
  }

  /** Oracle for `mixture_tokens`, same generated CASE + the C10 token
    * formula. */
  val mixtureTokensOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |         trim(regexp_replace(lower(text),'\\s+',' ','g')) AS norm
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, source, len(string_split(norm,' ')) AS ws,
       |    $copiesCaseSql AS copies
       |  FROM d)
       |SELECT source, count(*) AS n_docs,
       |       cast(sum(copies) AS BIGINT) AS total_copies,
       |       cast(sum(ws * copies) AS BIGINT) AS tokens
       |FROM c WHERE copies > 0
       |GROUP BY source ORDER BY source""".stripMargin

  /** Sequence packing — docs concatenated into fixed token-budget
    * training sequences (C32).
    *
    * Packing is inherently a running sum, and a single global running
    * sum is a one-partition window — a non-starter at 100 TB. The
    * production spelling shards first: documents are dealt to `shards`
    * independent packers by a pure function of their id, each shard
    * packs its docs in id order by exclusive-cumulative token count, and
    * a sequence is `(shard, seq_id)`. Shard count is the parallelism
    * knob — at cluster scale you raise it until each shard's sort fits
    * an executor; every shard is then an independent (narrow-after-
    * shuffle) task, and the one exchange is the shard hash partition.
    *
    * Contiguous-greedy semantics: a document goes to the sequence its
    * exclusive cumsum lands in, so a sequence can overrun the budget by
    * at most its last document (and a document longer than the whole
    * budget becomes its own overfull sequence) — the standard streaming-
    * packer contract. Deterministic and layout-independent: keyed on
    * doc_id only. */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    budget: Long, shards: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("shard", pmod(col(idCol), lit(shards.toLong)))
      .withColumn("cum", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"cum div ${budget}L"))
  }

  /** Query face (`sample_pack`): documents packed into 256-token
    * sequences over 16 shards; one row per sequence with its doc count
    * and token load. */
  def samplePackQuery(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("tok"))
    packSequences(d, "doc_id", "tok", budget = 256L, shards = 16)
      .groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tokens"))
      .orderBy(col("shard"), col("seq_id"))
  }

  /** C66 (`sample_curriculum`): curriculum staging — order the corpus
    * by a difficulty proxy and cut it into quartile stages, the
    * easy→hard schedule curriculum-training pipelines feed from
    * (Bengio et al., "Curriculum Learning", ICML 2009 — stage 1 =
    * shortest words / least lexical diversity first).
    *
    * The proxy stays in INTEGER milli-units (chars-per-token and
    * type-token-ratio via bigint `div` — §4: no double division on a
    * comparison path), so stage boundaries hash identically in every
    * engine; the quartile cutpoints are ONE exact-percentile aggregate
    * broadcast back over the corpus (the A18 no-global-ntile shape —
    * interpolation fractions are exact binary quarters, so the
    * cut-compare is ulp-safe cross-engine). Per stage: docs, token
    * budget, and the difficulty band. */
  def sampleCurriculum(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("doc_id"),
      trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("norm"))
      .select(col("doc_id"), length(col("norm")).cast("long").as("chars"),
        split(col("norm"), " ").as("toks"))
      .select(col("doc_id"), col("chars"),
        size(col("toks")).cast("long").as("ws"),
        size(array_distinct(col("toks"))).cast("long").as("dst"))
      .select(col("doc_id"), col("ws"),
        (expr("chars * 1000 div ws") + expr("dst * 2000 div ws")).as("d_milli"))
    val cuts = d.agg(expr(
      "percentile(d_milli, array(0.25D, 0.5D, 0.75D))").as("cuts"))
    d.crossJoin(broadcast(cuts))
      .select(col("ws"), col("d_milli"),
        (lit(1) + when(col("d_milli") > element_at(col("cuts"), 1), 1).otherwise(0)
          + when(col("d_milli") > element_at(col("cuts"), 2), 1).otherwise(0)
          + when(col("d_milli") > element_at(col("cuts"), 3), 1).otherwise(0))
          .as("stage"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("docs"), sum(col("ws")).as("tokens"),
        min(col("d_milli")).as("d_min"), max(col("d_milli")).as("d_max"))
      .orderBy(col("stage"))
  }

  /** `sample_curriculum` oracle: identical integer proxy + quartile
    * staging in DuckDB. */
  val curriculumOracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |         trim(regexp_replace(lower(text),'\s+',' ','g')) AS norm
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |         cast(length(norm) AS BIGINT) AS chars,
      |         cast(len(string_split(norm,' ')) AS BIGINT) AS ws,
      |         cast(len(list_distinct(string_split(norm,' '))) AS BIGINT) AS dst
      |  FROM d),
      |p AS (
      |  SELECT doc_id, ws, chars * 1000 // ws + dst * 2000 // ws AS d_milli
      |  FROM m),
      |cut AS (
      |  SELECT [quantile_cont(d_milli, 0.25), quantile_cont(d_milli, 0.5),
      |          quantile_cont(d_milli, 0.75)] AS cuts FROM p),
      |st AS (
      |  SELECT ws, d_milli,
      |         1 + (CASE WHEN d_milli > cuts[1] THEN 1 ELSE 0 END)
      |           + (CASE WHEN d_milli > cuts[2] THEN 1 ELSE 0 END)
      |           + (CASE WHEN d_milli > cuts[3] THEN 1 ELSE 0 END) AS stage
      |  FROM p CROSS JOIN cut)
      |SELECT stage, count(*) AS docs, cast(sum(ws) AS BIGINT) AS tokens,
      |       min(d_milli) AS d_min, max(d_milli) AS d_max
      |FROM st GROUP BY stage ORDER BY stage""".stripMargin

  /** `sample_pack` oracle: the same shard deal, exclusive running sum,
    * and budget division in DuckDB's window spelling. */
  val packOracle: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 16 AS shard,
      |         cast(len(string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ')) AS BIGINT) AS tok
      |  FROM documents),
      |c AS (
      |  SELECT shard, tok,
      |         cast(coalesce(sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
      |  FROM d)
      |SELECT shard, cum // 256 AS seq_id,
      |       count(*) AS n_docs, cast(sum(tok) AS BIGINT) AS tokens
      |FROM c GROUP BY shard, seq_id ORDER BY shard, seq_id""".stripMargin

  /** C85: context-length EFFICIENCY sweep — the decision card behind
    * "what max_seq_len do we train at": for each candidate context
    * length L, the exact token economics of the two standard packing
    * policies over this corpus. TRUNCATE policy: docs longer than L
    * lose their tail (`trunc_bp` = lost mass in integer bp of corpus
    * tokens). SPLIT-AND-PAD policy: each doc occupies ceil(tok/L)
    * sequences and the last is padded (`pad_bp` = pad mass in bp of
    * the slot total Σ ceil(tok/L)·L). Short-L trades padding for
    * truncation; the sweep shows the crossover for THIS corpus — the
    * number a mixture owner otherwise guesses. (C32 `sample_pack` is
    * the mechanism that packs; this is the sizing card read first.)
    * All arithmetic is exact BIGINT, so the card is engine-identical.
    *
    * Plan shape at 100 TB: one narrow scan computing tok, exploded
    * against the constant-width L array (a 5× generate, no join, no
    * shuffle until the 5-row final agg). */
  def packEfficiency(s: SparkSession, dir: String,
                     lengths: Seq[Int] = Seq(128, 256, 512, 1024, 2048)): DataFrame = {
    val d = Tables(s, dir, "documents")
      .select(size(Text.tokens(col("text"))).cast("long").as("tok"))
      .select(col("tok"), explode(array(lengths.map(lit): _*)).as("ctx_len"))
    // pure-integer ceil division — no double round-trip to diverge on
    val slots = expr("((tok + ctx_len - 1) div ctx_len) * ctx_len")
    d.select(col("ctx_len"), col("tok"),
        greatest(col("tok") - col("ctx_len"), lit(0L)).as("trunc"),
        slots.as("slots"))
      .groupBy(col("ctx_len"))
      .agg(count(lit(1)).as("docs"),
        sum(col("tok")).as("total_tokens"),
        sum(when(col("trunc") > 0, 1L).otherwise(0L)).as("oversize_docs"),
        sum(col("trunc")).as("trunc_tokens"),
        sum(col("slots")).as("slot_tokens"))
      .withColumn("pad_tokens", col("slot_tokens") - col("total_tokens"))
      .withColumn("trunc_bp", expr("trunc_tokens * 10000 div total_tokens"))
      .withColumn("pad_bp", expr("pad_tokens * 10000 div slot_tokens"))
      .select(col("ctx_len"), col("docs"), col("total_tokens"),
        col("oversize_docs"), col("trunc_tokens"), col("trunc_bp"),
        col("pad_tokens"), col("pad_bp"))
      .orderBy(col("ctx_len"))
  }

  /** C85 oracle: the identical integer construction in DuckDB. */
  val packEfficiencyOracle: String =
    """WITH d AS (
      |  SELECT cast(len(string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ')) AS BIGINT) AS tok
      |  FROM documents),
      |e AS (
      |  SELECT tok, ctx_len
      |  FROM d, unnest([128, 256, 512, 1024, 2048]) u(ctx_len)),
      |m AS (
      |  SELECT ctx_len, tok,
      |         greatest(tok - ctx_len, 0) AS trunc,
      |         ((tok + ctx_len - 1) // ctx_len) * ctx_len AS slots
      |  FROM e)
      |SELECT cast(ctx_len AS INTEGER) AS ctx_len,
      |       count(*) AS docs,
      |       cast(sum(tok) AS BIGINT) AS total_tokens,
      |       cast(sum(CASE WHEN trunc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS oversize_docs,
      |       cast(sum(trunc) AS BIGINT) AS trunc_tokens,
      |       cast(sum(trunc) AS BIGINT) * 10000 // cast(sum(tok) AS BIGINT) AS trunc_bp,
      |       cast(sum(slots) - sum(tok) AS BIGINT) AS pad_tokens,
      |       cast(sum(slots) - sum(tok) AS BIGINT) * 10000
      |         // cast(sum(slots) AS BIGINT) AS pad_bp
      |FROM m GROUP BY ctx_len ORDER BY ctx_len""".stripMargin

  /** C92: TEMPERATURE-scaled source mixture — the multilingual-LM
    * sampling scheme (XLM-R / mT5: p_i ∝ n_i^α, α < 1 flattens the
    * mix so tail sources are not drowned by the head). C55 plans the
    * equal-per-document target; this card shows the whole α ladder a
    * mixture owner actually sweeps — α ∈ {1, 1/2, 1/4} over the TOKEN
    * budget — and the per-α boost factor vs the natural share (the
    * epoch multiplier [[sampleColumn]] would be handed).
    *
    * Engine-exactness: fractional powers are spelled as INTEGER sqrt
    * chains — `w½ = ⌊√tokens⌋`, `w¼ = ⌊√⌊√tokens⌋⌋`. IEEE-754 `sqrt`
    * is correctly rounded (unlike `pow`), and an exact-integer floor
    * of it is therefore bit-identical in Spark and DuckDB, so the
    * whole card stays integer-bp SQL-checkable — no double
    * aggregation order anywhere. Plan = the C55 per-source rollup
    * (map-side combined, S rows out); everything after runs on the
    * S-sized frame. */
  def mixtureTemperature(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables(s, dir, "documents")
      .select(col("source"), size(Text.tokens(col("text"))).cast("long").as("tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("tok")).as("tokens"))
      .withColumn("w_half", floor(sqrt(col("tokens").cast("double"))).cast("long"))
      .withColumn("w_quarter", floor(sqrt(col("w_half").cast("double"))).cast("long"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tok
      .withColumn("__t1", sum(col("tokens")).over(w))
      .withColumn("__t2", sum(col("w_half")).over(w))
      .withColumn("__t4", sum(col("w_quarter")).over(w))
      .select(col("source"), col("docs"), col("tokens"),
        col("w_half"), col("w_quarter"),
        expr("(tokens * 10000) div __t1").as("natural_bp"),
        expr("(w_half * 10000) div __t2").as("t05_bp"),
        expr("(w_quarter * 10000) div __t4").as("t025_bp"),
        // saturating floor exactly as C55: a sub-bp natural share must
        // not divide by zero
        expr("(((w_half * 10000) div __t2) * 10000)" +
          " div greatest((tokens * 10000) div __t1, 1)").as("factor05_bp"),
        expr("(((w_quarter * 10000) div __t4) * 10000)" +
          " div greatest((tokens * 10000) div __t1, 1)").as("factor025_bp"))
      .orderBy(col("source"))
  }

  /** C96: mixture APPLICATION — the end-to-end composition the C55 plan
    * exists for: derive each source's factor (target equal-per-doc share
    * over natural token share, integer bp), deal every document its
    * copies with the content-keyed coin (⌊factor/10⁴⌋ guaranteed plus
    * one more when the 24-bit md5 coin clears the fractional
    * threshold), and report the ACHIEVED mix against the target. The
    * punchline a mixture owner checks: the achieved TOKEN share lands
    * on the equal-per-document target (err_bp column), because weight
    * × tokens ∝ doc share by construction — the card turns the C55
    * arithmetic into a verified outcome, not a plan.
    *
    * Engine-exactness: the fractional coin threshold is INTEGER —
    * `frac_bp · 2²⁴ div 10⁴` compared against the hex coin cast to a
    * long — so unlike [[hexThreshold]]'s double floor there is no
    * float anywhere and the whole composition SQL-checks. Plan: one
    * narrow scan → S-row rollup (the C55 shuffle) → broadcast join of
    * the S-row factor frame back onto the scan → second S-row rollup.
    * No corpus-sized shuffle beyond the two map-side-combined
    * groupBys; the sampler itself is a narrow projection. */
  def mixtureApply(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(Text.tokens(col("text"))).cast("long").as("tok"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val plan = d.groupBy(col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("tok")).as("tokens"))
      .withColumn("__t1", sum(col("tokens")).over(w))
      .withColumn("__d1", sum(col("docs")).over(w))
      .select(col("source"), col("docs"), col("tokens"),
        expr("(docs * 10000) div __d1").as("target_bp"),
        expr("(((docs * 10000) div __d1) * 10000)" +
          " div greatest((tokens * 10000) div __t1, 1)").as("factor_bp"))
    val coin = conv(substring(md5(concat(lit("mixapply|"),
      col("doc_id").cast("string"))), 1, 6), 16, 10).cast("long")
    val sampled = d.join(broadcast(plan), Seq("source"))
      .withColumn("copies", expr("factor_bp div 10000") +
        when(coin < expr("((factor_bp % 10000) * 16777216) div 10000"), 1L)
          .otherwise(0L))
    val achieved = sampled.groupBy(col("source"))
      .agg(sum(col("copies")).as("achieved_docs"),
        sum(col("copies") * col("tok")).as("achieved_tokens"),
        first(col("docs")).as("docs"),
        first(col("tokens")).as("tokens"),
        first(col("target_bp")).as("target_bp"),
        first(col("factor_bp")).as("factor_bp"))
    achieved
      .withColumn("__at", sum(col("achieved_tokens")).over(w))
      .select(col("source"), col("docs"), col("tokens"), col("factor_bp"),
        col("achieved_docs"), col("achieved_tokens"),
        // greatest(..., 1) floor: if every factor is < 10000 and every
        // fractional coin misses, the achieved total is legitimately 0
        // — degrade to 0 bp instead of an ANSI divide-by-zero (the
        // saturating-denominator posture every other card here uses)
        expr("(achieved_tokens * 10000) div greatest(__at, 1)").as("achieved_bp"),
        col("target_bp"),
        expr("(achieved_tokens * 10000) div greatest(__at, 1) - target_bp").as("err_bp"))
      .orderBy(col("source"))
  }

  /** C96 oracle: the identical integer composition in DuckDB. */
  val mixtureApplyOracle: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    cast(len(string_split(trim(regexp_replace(lower(text),
      |      '\s+',' ','g')),' ')) AS BIGINT) AS tok
      |  FROM documents),
      |plan AS (
      |  SELECT source, count(*) AS docs, cast(sum(tok) AS BIGINT) AS tokens
      |  FROM d GROUP BY 1),
      |tot AS (SELECT cast(sum(tokens) AS BIGINT) AS t1,
      |               cast(sum(docs) AS BIGINT) AS d1 FROM plan),
      |f AS (
      |  SELECT source, docs, tokens,
      |         (docs * 10000) // d1 AS target_bp,
      |         (((docs * 10000) // d1) * 10000)
      |           // greatest((tokens * 10000) // t1, 1) AS factor_bp
      |  FROM plan, tot),
      |sampled AS (
      |  SELECT d.source, d.tok, f.docs, f.tokens, f.target_bp, f.factor_bp,
      |         f.factor_bp // 10000 +
      |         CASE WHEN CAST(concat('0x', substr(md5('mixapply|'
      |                || CAST(d.doc_id AS VARCHAR)),1,6)) AS BIGINT)
      |              < ((f.factor_bp % 10000) * 16777216) // 10000
      |              THEN 1 ELSE 0 END AS copies
      |  FROM d JOIN f USING (source)),
      |a AS (
      |  SELECT source,
      |         cast(sum(copies) AS BIGINT) AS achieved_docs,
      |         cast(sum(copies * tok) AS BIGINT) AS achieved_tokens,
      |         any_value(docs) AS docs, any_value(tokens) AS tokens,
      |         any_value(target_bp) AS target_bp,
      |         any_value(factor_bp) AS factor_bp
      |  FROM sampled GROUP BY 1),
      |at AS (SELECT cast(sum(achieved_tokens) AS BIGINT) AS t FROM a)
      |SELECT source, docs, tokens, factor_bp, achieved_docs,
      |       achieved_tokens,
      |       (achieved_tokens * 10000) // greatest(t, 1) AS achieved_bp,
      |       target_bp,
      |       (achieved_tokens * 10000) // greatest(t, 1) - target_bp AS err_bp
      |FROM a, at ORDER BY source""".stripMargin

  /** C92 oracle: the identical integer-sqrt-chain arithmetic in DuckDB. */
  val mixtureTemperatureOracle: String =
    """WITH tok AS (
      |  SELECT source, count(*) AS docs,
      |    cast(sum(len(string_split(trim(regexp_replace(lower(text),
      |      '\s+',' ','g')),' '))) AS BIGINT) AS tokens
      |  FROM documents GROUP BY 1),
      |wts AS (
      |  SELECT source, docs, tokens,
      |         cast(floor(sqrt(tokens)) AS BIGINT) AS w_half,
      |         cast(floor(sqrt(cast(floor(sqrt(tokens)) AS BIGINT))) AS BIGINT) AS w_quarter
      |  FROM tok),
      |tot AS (SELECT cast(sum(tokens) AS BIGINT) AS t1,
      |               cast(sum(w_half) AS BIGINT) AS t2,
      |               cast(sum(w_quarter) AS BIGINT) AS t4 FROM wts)
      |SELECT source, docs, tokens, w_half, w_quarter,
      |       (tokens * 10000) // t1 AS natural_bp,
      |       (w_half * 10000) // t2 AS t05_bp,
      |       (w_quarter * 10000) // t4 AS t025_bp,
      |       (((w_half * 10000) // t2) * 10000)
      |         // greatest((tokens * 10000) // t1, 1) AS factor05_bp,
      |       (((w_quarter * 10000) // t4) * 10000)
      |         // greatest((tokens * 10000) // t1, 1) AS factor025_bp
      |FROM wts, tot ORDER BY source""".stripMargin
}
