package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** C72: sketch-gated benchmark decontamination — the C49 bloom-prefilter
  * pattern applied to the eval-leakage gate.
  *
  * C23 (`text_contamination`) broadcasts the benchmark n-gram set as an
  * exact hash relation; that holds while the benchmark side is
  * eval-sized, but a 100-benchmark decontamination suite's union n-gram
  * set stops being broadcast-tiny. Here the benchmark set is compressed
  * into a Bloom filter (`bloom_filter_agg`, a fixed-size bit array
  * regardless of suite size) delivered as a scalar-subquery result —
  * the same mechanism Spark's InjectRuntimeFilter uses — so the corpus
  * side probes it SCAN-LOCALLY with `might_contain`: the overwhelming
  * majority of corpus n-grams are bloom-negative and never shuffle at
  * all. Only bloom-positives (true hits plus the εN false-positive
  * margin) enter the exact confirm semi-join against the benchmark set,
  * shrinking its probe side by ~1/FPP. Blooms can never false-negative
  * and the confirm join removes the false positives, so the flagged-doc
  * set is EXACTLY C23's — SQL-checked against the same bloom-free
  * oracle, and DeconSpec pins frame-level equality plus the measured
  * pruning.
  *
  * Triage composition: at many-corpus scale, pair this with the C64 KMV
  * overlap card (`corpus_overlap_kmv`) — the KMV sketches rank
  * (source × benchmark) pairs by estimated overlap at sketch cost, and
  * only sources with material estimated overlap need this exact pass.
  */
object Decontaminate {

  /** Sized for the benchmark n-gram KEY count. Over-sizing only lowers
    * the false-positive rate; at a 10^8-gram benchmark suite the same
    * expression yields a ~100 MB filter — still broadcast-shaped, where
    * the exact set would be many GB of hash relation. */
  private val bloomEstItems = 1 << 20

  /** The C72 query face: documents sharing ≥3 distinct bigrams with the
    * benchmark set (docs 0–4, as in C23), bloom-gated. Output and
    * semantics identical to [[TextQueries.textContamination]]. */
  def contaminationBloom(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(s)
    Tables(s, dir, "documents")
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), 2)).as("ngram"))
      .createOrReplaceTempView("decon_grams")
    s.sql(s"""
      WITH bench AS (SELECT DISTINCT ngram FROM decon_grams WHERE doc_id < 5),
           corpus AS (SELECT doc_id, ngram FROM decon_grams WHERE doc_id >= 5),
           cand AS (
             SELECT corpus.* FROM corpus
             WHERE might_contain(
               (SELECT bloom_filter_agg(xxhash64(ngram), $bloomEstItems) FROM bench),
               xxhash64(ngram))),
           hits AS (
             SELECT cand.doc_id FROM cand LEFT SEMI JOIN bench
             ON cand.ngram = bench.ngram)
      SELECT doc_id, count(*) AS n_hits
      FROM hits GROUP BY doc_id HAVING count(*) >= 3
      ORDER BY doc_id""")
  }

  /** C72 oracle: deliberately the BLOOM-FREE C23 SQL — the gate itself
    * proves the sketch path changes nothing. */
  val oracle: String =
    """WITH d AS (
      |  SELECT doc_id, trim(regexp_replace(lower(text),'\s+',' ','g')) AS norm
      |  FROM documents),
      |toks AS (SELECT doc_id, string_split(norm,' ') AS w FROM d),
      |bg AS (
      |  SELECT DISTINCT doc_id, w[i]||' '||w[i+1] AS ngram
      |  FROM toks, unnest(generate_series(1, len(w)-1)) AS t(i)
      |  WHERE len(w) >= 2),
      |bench AS (SELECT DISTINCT ngram FROM bg WHERE doc_id < 5)
      |SELECT doc_id, count(*) AS n_hits
      |FROM bg JOIN bench USING (ngram)
      |WHERE doc_id >= 5
      |GROUP BY doc_id HAVING count(*) >= 3
      |ORDER BY doc_id""".stripMargin

  /** C77: per-(source × benchmark) decontamination TRIAGE — the §7.14
    * queue item wiring the C64 KMV overlap estimates AHEAD of the C72
    * exact pass as one operator.
    *
    * At a many-source, many-benchmark lake the exact contamination scan
    * is the expensive stage even bloom-gated: every corpus document's
    * n-grams are probed. But most (source × benchmark) pairs share
    * nothing beyond stop-bigram noise, and a KMV sketch already ranks
    * the pairs at sketch cost (k longs per source, one content pass,
    * merge-order independent). So: (1) sketch each source's bigram set
    * and the benchmark's bigram set; (2) estimate shared-gram mass per
    * source from the sketches alone; (3) run the C72 bloom-gated exact
    * confirm ONLY over sources whose estimate clears `minShared` — the
    * cold sources' documents are never probed at all. The card reports
    * both layers: every source's estimate, and the exact flagged-doc
    * count for the triaged ones (`n_flagged_docs` is NULL for sources
    * the triage skipped — "not checked", not "clean").
    *
    * The estimate CAN under-rank a source (KMV is approximate), which
    * is why this is a TRIAGE, not a gate with an exactness claim: the
    * documented posture is the CCNet/C49 one — sketches pick where to
    * spend the exact pass. TriageSpec pins (a) that triaged sources'
    * exact counts equal the un-triaged pass restricted to them (the
    * triage never changes what the exact stage computes, only where it
    * runs), (b) planted dirty sources triage in / disjoint-vocab
    * sources triage out, and (c) determinism. SQL-checked: the md5-60
    * parity hash makes the KMV sketches data both engines construct
    * identically (the C64 argument), so the estimate columns, the
    * triage cut, AND the exact confirm all replay in DuckDB (the
    * oracle's confirm is bloom-free — the C72 gate exactness).
    *
    * Scale shape: the sketch pass is one partial-aggregated scan (S×k
    * longs of state); the estimate stage is S rows against one
    * broadcast benchmark sketch; the exact pass inherits C72's shape
    * restricted by a broadcast semi-join on the triaged source list. */
  def contaminationTriage(s: SparkSession, dir: String,
      minShared: Long = 50L): DataFrame =
    triageCard(s, Tables(s, dir, "documents"), benchMaxId = 5L, minShared)

  /** Spec entry point over any (doc_id, source, text) frame; benchmark
    * side = doc_id < benchMaxId, corpus side = the rest. */
  def triageCard(s: SparkSession, docsDf: org.apache.spark.sql.DataFrame,
      benchMaxId: Long, minShared: Long, minHits: Long = 3L,
      k: Int = 256): DataFrame = {
    graft.GraftExtensions.register(s)
    import graft.functions.KmvSketch
    val grams = docsDf.select(col("doc_id"), col("source"),
      explode(Dedup.shingles(col("text"), 2)).as("ngram"))
    val bench = grams.where(col("doc_id") < benchMaxId)
      .select(col("ngram")).distinct()
    // md5-60 parity hash (the C64 convention): the sketches become DATA
    // both engines construct identically, so the estimate columns — not
    // just the exact confirm — are oracle-checkable
    val h60 = (c: Column) =>
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val benchSk = bench.agg(KmvSketch(h60(col("ngram")), k).as("kb"))
    val srcSk = grams.where(col("doc_id") >= benchMaxId)
      .select(col("source"), h60(col("ngram")).as("h"))
      .groupBy(col("source")).agg(KmvSketch(col("h"), k).as("ka"))
    val jac = KmvSketch.jaccardEstimate(col("ka"), col("kb"), k)
    val uni = KmvSketch.distinctEstimate(
      KmvSketch.unionSketch(col("ka"), col("kb"), k), k, hashBits = 60)
    // every corpus source keeps a row — a source whose documents yield
    // no shingles (all empty/null text) reports a zero estimate rather
    // than vanishing from the card (the row-keeping degenerate posture)
    val allSources = docsDf.where(col("doc_id") >= benchMaxId)
      .select(col("source")).distinct()
    val est = allSources
      .join(srcSk.crossJoin(broadcast(benchSk))
        .select(col("source"), round(jac, 4).as("ej"),
          round(jac * uni).cast("long").as("es")), Seq("source"), "left")
      .select(col("source"),
        coalesce(col("ej"), lit(0.0)).as("est_jaccard"),
        coalesce(col("es"), lit(0L)).as("est_shared"))
    val triaged = est.where(col("est_shared") >= minShared).select(col("source"))
    grams.where(col("doc_id") >= benchMaxId)
      .join(broadcast(triaged), Seq("source"))
      .createOrReplaceTempView("triage_corpus")
    bench.createOrReplaceTempView("triage_bench")
    // the C72 bloom-gated exact confirm, over triaged sources only
    val flagged = s.sql(s"""
      WITH cand AS (
        SELECT source, doc_id, ngram FROM triage_corpus
        WHERE might_contain(
          (SELECT bloom_filter_agg(xxhash64(ngram), $bloomEstItems)
           FROM triage_bench),
          xxhash64(ngram))),
      hits AS (
        SELECT cand.source, cand.doc_id FROM cand
        LEFT SEMI JOIN triage_bench ON cand.ngram = triage_bench.ngram),
      perdoc AS (
        SELECT source, doc_id, count(*) AS n_hits FROM hits
        GROUP BY source, doc_id HAVING count(*) >= $minHits)
      SELECT source, count(*) AS n_flagged_docs, sum(n_hits) AS n_hits
      FROM perdoc GROUP BY source""")
    est
      .join(flagged, Seq("source"), "left")
      .select(col("source"), col("est_jaccard"), col("est_shared"),
        (col("est_shared") >= minShared).as("triaged"),
        when(col("est_shared") >= minShared,
          coalesce(col("n_flagged_docs"), lit(0L))).as("n_flagged_docs"),
        when(col("est_shared") >= minShared,
          coalesce(col("n_hits"), lit(0L))).as("n_hits"))
      .orderBy(col("source"))
  }

  /** C77 oracle: the full triage replayed — KMV sketches from the same
    * md5-60 hashes (k smallest distinct per side), estimate algebra,
    * the minShared=50 triage cut, and a BLOOM-FREE exact confirm
    * (the C72 gate exactness) with NULL counts for untried sources. */
  val triageOracle: String =
    """WITH d AS (
      |  SELECT doc_id, source, trim(regexp_replace(lower(text),'\s+',' ','g')) AS norm
      |  FROM documents),
      |toks AS (SELECT doc_id, source, string_split(norm,' ') AS w FROM d),
      |bg AS (
      |  SELECT DISTINCT doc_id, source, w[i]||' '||w[i+1] AS ngram
      |  FROM toks, unnest(generate_series(1, len(w)-1)) AS t(i)
      |  WHERE len(w) >= 2),
      |bench AS (SELECT DISTINCT ngram FROM bg WHERE doc_id < 5),
      |bh AS (SELECT DISTINCT CAST(concat('0x', substr(md5(ngram),1,15)) AS BIGINT) AS h
      |       FROM bench),
      |kb AS (SELECT list(h ORDER BY h) AS kb
      |       FROM (SELECT h, row_number() OVER (ORDER BY h) AS r FROM bh)
      |       WHERE r <= 256),
      |sh AS (SELECT DISTINCT source,
      |              CAST(concat('0x', substr(md5(ngram),1,15)) AS BIGINT) AS h
      |       FROM bg WHERE doc_id >= 5),
      |ka AS (SELECT source, list(h ORDER BY h) AS ka
      |       FROM (SELECT source, h,
      |                    row_number() OVER (PARTITION BY source ORDER BY h) AS r
      |             FROM sh)
      |       WHERE r <= 256 GROUP BY source),
      |allsrc AS (SELECT DISTINCT source FROM documents WHERE doc_id >= 5),
      |est0 AS (
      |  SELECT ka.source,
      |         list_slice(list_sort(list_distinct(list_concat(ka.ka, kb.kb))),
      |                    1, 256) AS u,
      |         ka.ka, kb.kb
      |  FROM ka, kb),
      |est1 AS (
      |  SELECT source,
      |         CASE WHEN len(u) = 0 THEN 0.0::DOUBLE
      |              ELSE len(list_filter(u, v -> list_contains(ka, v)
      |                                       AND list_contains(kb, v)))::DOUBLE
      |                   / len(u) END AS jac,
      |         CASE WHEN len(u) < 256 THEN len(u)::DOUBLE
      |              ELSE 255::DOUBLE
      |                   / (u[256]::DOUBLE / 1152921504606846976::DOUBLE) END AS uni
      |  FROM est0),
      |est AS (
      |  SELECT allsrc.source,
      |         coalesce(round(est1.jac, 4), 0.0::DOUBLE) AS est_jaccard,
      |         coalesce(round(est1.jac * est1.uni)::BIGINT, 0::BIGINT) AS est_shared
      |  FROM allsrc LEFT JOIN est1 USING (source)),
      |perdoc AS (
      |  SELECT bg.source, bg.doc_id, count(*) AS n_hits
      |  FROM bg JOIN bench USING (ngram)
      |  WHERE bg.doc_id >= 5
      |  GROUP BY 1, 2 HAVING count(*) >= 3),
      |flagged AS (
      |  SELECT source, count(*)::BIGINT AS n_flagged_docs,
      |         sum(n_hits)::BIGINT AS n_hits
      |  FROM perdoc GROUP BY source)
      |SELECT est.source, est.est_jaccard, est.est_shared,
      |       est.est_shared >= 50 AS triaged,
      |       CASE WHEN est.est_shared >= 50
      |            THEN coalesce(f.n_flagged_docs, 0::BIGINT) END AS n_flagged_docs,
      |       CASE WHEN est.est_shared >= 50
      |            THEN coalesce(f.n_hits, 0::BIGINT) END AS n_hits
      |FROM est LEFT JOIN flagged f USING (source)
      |ORDER BY est.source""".stripMargin

  /** The bloom-positive candidate stage alone (no confirm join) —
    * exposed so DeconSpec can measure the pruning and the
    * false-positive margin the confirm join pays for. */
  def contaminationBloomCandidates(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(s)
    Tables(s, dir, "documents")
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), 2)).as("ngram"))
      .createOrReplaceTempView("decon_grams")
    s.sql(s"""
      WITH bench AS (SELECT DISTINCT ngram FROM decon_grams WHERE doc_id < 5),
           corpus AS (SELECT doc_id, ngram FROM decon_grams WHERE doc_id >= 5)
      SELECT corpus.* FROM corpus
      WHERE might_contain(
        (SELECT bloom_filter_agg(xxhash64(ngram), $bloomEstItems) FROM bench),
        xxhash64(ngram))""")
  }
}
