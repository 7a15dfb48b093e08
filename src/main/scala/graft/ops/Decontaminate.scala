package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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
