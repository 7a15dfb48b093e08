package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the LLM-training-data pipeline
  * (SURVEY §2.C). Everything here is a pure Catalyst expression tree —
  * codegen'd, no UDFs — so whole-stage codegen spans the full projection
  * and the operators scale as plain narrow maps over 100 TB of documents.
  *
  * Parity notes (SURVEY §4): md5 over identical strings is engine-stable;
  * token splits use an explicit regex so Spark and the DuckDB oracle
  * tokenize identically.
  */
object Text {

  /** Whitespace-collapsed, trimmed, lower-cased canonical form — the
    * normalization applied before exact-dup hashing. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Stable content id: md5 of the normalized text. */
  def contentHash(text: Column): Column = md5(normalized(text))

  /** Tokens of the normalized text. Whitespace collapsing means no
    * empty-string tokens can appear INSIDE the array, but a fully
    * empty/whitespace document yields `[""]` (one empty token, size 1)
    * — deliberately matching DuckDB's `string_split('', ' ')` so every
    * oracle sees identical token counts on degenerate rows; null text
    * propagates null. TextEdgeSpec pins all three behaviors. */
  def tokens(text: Column): Column = split(normalized(text), " ")

  /** Count of BPE-ish pieces: alnum runs or single non-alnum glyphs —
    * the standard cheap proxy for subword token counts. */
  def regexTokenCount(text: Column): Column =
    regexp_count(normalized(text), lit("[a-z0-9]+|[^a-z0-9 ]"))

  /** The C9 heuristic quality score over an already-computed
    * TokenMarkerStats struct column — ONE shared kernel for the batch
    * faces (TextQueries.qualityScores / textQuality) and the streaming
    * drift monitor, so the faces can never silently diverge. Callers
    * project the stats struct once (`TokenMarkerStats(text).as("st")`)
    * and apply this to the struct column, keeping the stats expression
    * computed once per row. NULL text → null struct → scores 0.0 (the
    * null-skipping `least` would otherwise hand null stats 0.7). */
  def qualityScoreFromStats(st: Column): Column = {
    val nTok = st.getField("ws_tokens").cast("double")
    val stopRatio = st.getField("stop").cast("double") / nTok
    val avgLen = st.getField("alpha_len").cast("double") / nTok
    val score = lit(0.4) * least(nTok / 100.0, lit(1.0)) +
      lit(0.3) * least(stopRatio * 10.0, lit(1.0)) +
      lit(0.3) * when(avgLen >= 3.0 && avgLen <= 8.0, 1.0).otherwise(0.0)
    when(st.isNull, lit(0.0)).otherwise(score)
  }

  /** How many tokens fall in `vocab`. */
  def markerCount(toks: Column, vocab: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(vocab)))

  /** Marker vocabularies for the n-gram/stopword language-ID heuristic.
    * Deterministic tie-break: earlier language wins at equal score. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "los"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "les", "des", "une"))

  /** Predicted language: argmax of marker counts, 'und' when all zero. */
  def langId(toks: Column): Column = {
    val scores = langMarkers.map { case (lang, vocab) => lang -> markerCount(toks, vocab) }
    // strict > means a later language only displaces a strictly better
    // score, so the earlier language wins ties
    val best = scores.foldLeft((lit("und"), lit(0))) { case ((bLang, bScore), (lang, score)) =>
      (when(score > bScore, lit(lang)).otherwise(bLang),
        when(score > bScore, score).otherwise(bScore))
    }
    best._1
  }

  /** English-ish stopwords used by the quality score. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Order-insensitive duplicate fingerprint: md5 of the sorted distinct
    * token set. Catches shuffled/re-ordered copies that exact hashing
    * misses. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))
}
