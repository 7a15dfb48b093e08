package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** C71: MAXIMAL duplicated-substring recovery — the full ExactSubstr
  * semantics of Lee et al., "Deduplicating Training Data Makes Language
  * Models Better" (ACL 2022), beyond C45's fixed-extent span report.
  *
  * Their single-machine suffix array is re-expressed as the distributed
  * window-marking construction: hash every L-token window, keep windows
  * whose hash recurs anywhere in the corpus, and merge a doc's
  * duplicated window POSITIONS whose coverage intervals overlap
  * (position gap ≤ L) into disjoint spans. The union of the kept
  * windows' coverage is exactly the set of tokens lying inside some
  * duplicated run of ≥ L tokens, so each merged span is the MAXIMAL
  * extent of duplicated text at that site — a planted T-token duplicate
  * (T ≥ L) comes back as one span of exactly T tokens
  * (ExactSubstrSpec), never as a list of L-sized fragments, and the
  * reported token mass is the exact interval-union coverage (spans are
  * disjoint by construction, so nothing is double-counted — unlike a
  * per-window or per-extent sum). Duplicates shorter than L tokens are
  * below the published threshold by design (Lee et al. use 50 BPE
  * tokens; L=8 whitespace tokens here, scaled to the test corpus).
  *
  * Plan shape at 100 TB: one narrow window projection per doc (the doc
  * never self-joins), ONE shuffle on the uniform window hash for the
  * recurrence count, one per-doc window for the interval merge, then a
  * tiny per-source roll-up. All-integer output; SQL-checked against a
  * DuckDB oracle spelling the identical construction.
  */
object ExactSubstr {

  /** Maximal duplicated token spans of `docs` (≥ L tokens, recurring
    * anywhere in the corpus — cross-doc or same-doc): one row per
    * (doc_id, span) with 1-based inclusive token positions. Spans
    * within a doc are disjoint: two duplicated sites merge iff their
    * window coverages overlap (gap ≤ L), so `span_tokens` sums to the
    * exact duplicated-token coverage. */
  def spans(docs: DataFrame, idCol: String, textCol: String, L: Int): DataFrame = {
    val grams = windowHashes(docs, idCol, textCol, L)
    val dup = grams
      .withColumn("c", count(lit(1)).over(Window.partitionBy(col("h"))))
      .where(col("c") > 1)
    mergeIslands(dup, L)
  }

  /** Every L-token window of every doc as (doc_id, pos, h) — 1-based
    * window start position, md5 window hash.
    *
    * The doc frame is hash-spread by id first (round-15): the per-window
    * md5 pass — one digest per token position, the family's dominant
    * map-side compute — otherwise runs inside the single-rowgroup scan
    * task; exchanging the raw docs is ~100× cheaper than exchanging the
    * window stream, and the island-merge window downstream partitions on
    * the same key. No-op on already-parallel inputs (the at-scale case). */
  def windowHashes(docs: DataFrame, idCol: String, textCol: String, L: Int): DataFrame =
    Vectors.ensureParallelismBy(docs, col(idCol))
      .select(col(idCol).as("doc_id"), Text.tokens(col(textCol)).as("ts"))
      .where(size(col("ts")) >= L)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("ts")) - (L - 1)),
          i => md5(concat_ws(" ", slice(col("ts"), i, lit(L)))))).as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("h"))

  /** Merge a doc's marked window positions whose coverage intervals
    * overlap (gap ≤ L) into disjoint maximal spans. */
  private def mergeIslands(marked: DataFrame, L: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    marked
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= L, lit(0)).otherwise(lit(1)))
      .withColumn("grp", sum(col("brk")).over(byDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("start_pos"), (max(col("pos")) + L - 1).as("end_pos"))
      .select(col("doc_id"), col("start_pos"), col("end_pos"),
        (col("end_pos") - col("start_pos") + 1).as("span_tokens"))
  }

  /** C74 core: maximal spans of BATCH text already present in the
    * STANDING corpus — the daily-intake face of ExactSubstr. The
    * standing side collapses to its distinct window-hash set (the
    * index [[IncrementalIndex]] materializes as a table); batch windows
    * probe it with a semi-join bounded by O(batch windows), and only
    * batch docs island-merge. History is never re-paired with itself. */
  def incrementalSpans(batch: DataFrame, standingHashes: DataFrame,
      idCol: String, textCol: String, L: Int): DataFrame =
    mergeIslands(
      windowHashes(batch, idCol, textCol, L)
        .join(standingHashes.select(col("h")).distinct(), Seq("h"), "left_semi"),
      L)

  /** The C74 query face: new batch = doc_id ≡ 4 (mod 5) (the C36/C49
    * split), standing corpus = the rest; per-source card of how much
    * incoming text is recycled from history. */
  def incrementalSpansCard(s: SparkSession, dir: String): DataFrame = {
    val L = 8
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("source"), col("text"))
    val isNew = col("doc_id") % 5 === 4
    val perDoc = incrementalSpans(d.where(isNew),
        windowHashes(d.where(!isNew), "doc_id", "text", L), "doc_id", "text", L)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("span_tokens")).as("d_tokens"))
    d.where(isNew)
      .select(col("doc_id"), col("source"), size(Text.tokens(col("text"))).as("nt"))
      .join(perDoc, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("new_docs"),
        sum(col("nt")).cast("bigint").as("new_tokens"),
        count(col("n_spans")).as("docs_hit"),
        coalesce(sum(col("n_spans")), lit(0L)).cast("bigint").as("dup_spans"),
        coalesce(sum(col("d_tokens")), lit(0L)).cast("bigint").as("recycled_tokens"))
      .withColumn("recycled_bp",
        expr("recycled_tokens * 10000 div new_tokens"))
      .orderBy(col("source"))
  }

  /** C74 oracle: the same probe + island merge in DuckDB. */
  val incrementalOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |         string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ') AS ts
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id, i AS pos, md5(array_to_string(ts[i:i+7], ' ')) AS h
      |  FROM toks, unnest(generate_series(1, len(ts) - 7)) u(i)
      |), standing AS (
      |  SELECT DISTINCT h FROM grams WHERE doc_id % 5 <> 4
      |), hit AS (
      |  SELECT g.doc_id, g.pos FROM grams g
      |  WHERE g.doc_id % 5 = 4 AND g.h IN (SELECT h FROM standing)
      |), fl AS (
      |  SELECT doc_id, pos,
      |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
      |              THEN 0 ELSE 1 END AS brk
      |  FROM hit
      |), isl AS (
      |  SELECT doc_id, pos,
      |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      |  FROM fl
      |), spans AS (
      |  SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
      |  FROM isl GROUP BY doc_id, grp
      |), perdoc AS (
      |  SELECT doc_id, count(*) AS n_spans, sum(e - s + 1) AS d_tokens
      |  FROM spans GROUP BY doc_id
      |)
      |SELECT t.source,
      |       count(*) AS new_docs,
      |       CAST(sum(len(t.ts)) AS BIGINT) AS new_tokens,
      |       count(p.n_spans) AS docs_hit,
      |       CAST(coalesce(sum(p.n_spans), 0) AS BIGINT) AS dup_spans,
      |       CAST(coalesce(sum(p.d_tokens), 0) AS BIGINT) AS recycled_tokens,
      |       CAST(CAST(coalesce(sum(p.d_tokens), 0) AS BIGINT) * 10000
      |            // CAST(sum(len(t.ts)) AS BIGINT) AS BIGINT) AS recycled_bp
      |FROM toks t LEFT JOIN perdoc p USING (doc_id)
      |WHERE t.doc_id % 5 = 4
      |GROUP BY t.source
      |ORDER BY t.source""".stripMargin

  /** The C71 query face: per-source duplicated-substring card — doc and
    * span counts, exact duplicated-token coverage, the largest single
    * span, and coverage share in integer basis points. */
  def exactSubstrCard(s: SparkSession, dir: String): DataFrame = {
    val L = 8
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("source"), col("text"))
    val perDoc = spans(d, "doc_id", "text", L)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("span_tokens")).as("d_tokens"),
        max(col("span_tokens")).as("m_span"))
    d.select(col("doc_id"), col("source"), size(Text.tokens(col("text"))).as("nt"))
      .join(perDoc, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(col("nt")).cast("bigint").as("total_tokens"),
        count(col("n_spans")).as("docs_with_dups"),
        coalesce(sum(col("n_spans")), lit(0L)).cast("bigint").as("dup_spans"),
        coalesce(sum(col("d_tokens")), lit(0L)).cast("bigint").as("dup_tokens"),
        coalesce(max(col("m_span")), lit(0)).cast("bigint").as("max_span_tokens"))
      .withColumn("share_bp", expr("dup_tokens * 10000 div total_tokens"))
      .orderBy(col("source"))
  }

  /** C73: the REMOVAL face — Lee et al. don't just report duplicated
    * substrings, they cut them, keeping ONE occurrence corpus-wide.
    * Spans group by exact token content (md5 of the span's tokens); the
    * first occurrence in (doc_id, start) order is the keeper, every
    * other occurrence is cut from its doc's token stream. A span whose
    * merged content matches nothing else (asymmetric island merging can
    * produce content-unique spans around overlapping dup sites) is
    * conservatively KEPT — text is only deleted when an identical kept
    * copy provably exists elsewhere.
    *
    * Returns (doc_id, ts: original tokens, ts_clean: kept tokens). The
    * per-token cut test is `exists` over the doc's cut-span list —
    * bounded by spans-per-doc, which the island merge keeps small. */
  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String, L: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"), Text.tokens(col(textCol)).as("ts"))
    val withContent = spans(docs, idCol, textCol, L)
      .join(toks, Seq("doc_id"))
      .withColumn("h",
        md5(concat_ws(" ", slice(col("ts"), col("start_pos"), col("span_tokens")))))
    val dupContent = Window.partitionBy(col("h"))
    val firstCopy = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("start_pos"))
    val cuts = withContent
      .withColumn("copies", count(lit(1)).over(dupContent))
      .withColumn("rk", row_number().over(firstCopy))
      .where(col("copies") > 1 && col("rk") > 1)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("start_pos").as("s"), col("end_pos").as("e"))).as("cut"))
    toks.join(cuts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("ts"),
        when(col("cut").isNull, col("ts")).otherwise(
          filter(col("ts"), (_, i) => !exists(col("cut"),
            sp => i + 1 >= sp.getField("s") && i + 1 <= sp.getField("e"))))
          .as("ts_clean"))
  }

  /** The C73 query face: per-source removal card — what keep-one span
    * removal would cut, measured on the actually-cleaned token streams
    * (not inferred from span arithmetic). */
  def removeDupSpansCard(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("source"), col("text"))
    val cleaned = removeDupSpans(d, "doc_id", "text", L = 8)
      .select(col("doc_id"), size(col("ts")).as("nt"), size(col("ts_clean")).as("nc"))
    d.select(col("doc_id"), col("source"))
      .join(cleaned, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        count(when(col("nc") < col("nt"), lit(1))).as("docs_cut"),
        sum(col("nt")).cast("bigint").as("tokens_before"),
        sum(col("nc")).cast("bigint").as("tokens_after"))
      .withColumn("removed_bp",
        expr("(tokens_before - tokens_after) * 10000 div tokens_before"))
      .orderBy(col("source"))
  }

  /** C75: span PROVENANCE — the source-pair attribution of duplicated
    * text (C54's duplication matrix at SPAN granularity): for every
    * duplicated span CONTENT, which source pairs share it and how much
    * token mass rides on it. The mixture-design question behind it:
    * before weighting two crawls, know whether their overlap is whole
    * documents (C54 flags that) or recycled boilerplate threading
    * through otherwise-distinct documents (only a span-level matrix
    * sees that).
    *
    * Plan shape: the C71 span frame + a content hash, collapsed to one
    * row per (content, source) with its occurrence count — then the
    * pair join runs on CONTENT GROUPS (bounded by sources-per-content,
    * never corpus size). Diagonal cells require ≥2 occurrences within
    * the source. */
  /** The span-OCCURRENCE frame both attribution cards derive from —
    * (doc_id, source, start_pos, span_tokens, h) with h the md5 of the
    * span's exact token content. One definition so C75's matrix, C78's
    * flow, and their DuckDB oracles can never diverge on the hash or
    * slice convention. */
  private def spanOccurrences(s: SparkSession, dir: String, L: Int): DataFrame = {
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val toks = d.select(col("doc_id"), col("source"),
      Text.tokens(col("text")).as("ts"))
    spans(d, "doc_id", "text", L)
      .join(toks, Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("start_pos"), col("span_tokens"),
        md5(concat_ws(" ", slice(col("ts"), col("start_pos"), col("span_tokens"))))
          .as("h"))
  }

  def spanProvenanceCard(s: SparkSession, dir: String): DataFrame = {
    val occ = spanOccurrences(s, dir, L = 8)
      .groupBy(col("h"), col("source"))
      .agg(count(lit(1)).as("c"), max(col("span_tokens")).as("toklen"))
    val a = occ.select(col("h"), col("source").as("src_a"), col("c"), col("toklen"))
    val b = occ.select(col("h"), col("source").as("src_b"))
    a.join(b, Seq("h"))
      .where(col("src_a") < col("src_b") ||
        (col("src_a") === col("src_b") && col("c") >= 2))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("shared_spans"),
        sum(col("toklen")).cast("bigint").as("shared_tokens"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** C75 oracle: the identical span → content → source-pair derivation. */
  val provenanceOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |         string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ') AS ts
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id, i AS pos, md5(array_to_string(ts[i:i+7], ' ')) AS h
      |  FROM toks, unnest(generate_series(1, len(ts) - 7)) u(i)
      |), dup AS (
      |  SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS c FROM grams
      |), fl AS (
      |  SELECT doc_id, pos,
      |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
      |              THEN 0 ELSE 1 END AS brk
      |  FROM dup WHERE c > 1
      |), isl AS (
      |  SELECT doc_id, pos,
      |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      |  FROM fl
      |), spans AS (
      |  SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
      |  FROM isl GROUP BY doc_id, grp
      |), occ AS (
      |  SELECT md5(array_to_string(t.ts[sp.s:sp.e], ' ')) AS h,
      |         t.source, count(*) AS c, max(sp.e - sp.s + 1) AS toklen
      |  FROM spans sp JOIN toks t USING (doc_id)
      |  GROUP BY 1, 2
      |)
      |SELECT a.source AS src_a, b.source AS src_b,
      |       count(*) AS shared_spans,
      |       CAST(sum(a.toklen) AS BIGINT) AS shared_tokens
      |FROM occ a JOIN occ b ON a.h = b.h
      |WHERE a.source < b.source OR (a.source = b.source AND a.c >= 2)
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** C78: span ORIGIN attribution — the DIRECTIONAL view C75's
    * symmetric matrix can't express: who copies whom. Every duplicated
    * span content's ORIGIN is its first occurrence in (doc_id,
    * start_pos) order — deliberately the SAME rule C73 uses to pick the
    * kept copy, so "the original" means the same document in both the
    * attribution card and the removal pipeline — and every other
    * occurrence ADOPTS it. The card is one row per (origin source →
    * adopting source) with distinct contents, adopted occurrences, and
    * adopted token mass; the diagonal is within-source recycling. A
    * mixture designer reads it as a flow matrix: a crawl whose mass is
    * mostly ADOPTED from another source is a mirror wearing a new
    * domain, which the symmetric C75 cell alone can't distinguish from
    * the source it mirrors.
    *
    * Plan shape: the C71 span frame + content hash; the origin window
    * partitions by CONTENT (bounded by copies-per-content, the same
    * bound C73's keeper window already carries); the attribution join
    * is content-group × its occurrences — never corpus². SQL-checked
    * against the identical construction in DuckDB. */
  def spanOriginCard(s: SparkSession, dir: String): DataFrame = {
    val occ = spanOccurrences(s, dir, L = 8)
    val byContent = Window.partitionBy(col("h"))
    val firstCopy = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("start_pos"))
    val marked = occ
      .withColumn("copies", count(lit(1)).over(byContent))
      .withColumn("rk", row_number().over(firstCopy))
      .where(col("copies") > 1)
    val origin = marked.where(col("rk") === 1)
      .select(col("h"), col("source").as("src_from"))
    marked.where(col("rk") > 1)
      .join(origin, Seq("h"))
      .groupBy(col("src_from"), col("source").as("src_to"))
      .agg(countDistinct(col("h")).as("n_contents"),
        count(lit(1)).as("adopted_occurrences"),
        sum(col("span_tokens")).cast("bigint").as("adopted_tokens"))
      .orderBy(col("src_from"), col("src_to"))
  }

  /** C81: EFFECTIVE token mass per source — the C78 origin flow wired
    * into the mixture-design decision it exists to inform. A source's
    * naive weight (its share of total tokens) over-credits it for text
    * it ADOPTED from other sources: a crawl that mirrors another
    * contributes no new signal for its recycled mass. Per source:
    * total tokens, tokens adopted from OTHER sources (cross-source
    * spans where this source is not the origin — within-source
    * recycling doesn't transfer credit), the effective remainder, and
    * both shares in integer bp. The gap between naive_share_bp and
    * effective_share_bp is exactly the over-credit a mixture built on
    * raw counts would hand the source.
    *
    * Plan: the C71/C78 span machinery + one S-row rollup; the share
    * normalizers are whole-frame window sums over the S-row card —
    * eval-scale, not corpus-scale. SQL-checked against the composed
    * origin + totals derivation. */
  def mixtureEffectiveCard(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val totals = d
      .select(col("source"), size(Text.tokens(col("text"))).as("nt"))
      .groupBy(col("source"))
      .agg(sum(col("nt")).cast("bigint").as("total_tokens"))
    val occ = spanOccurrences(s, dir, L = 8)
    val byContent = Window.partitionBy(col("h"))
    val firstCopy = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("start_pos"))
    val marked = occ
      .withColumn("copies", count(lit(1)).over(byContent))
      .withColumn("rk", row_number().over(firstCopy))
      .where(col("copies") > 1)
    val origin = marked.where(col("rk") === 1)
      .select(col("h"), col("source").as("src_from"))
    val adopted = marked.where(col("rk") > 1)
      .join(origin, Seq("h"))
      .where(col("src_from") =!= col("source"))
      .groupBy(col("source"))
      .agg(sum(col("span_tokens")).cast("bigint").as("adopted_tokens"))
    val all = Window.partitionBy()
    totals.join(adopted, Seq("source"), "left")
      .select(col("source"), col("total_tokens"),
        coalesce(col("adopted_tokens"), lit(0L)).as("adopted_tokens"))
      .withColumn("effective_tokens", col("total_tokens") - col("adopted_tokens"))
      .withColumn("tot_all", sum(col("total_tokens")).over(all))
      .withColumn("eff_all", sum(col("effective_tokens")).over(all))
      .withColumn("naive_share_bp", expr("total_tokens * 10000 div tot_all"))
      .withColumn("effective_share_bp", expr("effective_tokens * 10000 div eff_all"))
      .select(col("source"), col("total_tokens"), col("adopted_tokens"),
        col("effective_tokens"), col("naive_share_bp"), col("effective_share_bp"))
      .orderBy(col("source"))
  }

  /** C81 oracle: the composed origin + totals derivation in DuckDB. */
  val mixtureEffectiveOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |         string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ') AS ts
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id, i AS pos, md5(array_to_string(ts[i:i+7], ' ')) AS h
      |  FROM toks, unnest(generate_series(1, len(ts) - 7)) u(i)
      |), dup AS (
      |  SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS c FROM grams
      |), fl AS (
      |  SELECT doc_id, pos,
      |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
      |              THEN 0 ELSE 1 END AS brk
      |  FROM dup WHERE c > 1
      |), isl AS (
      |  SELECT doc_id, pos,
      |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      |  FROM fl
      |), spans AS (
      |  SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
      |  FROM isl GROUP BY doc_id, grp
      |), occ AS (
      |  SELECT sp.doc_id, t.source, sp.s, sp.e - sp.s + 1 AS toklen,
      |         md5(array_to_string(t.ts[sp.s:sp.e], ' ')) AS h
      |  FROM spans sp JOIN toks t USING (doc_id)
      |), mk AS (
      |  SELECT *, count(*) OVER (PARTITION BY h) AS copies,
      |         row_number() OVER (PARTITION BY h ORDER BY doc_id, s) AS rk
      |  FROM occ
      |), org AS (
      |  SELECT h, source AS src_from FROM mk WHERE copies > 1 AND rk = 1
      |), ad AS (
      |  SELECT mk.source, CAST(sum(mk.toklen) AS BIGINT) AS adopted_tokens
      |  FROM mk JOIN org USING (h)
      |  WHERE mk.copies > 1 AND mk.rk > 1 AND org.src_from <> mk.source
      |  GROUP BY mk.source
      |), tot AS (
      |  SELECT source, CAST(sum(len(ts)) AS BIGINT) AS total_tokens
      |  FROM toks GROUP BY source
      |), card AS (
      |  SELECT t.source, t.total_tokens,
      |         coalesce(ad.adopted_tokens, 0) AS adopted_tokens,
      |         t.total_tokens - coalesce(ad.adopted_tokens, 0) AS effective_tokens
      |  FROM tot t LEFT JOIN ad USING (source)
      |)
      |SELECT source, total_tokens, adopted_tokens, effective_tokens,
      |       total_tokens * 10000
      |         // CAST(sum(total_tokens) OVER () AS BIGINT) AS naive_share_bp,
      |       effective_tokens * 10000
      |         // CAST(sum(effective_tokens) OVER () AS BIGINT) AS effective_share_bp
      |FROM card
      |ORDER BY source""".stripMargin

  /** C78 oracle: the identical origin/adopter derivation in DuckDB. */
  val originOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |         string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ') AS ts
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id, i AS pos, md5(array_to_string(ts[i:i+7], ' ')) AS h
      |  FROM toks, unnest(generate_series(1, len(ts) - 7)) u(i)
      |), dup AS (
      |  SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS c FROM grams
      |), fl AS (
      |  SELECT doc_id, pos,
      |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
      |              THEN 0 ELSE 1 END AS brk
      |  FROM dup WHERE c > 1
      |), isl AS (
      |  SELECT doc_id, pos,
      |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      |  FROM fl
      |), spans AS (
      |  SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
      |  FROM isl GROUP BY doc_id, grp
      |), occ AS (
      |  SELECT sp.doc_id, t.source, sp.s, sp.e - sp.s + 1 AS toklen,
      |         md5(array_to_string(t.ts[sp.s:sp.e], ' ')) AS h
      |  FROM spans sp JOIN toks t USING (doc_id)
      |), mk AS (
      |  SELECT *, count(*) OVER (PARTITION BY h) AS copies,
      |         row_number() OVER (PARTITION BY h ORDER BY doc_id, s) AS rk
      |  FROM occ
      |), org AS (
      |  SELECT h, source AS src_from FROM mk WHERE copies > 1 AND rk = 1
      |)
      |SELECT org.src_from, mk.source AS src_to,
      |       count(DISTINCT mk.h) AS n_contents,
      |       count(*) AS adopted_occurrences,
      |       CAST(sum(mk.toklen) AS BIGINT) AS adopted_tokens
      |FROM mk JOIN org USING (h)
      |WHERE mk.copies > 1 AND mk.rk > 1
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** C73 oracle: spans + content keeper + removed-mass arithmetic in
    * DuckDB (the cleaned token count is tokens − Σ cut-span lengths —
    * cut spans are disjoint per doc, so the subtraction is exact). */
  val removeOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |         string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ') AS ts
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id, i AS pos, md5(array_to_string(ts[i:i+7], ' ')) AS h
      |  FROM toks, unnest(generate_series(1, len(ts) - 7)) u(i)
      |), dup AS (
      |  SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS c FROM grams
      |), fl AS (
      |  SELECT doc_id, pos,
      |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
      |              THEN 0 ELSE 1 END AS brk
      |  FROM dup WHERE c > 1
      |), isl AS (
      |  SELECT doc_id, pos,
      |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      |  FROM fl
      |), spans AS (
      |  SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
      |  FROM isl GROUP BY doc_id, grp
      |), contentd AS (
      |  SELECT sp.doc_id, sp.s, sp.e,
      |         md5(array_to_string(t.ts[sp.s:sp.e], ' ')) AS h
      |  FROM spans sp JOIN toks t USING (doc_id)
      |), cut AS (
      |  SELECT doc_id, e - s + 1 AS cut_len
      |  FROM (SELECT doc_id, s, e,
      |               count(*) OVER (PARTITION BY h) AS copies,
      |               row_number() OVER (PARTITION BY h ORDER BY doc_id, s) AS rk
      |        FROM contentd)
      |  WHERE copies > 1 AND rk > 1
      |), perdoc AS (
      |  SELECT doc_id, sum(cut_len) AS removed FROM cut GROUP BY doc_id
      |)
      |SELECT t.source,
      |       count(*) AS docs,
      |       count(p.removed) AS docs_cut,
      |       CAST(sum(len(t.ts)) AS BIGINT) AS tokens_before,
      |       CAST(sum(len(t.ts)) - coalesce(sum(p.removed), 0) AS BIGINT) AS tokens_after,
      |       CAST(CAST(coalesce(sum(p.removed), 0) AS BIGINT) * 10000
      |            // CAST(sum(len(t.ts)) AS BIGINT) AS BIGINT) AS removed_bp
      |FROM toks t LEFT JOIN perdoc p USING (doc_id)
      |GROUP BY t.source
      |ORDER BY t.source""".stripMargin

  /** C71 oracle: the identical construction in DuckDB SQL. */
  val oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |         string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ') AS ts
      |  FROM documents
      |), tok AS (
      |  SELECT doc_id, source, len(ts) AS nt FROM toks
      |), grams AS (
      |  SELECT doc_id, i AS pos, md5(array_to_string(ts[i:i+7], ' ')) AS h
      |  FROM toks, unnest(generate_series(1, len(ts) - 7)) u(i)
      |), dup AS (
      |  SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS c FROM grams
      |), fl AS (
      |  SELECT doc_id, pos,
      |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
      |              THEN 0 ELSE 1 END AS brk
      |  FROM dup WHERE c > 1
      |), isl AS (
      |  SELECT doc_id, pos,
      |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      |  FROM fl
      |), spans AS (
      |  SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
      |  FROM isl GROUP BY doc_id, grp
      |), perdoc AS (
      |  SELECT doc_id, count(*) AS n_spans, sum(e - s + 1) AS d_tokens,
      |         max(e - s + 1) AS m_span
      |  FROM spans GROUP BY doc_id
      |)
      |SELECT t.source,
      |       count(*) AS docs,
      |       CAST(sum(t.nt) AS BIGINT) AS total_tokens,
      |       count(p.n_spans) AS docs_with_dups,
      |       CAST(coalesce(sum(p.n_spans), 0) AS BIGINT) AS dup_spans,
      |       CAST(coalesce(sum(p.d_tokens), 0) AS BIGINT) AS dup_tokens,
      |       CAST(coalesce(max(p.m_span), 0) AS BIGINT) AS max_span_tokens,
      |       CAST(CAST(coalesce(sum(p.d_tokens), 0) AS BIGINT) * 10000
      |            // CAST(sum(t.nt) AS BIGINT) AS BIGINT) AS share_bp
      |FROM tok t LEFT JOIN perdoc p USING (doc_id)
      |GROUP BY t.source
      |ORDER BY t.source""".stripMargin

  /** C86: the duplication CURVE — duplicated-window mass as a function
    * of window length L, the ablation every exact-substring pipeline
    * runs before fixing its span length (Lee et al. report exactly this
    * sensitivity): a short L flags natural phrase reuse as duplication,
    * a long L misses real boilerplate; the curve shows where THIS
    * corpus's dup mass stabilizes, which is the principled way to pick
    * C71's L. Per L ∈ {4, 8, 16, 32}: total windows, distinct window
    * contents, duplicated contents (seen ≥2×), non-first window copies
    * (`dup_windows` = Σ(c−1) — the same every-copy-but-the-keeper
    * accounting C31/C82 use), and the share in integer bp.
    *
    * Plan shape at 100 TB: per L one narrow window-hash explode and ONE
    * partial-aggregating groupBy on the (uniform) hash — no windows, no
    * row_numbers (dup mass needs only per-content counts, so the
    * keeper never has to be IDENTIFIED, just counted out); the four
    * single-row aggregates union. SQL-checked. */
  def dedupCurve(s: SparkSession, dir: String,
                 lengths: Seq[Int] = Seq(4, 8, 16, 32)): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    lengths.map { l =>
      windowHashes(d, "doc_id", "text", l)
        .groupBy(col("h")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("total_windows"),
          count(lit(1)).as("distinct_contents"),
          sum(when(col("c") > 1, lit(1L)).otherwise(0L)).as("dup_contents"))
        // an L every doc is shorter than yields ZERO windows: Spark's
        // global agg still emits one (null) row where the oracle's
        // GROUP BY emits none — drop it so both engines say "no such L"
        .where(col("total_windows").isNotNull)
        .select(lit(l).as("win_len"), col("total_windows"),
          col("distinct_contents"), col("dup_contents"),
          (col("total_windows") - col("distinct_contents")).as("dup_windows"),
          expr("(total_windows - distinct_contents) * 10000 div total_windows")
            .as("dup_bp"))
    }.reduce(_ unionAll _).orderBy(col("win_len"))
  }

  /** C88: the duplication curve at SPAN granularity — C86 counts raw
    * recurring windows; THIS face runs the full C71 island-merge at
    * each L and reports the maximal-span token coverage, which is the
    * number the Lee et al. pipeline actually ablates when choosing L
    * (the cut mass). Short L merges nearby recurrences into broad
    * spans (aggressive cuts); long L leaves only long verbatim
    * duplication. Per L ∈ {4, 8, 16}: corpus docs/tokens, docs with
    * any span, span count, interval-union token mass, integer-bp
    * share. C86 is the cheap first look; this is the exact dress
    * rehearsal of the cut at each candidate L.
    *
    * Plan: the C71 machinery per L (window shuffle + bounded island
    * windows), plus one tiny totals agg cross-joined per branch —
    * three full passes by construction (an ablation run once per
    * corpus, not a daily job). SQL-checked. */
  def dedupCurveSpans(s: SparkSession, dir: String,
                      lengths: Seq[Int] = Seq(4, 8, 16)): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    val totals = d.select(size(Text.tokens(col("text"))).cast("long").as("nt"))
      .agg(count(lit(1)).as("docs"), sum(col("nt")).as("total_tokens"))
    lengths.map { l =>
      spans(d, "doc_id", "text", l)
        .agg(countDistinct(col("doc_id")).as("docs_with_dups"),
          count(lit(1)).as("dup_spans"),
          coalesce(sum(col("span_tokens")), lit(0L)).cast("bigint").as("dup_tokens"))
        .crossJoin(totals)
        .select(lit(l).as("win_len"), col("docs"), col("total_tokens"),
          col("docs_with_dups"), col("dup_spans"), col("dup_tokens"),
          expr("dup_tokens * 10000 div total_tokens").as("share_bp"))
    }.reduce(_ unionAll _).orderBy(col("win_len"))
  }

  /** One per-L CTE chain of the C88 oracle (the C71 oracle construction
    * with L parameterized). */
  private def curveSpanBlock(l: Int): String =
    s"""g$l AS (
       |  SELECT doc_id, i AS pos, md5(array_to_string(ts[i:i+${l - 1}], ' ')) AS h
       |  FROM toks, unnest(generate_series(1, len(ts) - ${l - 1})) u(i)),
       |d$l AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS c FROM g$l),
       |f$l AS (
       |  SELECT doc_id, pos,
       |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $l
       |              THEN 0 ELSE 1 END AS brk
       |  FROM d$l WHERE c > 1),
       |i$l AS (
       |  SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM f$l),
       |s$l AS (SELECT doc_id, min(pos) AS s, max(pos) + ${l - 1} AS e
       |        FROM i$l GROUP BY doc_id, grp),
       |a$l AS (SELECT count(DISTINCT doc_id) AS dwd, count(*) AS ds,
       |               sum(e - s + 1) AS dt FROM s$l)""".stripMargin

  private def curveSpanSelect(l: Int): String =
    s"""SELECT $l AS win_len, tot.docs, tot.total_tokens,
       |       cast(coalesce(a$l.dwd, 0) AS BIGINT) AS docs_with_dups,
       |       cast(coalesce(a$l.ds, 0) AS BIGINT) AS dup_spans,
       |       cast(coalesce(a$l.dt, 0) AS BIGINT) AS dup_tokens,
       |       cast(coalesce(a$l.dt, 0) AS BIGINT) * 10000 // tot.total_tokens AS share_bp
       |FROM a$l, tot""".stripMargin

  /** C88 oracle: one shared tokens/totals CTE + the three per-L chains. */
  val dedupCurveSpansOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         string_split(trim(regexp_replace(lower(text),'\\s+',' ','g')),' ') AS ts
       |  FROM documents),
       |tot AS (SELECT cast(count(*) AS BIGINT) AS docs,
       |               cast(sum(len(ts)) AS BIGINT) AS total_tokens FROM toks),
       |${Seq(4, 8, 16).map(curveSpanBlock).mkString(",\n")}
       |${Seq(4, 8, 16).map(curveSpanSelect).mkString("\nUNION ALL\n")}
       |ORDER BY win_len""".stripMargin

  /** C86 oracle: the identical per-L window-hash accounting in DuckDB. */
  val dedupCurveOracle: String =
    """WITH d AS (
      |  SELECT doc_id,
      |         string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ') AS ts
      |  FROM documents),
      |g AS (
      |  SELECT win_len, md5(array_to_string(ts[i:i+win_len-1], ' ')) AS h
      |  FROM d, unnest([4, 8, 16, 32]) L(win_len),
      |       unnest(generate_series(1, len(ts) - win_len + 1)) u(i)
      |  WHERE len(ts) >= win_len),
      |c AS (SELECT win_len, h, count(*) AS c FROM g GROUP BY 1, 2)
      |SELECT cast(win_len AS INTEGER) AS win_len,
      |       cast(sum(c) AS BIGINT) AS total_windows,
      |       cast(count(*) AS BIGINT) AS distinct_contents,
      |       cast(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_contents,
      |       cast(sum(c) - count(*) AS BIGINT) AS dup_windows,
      |       cast(sum(c) - count(*) AS BIGINT) * 10000
      |         // cast(sum(c) AS BIGINT) AS dup_bp
      |FROM c GROUP BY win_len ORDER BY win_len""".stripMargin
}
