package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** SparkEntry-facing dedup queries (SURVEY §2.C C2–C4) plus their DuckDB
  * oracle SQL. The MinHash oracle is *generated* from the same
  * (numHashes, numBands) constants the Spark plan uses, so the md5
  * permutation formulas can never drift between engines.
  */
object DedupQueries {
  private def docs(s: SparkSession, dir: String) = Tables(s, dir, "documents")

  /** C2: word-3-gram shingle Jaccard pairs at tau=0.5, df-capped.
    * persistShingles=true: in the Verify/Bench mains the session IS the
    * process, so the one cached shingle frame (deduped by Spark's
    * CacheManager across identical plans) has exactly the lifetime it
    * needs — and the explode+cap shuffle runs once, not three times. */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(docs(s, dir), "doc_id", "text", persistShingles = true)
      .orderBy(col("doc_a"), col("doc_b"))

  /** C3: MinHash-LSH candidate pairs (16 hashes, 4 bands x 4 rows). */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashCandidates(docs(s, dir), "doc_id", "text")
      .orderBy(col("doc_a"), col("doc_b"))

  /** C99: LSH banding-parameter TUNING card — the ablation a dedup owner
    * runs before fixing (bands × rows) for a corpus (the C86/C88 posture
    * applied to the MinHash S-curve): the SAME 16-hash signature frame
    * re-banded as 16×1, 8×2, 4×4, and 2×8, each configuration's candidate
    * pairs measured against the C2 ground truth (df-capped 3-gram Jaccard
    * ≥ 0.5 — the SQL-checked face LSH exists to replace at scale), with
    * precision/recall in integer basis points. More rows per band =
    * stricter collision: each config's candidate set provably CONTAINS
    * the next's (a shared 2r-row band implies both r-row halves shared —
    * RetrievalTuningSpec pins the chain), so recall is monotone
    * non-increasing down the table and the card reads as the operating
    * curve. Plan: ONE signature groupBy feeds all four band explodes
    * (band-equi pair joins, never all-pairs); ground truth is the C2
    * join, computed once — at 100 TB the truth side runs on a sampled
    * document slice (the C87 recall-audit posture).
    *
    * HOT-BAND CAP (the C2 df-cap posture, measured necessary): a band
    * group of size m emits m²/2 candidate pairs, and on a dup-heavy
    * corpus the giant groups ARE the duplicate clusters — the loosest
    * 16×1 banding degenerates toward any-overlap blocking (158 s at the
    * 50k-doc sf1 decade, 30× super-linear, before the cap). A tuning
    * card doesn't need a mega-cluster enumerated pair-by-pair to
    * measure an operating point, so groups over `maxBand` are EXCLUDED
    * from the pair join and REPORTED (`hot_bands`, `hot_band_docs`) —
    * capped cells are visible, not silently truncated. The uncapped
    * nesting theorem still governs the construction; when the cap
    * binds, a cell's candidates are the capped construction's (the spec
    * pins cap-off equality and the planted-mega-cluster accounting). */
  def dedupMinhashTuning(s: SparkSession, dir: String,
      maxBand: Int = 64): DataFrame = {
    val d = docs(s, dir)
    // minhashSignature materializes itself (localCheckpoint) — all four
    // re-bandings below scan the same blocks
    val sig = Dedup.minhashSignature(
      Dedup.shingleFrame(d, "doc_id", "text", 3), "doc_id", 16)
    val truth = Dedup.jaccardPairs(d, "doc_id", "text", persistShingles = true)
      .select(col("doc_a"), col("doc_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    CacheScope.releaseAfterAction(s, truth)
    val truthCount = truth.agg(count(lit(1)).as("true_pairs"))
    // ONE multi-config band frame (round-15): the four configurations
    // previously each ran their own groupBy / anti-join / pair-join /
    // distinct / truth-join subtree (~4 shuffles × 4 configs). With the
    // config id as one more key column, all four ride ONE hot-band
    // groupBy, ONE anti-join, ONE band-equi pair join, ONE distinct and
    // ONE truth join — identical per-config semantics (every key is
    // (cfg, band_idx, band_key), so configs never cross), a quarter of
    // the stages. `cfg` = the config's band count (unique in the ladder).
    val allBands = TuningConfigs.map { case (bands, rows) =>
        Dedup.lshBands(sig, "doc_id", bands, rows).withColumn("cfg", lit(bands))
      }.reduce(_ unionByName _)
    // hot-band discovery is a partial-agg groupBy (map-side combined);
    // over-cap groups are few by definition, so the exclusion is a
    // broadcast anti-join — the banded frame never reshuffles for it
    val hot = allBands.groupBy(col("cfg"), col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("__m"))
      .where(col("__m") > maxBand)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    CacheScope.releaseAfterAction(s, hot)
    val hotStats = hot.groupBy(col("cfg")).agg(
      count(lit(1)).as("hot_bands"),
      sum(col("__m")).as("hot_band_docs"))
    val kept = allBands.join(
      broadcast(hot.select(col("cfg"), col("band_idx"), col("band_key"))),
      Seq("cfg", "band_idx", "band_key"), "left_anti")
    val pa = kept.select(col("doc_id").as("doc_a"),
      col("cfg"), col("band_idx"), col("band_key"))
    val pb = kept.select(col("doc_id").as("doc_b"),
      col("cfg"), col("band_idx"), col("band_key"))
    val cand = pa.join(pb, Seq("cfg", "band_idx", "band_key"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("cfg"), col("doc_a"), col("doc_b")).distinct()
    val candStats = cand
      .join(truth.withColumn("__hit", lit(1L)), Seq("doc_a", "doc_b"), "left")
      .groupBy(col("cfg"))
      .agg(count(lit(1)).as("candidates"),
        coalesce(sum(col("__hit")), lit(0L)).as("hits"))
    // a config with zero candidates / zero hot bands yields no grouped
    // row — the spine join + coalesce reproduces the old per-config
    // global aggregates' guaranteed zeros exactly
    import s.implicits._
    val spine = TuningConfigs.toDF("bands", "rows_per_band")
      .withColumn("cfg", col("bands"))
    spine
      .join(candStats, Seq("cfg"), "left")
      .join(hotStats, Seq("cfg"), "left")
      .select(col("bands"), col("rows_per_band"),
        coalesce(col("candidates"), lit(0L)).as("candidates"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(col("hot_bands"), lit(0L)).as("hot_bands"),
        coalesce(col("hot_band_docs"), lit(0L)).as("hot_band_docs"))
      .crossJoin(broadcast(truthCount))
      .withColumn("precision_bp", expr(
        "CASE WHEN candidates = 0 THEN NULL ELSE hits * 10000 div candidates END"))
      .withColumn("recall_bp", expr(
        "CASE WHEN true_pairs = 0 THEN NULL ELSE hits * 10000 div true_pairs END"))
      .orderBy(col("bands").desc)
  }

  /** The (bands, rowsPerBand) ladder the tuning card sweeps — every
    * config re-bands the same 16 minhashes. */
  private[graft] val TuningConfigs: Seq[(Int, Int)] =
    Seq((16, 1), (8, 2), (4, 4), (2, 8))

  /** C54: the inter-source duplication matrix — the dataset-card view
    * of WHERE the near-duplication lives: C3's MinHash candidate pairs
    * rolled up per unordered source pair (least/greatest normalizes the
    * cell), with the diagonal = within-source duplication. The overlap
    * question a mixture designer asks before weighting two crawls that
    * might be mirrors of each other. Plan: the band-equi pair join
    * (never all-pairs) + two broadcast-sized joins to the (doc_id,
    * source) map + a tiny S² aggregate. */
  def dedupSourceMatrix(s: SparkSession, dir: String): DataFrame = {
    val src = docs(s, dir).select(col("doc_id"), col("source"))
    Dedup.minhashCandidates(docs(s, dir), "doc_id", "text")
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("pairs"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** C58: winnowing-family document fingerprints (Schleimer et al.
    * SIGMOD 2003, the MOSS scheme) + pair overlap — the plagiarism/
    * mirror detector that keeps ~1/w of each document's shingle
    * hashes, chosen content-locally so near-identical passages select
    * identical fingerprints: a positional 3-gram hash is SELECTED when
    * it is the minimum of its ±4-position neighborhood (value-based —
    * no tie-order dependence, so both engines select the same set).
    * Fingerprint df-capped at 50 (the C2 hot-shingle guard), then the
    * sparse equi-join counts shared fingerprints per pair. Plan: one
    * shuffle by doc_id for the selection window, a ~1/9-density
    * fingerprint set (one per 2w+1 = 9 positions in expectation), an
    * equi-join that only ever touches selected hashes — never the full
    * shingle frame. */
  def dedupWinnow(s: SparkSession, dir: String): DataFrame = {
    // POSITIONAL shingles (the C45 idiom) — WordShingles would dedup
    // repeats, and winnowing selection is position-dependent.
    // doc-level hash-spread (round-15): the positional shingle explode +
    // md5 pass otherwise run inside the single-rowgroup scan task, and
    // the selection window below partitions on the same key, so no
    // second exchange appears (no-op on already-parallel inputs)
    val sh = Vectors.ensureParallelismBy(docs(s, dir), col("doc_id"))
      .select(col("doc_id"), Text.tokens(col("text")).as("ts"))
      .where(size(col("ts")) >= 3)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("ts")) - 2),
          i => concat_ws(" ", slice(col("ts"), i, lit(3))))).as(Seq("pos", "sh")))
      .select(col("doc_id"), col("pos"),
        conv(substring(md5(col("sh")), 1, 12), 16, 10).cast("long").as("h"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-4, 4)
    val sel = sh.withColumn("wmin", min(col("h")).over(win))
      .where(col("h") === col("wmin"))
      .select(col("doc_id"), col("h")).distinct()
    val keep = sel.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .where(col("df") <= 50).select(col("h"))
    val kept = sel.join(keep, Seq("h"))
    kept.as("a").join(kept.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= 3)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** C62: edit-distance-VERIFIED near-dup pairs — the two-stage shape
    * production fuzzy dedup actually ships (candidate generation by
    * sketch, confirmation by true string distance): C3's MinHash band
    * candidates are re-joined to the normalized texts and confirmed by
    * Levenshtein distance at <= 2.5% of the longer text (pure integer
    * predicate: dist*1000 <= max_len*25 — no float rounding to drift
    * between engines). MinHash alone admits band collisions and
    * token-set coincidences; the DP distance is the ground-truth check
    * that the bytes really are one edit-burst apart.
    *
    * Plan shape at 100 TB: the O(L^2) DP runs ONLY on the LSH-bounded
    * candidate list (never all-pairs), reached by two equi-joins on
    * doc_id that co-shuffle with the candidate frame; `levenshtein` is
    * a codegen'd built-in, and for long-document corpora Spark's
    * 3-arg `levenshtein(l, r, threshold)` early-exit variant bounds
    * each DP at O(threshold * L) — kept exact here for oracle parity. */
  def dedupEdit(s: SparkSession, dir: String): DataFrame = {
    val t = docs(s, dir).select(col("doc_id"), Text.normalized(col("text")).as("t"))
    Dedup.minhashCandidates(docs(s, dir), "doc_id", "text")
      .select(col("doc_a"), col("doc_b"))
      .join(t.select(col("doc_id").as("doc_a"), col("t").as("ta")), "doc_a")
      .join(t.select(col("doc_id").as("doc_b"), col("t").as("tb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ta"), col("tb")).cast("long").as("dist"),
        greatest(length(col("ta")), length(col("tb"))).cast("long").as("max_len"))
      .where(col("dist") * 1000 <= col("max_len") * 25)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** C64: cross-source overlap matrix from KMV SKETCHES — the question
    * C54 answers by joining near-dup pairs, answered here with NO JOIN
    * over content at all: one pass builds a k-minimum-values sketch of
    * each source's 3-gram shingle set ([[graft.functions.KmvSketch]]),
    * then every source pair's shingle-set Jaccard, union and
    * intersection sizes are ESTIMATED from the k-long sketch arrays
    * alone. The mixture-design probe for "are these two crawls
    * mirrors?" that still works when each source is 10 TB: the content
    * never shuffles (map-side partial sketches merge to k longs per
    * source, merge-order independent so the result is bit-stable), and
    * the pairwise stage runs on an S-row frame (S = source count) —
    * the S² work is on 256-element arrays, not documents. The shingle
    * hash is the md5-derived 60-bit value (the repo's parity hash —
    * SURVEY §4), so the ENTIRE estimator algebra replays in DuckDB and
    * the face hash-checks end to end: a sketch is data, and identical
    * hashes make both engines build identical sketches. KmvSpec
    * additionally bounds the error vs the exact per-pair Jaccard and
    * proves repartition-stability. */
  def corpusOverlapKmv(s: SparkSession, dir: String): DataFrame = {
    val k = 256
    // the S-row sketch frame feeds BOTH sides of the pairwise join — a
    // scoped persist runs the corpus pass once (PlanSpec pins the single
    // content shuffle); the cache is S×k longs, metadata-scale
    val sk = docs(s, dir)
      .select(col("source"), explode(Dedup.shingles(col("text"), 3)).as("sh"))
      .select(col("source"),
        conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long").as("h"))
      .groupBy(col("source"))
      .agg(graft.functions.KmvSketch(col("h"), k).as("kmv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    CacheScope.releaseAfterAction(s, sk)
    val a = sk.select(col("source").as("src_a"), col("kmv").as("ka"))
    val b = sk.select(col("source").as("src_b"), col("kmv").as("kb"))
    val jac = graft.functions.KmvSketch.jaccardEstimate(col("ka"), col("kb"), k)
    val uni = graft.functions.KmvSketch.distinctEstimate(
      graft.functions.KmvSketch.unionSketch(col("ka"), col("kb"), k), k,
      hashBits = 60)
    // S×S over the sketch frame: broadcast-tiny by construction (one
    // row per source), the audited exception to the no-cartesian rule
    a.join(b, col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        round(jac, 4).as("est_jaccard"),
        round(uni).cast("long").as("est_union"),
        round(jac * uni).cast("long").as("est_shared"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** C4: SimHash near-dup pairs at Hamming <= 3 (rows-only oracle). */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashCandidates(docs(s, dir), "doc_id", "text")
      .orderBy(col("doc_a"), col("doc_b"))

  /** C17: near-dup CLUSTERS — connected components over the MinHash
    * candidate pairs, one row per document with its cluster id (= min
    * doc_id in the component), cluster size, and the keeper flag. The
    * transitive step pair emitters can't do: A~B, B~C groups A and C. */
  def dedupCluster(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // CC consumes the spanning STAR edges, not the pair enumeration:
    // same components by construction, O(bucket) instead of O(bucket^2)
    // edges under skew (Dedup.minhashStarEdges scaladoc; round-14
    // verdict item 7)
    val edges = Dedup.minhashStarEdges(d, "doc_id", "text")
    val cc = Cluster.connectedComponentsAuto(d.select(col("doc_id")), edges, "doc_id")
      .withColumnRenamed("id", "doc_id")
    val sizes = cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        (col("doc_id") === col("cluster_id")).cast("int").as("is_keeper"))
      .orderBy(col("doc_id"))
  }

  /** C106: SPLIT-LEAKAGE audit — does any eval example have a training
    * TWIN? Deduplicating and splitting are both standard, but the
    * published failure mode is their composition: a doc-keyed fold coin
    * deals two near-duplicate documents to DIFFERENT folds, so the test
    * set silently grades memorized training content (the
    * train/test-contamination result the dedup literature keeps
    * re-finding). The card measures it AND ships the fix: per fold
    * pair, the count of exact-duplicate and near-duplicate pairs
    * straddling the folds under the NAIVE doc-keyed coin, next to the
    * same counts under the CLUSTER-KEYED coin (every member of a dup
    * cluster adopts its keeper's coin, so clusters land whole —
    * provably zero straddle, and the zeros are computed, not assumed).
    *
    * Edges = LSH-bounded MinHash candidates (the C3 plan) UNION
    * exact-content star edges — exact twins below the 3-token shingle
    * floor have no MinHash signature, so content groups link
    * explicitly; every duplicate relation the pipeline knows about is
    * an edge, which is what makes the clustered zeros a theorem.
    *
    * Scale shape: the near-dup pair join is band-bounded (never
    * all-pairs); exact-pair counts come from per-content fold COUNTS
    * (Σ n_a·n_b over the group's fold histogram — no pair join for a
    * mega-group); components are the C17 machinery; fold assignment is
    * the narrow content-keyed coin. SQL-checked end to end (recursive
    * CTE + the generated fold CASEs). */
  def dedupSplitLeakage(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // ONE signature/banding pass (round-15): the pair list (for counts)
    // and the star edges (for CC) previously each re-derived the
    // shingle → 16-minhash → band table from the raw corpus — the
    // face's single most expensive stage, paid twice. minhashSignature
    // materializes itself, so both deriveds re-band the same blocks.
    val bands = Dedup.bandFrame(d, "doc_id", "text")
    val nd = Dedup.candidatesFromBands(bands, "doc_id")
      .select(col("doc_a"), col("doc_b"))
    // the content-hash frame likewise feeds TWO consumers (exact star
    // edges + the exact leak counts), and a scoped persist would be
    // released by the CC loop's own internal actions before the second
    // consumer runs — an eager checkpoint (doc-count × one hash) holds
    // for the whole face
    val h = d.select(col("doc_id"),
        graft.ops.Text.contentHash(col("text")).as("h"))
      .localCheckpoint(true)
    val exactEdges = h
      .withColumn("m", min(col("doc_id")).over(Window.partitionBy(col("h"))))
      .where(col("doc_id") =!= col("m"))
      .select(col("m").as("doc_a"), col("doc_id").as("doc_b"))
    // the leak COUNTS below need the pair list (nd) — but CC only needs
    // connectivity, so its edge input is the spanning star set: same
    // components, skew-safe (round-14 verdict item 7)
    val edges = Dedup.starEdgesFromBands(bands, "doc_id").unionByName(exactEdges)
    val cc = Cluster.connectedComponentsAuto(d.select(col("doc_id")), edges, "doc_id")
      .withColumnRenamed("id", "doc_id")
    val folded = cc
      .withColumn("fold_naive",
        Sample.splitColumn(col("doc_id"), Sample.DemoCuts, "test"))
      .withColumn("fold_clustered",
        Sample.splitColumn(col("cluster_id"), Sample.DemoCuts, "test"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    CacheScope.releaseAfterAction(s, folded)
    // ONE enumeration of the near-dup pair stream for BOTH fold
    // spellings (round-15): the pair list is the face's dominant cost
    // (quadratic in the largest near-dup cluster by the answer's own
    // definition), so the naive/clustered counts ride the same pass —
    // each pair explodes into two tagged fold tuples and the tiny
    // (tag × fold × fold) aggregate is cached for its two consumers.
    val ndBoth = nd
      .join(folded.select(col("doc_id").as("doc_a"),
        col("fold_naive").as("na"), col("fold_clustered").as("ca")), Seq("doc_a"))
      .join(folded.select(col("doc_id").as("doc_b"),
        col("fold_naive").as("nb"), col("fold_clustered").as("cb")), Seq("doc_b"))
      .select(explode(array(
        struct(lit("naive").as("tag"), col("na").as("fa"), col("nb").as("fb")),
        struct(lit("clustered").as("tag"), col("ca").as("fa"), col("cb").as("fb"))))
        .as("t"))
      .select(col("t.tag").as("tag"), col("t.fa").as("fa"), col("t.fb").as("fb"))
      .where(col("fa") =!= col("fb"))
      .select(col("tag"), least(col("fa"), col("fb")).as("fold_a"),
        greatest(col("fa"), col("fb")).as("fold_b"))
      .groupBy(col("tag"), col("fold_a"), col("fold_b"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    CacheScope.releaseAfterAction(s, ndBoth)
    def ndLeaks(tag: String, name: String): DataFrame =
      ndBoth.where(col("tag") === tag)
        .select(col("fold_a"), col("fold_b"), col("n").as(name))
    // ONE enumeration for BOTH exact-leak spellings too (round-15, the
    // ndBoth pattern): the (h × fold) histogram explodes into two
    // tagged tuples, one groupBy + one self-join serve both fold
    // columns — previously each spelling re-joined h to folded and
    // re-ran its own histogram + pair join.
    val gfBoth = h
      .join(folded.select(col("doc_id"), col("fold_naive"), col("fold_clustered")),
        Seq("doc_id"))
      .select(col("h"), explode(array(
        struct(lit("naive").as("tag"), col("fold_naive").as("f")),
        struct(lit("clustered").as("tag"), col("fold_clustered").as("f"))))
        .as("t"))
      .groupBy(col("t.tag").as("tag"), col("h"), col("t.f").as("f"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    CacheScope.releaseAfterAction(s, gfBoth)
    val exBoth = gfBoth.select(col("tag"), col("h"), col("f").as("fa"), col("n").as("na"))
      .join(gfBoth.select(col("tag"), col("h"), col("f").as("fb"), col("n").as("nb")),
        Seq("tag", "h"))
      .where(col("fa") < col("fb"))
      .groupBy(col("tag"), col("fa").as("fold_a"), col("fb").as("fold_b"))
      .agg(sum(col("na") * col("nb")).as("n"))
    def exactLeaks(tag: String, name: String): DataFrame =
      exBoth.where(col("tag") === tag)
        .select(col("fold_a"), col("fold_b"), col("n").as(name))
    import s.implicits._
    val spine = Seq(("test", "train"), ("test", "val"), ("train", "val"))
      .toDF("fold_a", "fold_b")
    spine
      .join(exactLeaks("naive", "naive_exact_pairs"),
        Seq("fold_a", "fold_b"), "left")
      .join(ndLeaks("naive", "naive_neardup_pairs"),
        Seq("fold_a", "fold_b"), "left")
      .join(exactLeaks("clustered", "clustered_exact_pairs"),
        Seq("fold_a", "fold_b"), "left")
      .join(ndLeaks("clustered", "clustered_neardup_pairs"),
        Seq("fold_a", "fold_b"), "left")
      .select(col("fold_a"), col("fold_b"),
        coalesce(col("naive_exact_pairs"), lit(0L)).as("naive_exact_pairs"),
        coalesce(col("naive_neardup_pairs"), lit(0L)).as("naive_neardup_pairs"),
        coalesce(col("clustered_exact_pairs"), lit(0L)).as("clustered_exact_pairs"),
        coalesce(col("clustered_neardup_pairs"), lit(0L)).as("clustered_neardup_pairs"))
      .orderBy(col("fold_a"), col("fold_b"))
  }

  /** The C106 oracle: bands + exact star edges + recursive components +
    * both generated fold CASEs + the same pair arithmetic. (`lazy`:
    * textually above [[minhashBandCtes]] — a strict val would capture
    * the not-yet-initialized null.) */
  lazy val splitLeakageOracle: String = {
    def foldCase(idExpr: String): String = {
      val whens = Sample.DemoCuts.map { case (label, upTo) =>
        s"WHEN substr(md5('split|'||CAST($idExpr AS VARCHAR)),1,6) < '${Sample.hexThreshold(upTo)}' THEN '$label'"
      }.mkString("\n              ")
      s"CASE $whens\n              ELSE 'test' END"
    }
    s"""WITH RECURSIVE $minhashBandCtes,
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |    AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |hh AS (SELECT doc_id,
       |              md5(trim(regexp_replace(lower(text),'\\s+',' ','g'))) AS h
       |       FROM documents),
       |hm AS (SELECT h, min(doc_id) AS m FROM hh GROUP BY h),
       |ex AS (SELECT hm.m AS doc_a, hh.doc_id AS doc_b
       |       FROM hh JOIN hm USING (h) WHERE hh.doc_id <> hm.m),
       |alledges AS (SELECT doc_a, doc_b FROM pairs
       |             UNION SELECT doc_a, doc_b FROM ex),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM alledges
       |          UNION ALL SELECT doc_b, doc_a FROM alledges),
       |reach AS (
       |  SELECT doc_id AS node, doc_id AS lbl FROM documents
       |  UNION
       |  SELECT e.dst AS node, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
       |cl AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node),
       |folded AS (
       |  SELECT doc_id, cluster_id,
       |         ${foldCase("doc_id")} AS fold_naive,
       |         ${foldCase("cluster_id")} AS fold_clustered
       |  FROM cl),
       |ndn AS (
       |  SELECT least(x.fold_naive, y.fold_naive) AS fold_a,
       |         greatest(x.fold_naive, y.fold_naive) AS fold_b,
       |         count(*)::BIGINT AS naive_neardup_pairs
       |  FROM pairs p JOIN folded x ON p.doc_a = x.doc_id
       |               JOIN folded y ON p.doc_b = y.doc_id
       |  WHERE x.fold_naive <> y.fold_naive GROUP BY 1, 2),
       |ndc AS (
       |  SELECT least(x.fold_clustered, y.fold_clustered) AS fold_a,
       |         greatest(x.fold_clustered, y.fold_clustered) AS fold_b,
       |         count(*)::BIGINT AS clustered_neardup_pairs
       |  FROM pairs p JOIN folded x ON p.doc_a = x.doc_id
       |               JOIN folded y ON p.doc_b = y.doc_id
       |  WHERE x.fold_clustered <> y.fold_clustered GROUP BY 1, 2),
       |gfn AS (SELECT hh.h, f.fold_naive AS f, count(*)::BIGINT AS n
       |        FROM hh JOIN folded f USING (doc_id) GROUP BY 1, 2),
       |exn AS (
       |  SELECT a.f AS fold_a, b.f AS fold_b,
       |         sum(a.n * b.n)::BIGINT AS naive_exact_pairs
       |  FROM gfn a JOIN gfn b ON a.h = b.h AND a.f < b.f GROUP BY 1, 2),
       |gfc AS (SELECT hh.h, f.fold_clustered AS f, count(*)::BIGINT AS n
       |        FROM hh JOIN folded f USING (doc_id) GROUP BY 1, 2),
       |exc AS (
       |  SELECT a.f AS fold_a, b.f AS fold_b,
       |         sum(a.n * b.n)::BIGINT AS clustered_exact_pairs
       |  FROM gfc a JOIN gfc b ON a.h = b.h AND a.f < b.f GROUP BY 1, 2),
       |spine AS (SELECT * FROM (VALUES ('test','train'), ('test','val'),
       |                                ('train','val')) AS t(fold_a, fold_b))
       |SELECT s.fold_a, s.fold_b,
       |       coalesce(exn.naive_exact_pairs, 0)::BIGINT AS naive_exact_pairs,
       |       coalesce(ndn.naive_neardup_pairs, 0)::BIGINT AS naive_neardup_pairs,
       |       coalesce(exc.clustered_exact_pairs, 0)::BIGINT AS clustered_exact_pairs,
       |       coalesce(ndc.clustered_neardup_pairs, 0)::BIGINT AS clustered_neardup_pairs
       |FROM spine s
       |LEFT JOIN exn USING (fold_a, fold_b)
       |LEFT JOIN ndn USING (fold_a, fold_b)
       |LEFT JOIN exc USING (fold_a, fold_b)
       |LEFT JOIN ndc USING (fold_a, fold_b)
       |ORDER BY s.fold_a, s.fold_b""".stripMargin
  }

  /** C70: QUALITY-AWARE keeper selection for near-dup clusters — which
    * copy to keep is a real decision (dup clusters mix a clean original
    * with truncated/mangled mirrors), and the C17 min-id rule is only
    * the deterministic default. Here every multi-member cluster keeps
    * its HIGHEST-QUALITY member (the C9 score, doc_id tie-break) and
    * the card reports where that differs from min-id (it does for ~1/4
    * of this corpus's clusters — spec-pinned non-vacuous). Parity note:
    * the score is IEEE-exact arithmetic on integer token stats, so both
    * engines rank identically; the window runs per cluster (bounded by
    * the largest dup cluster, never the corpus). */
  def dedupKeeperQuality(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // star-edge CC input (see dedupCluster) — components identical
    val edges = Dedup.minhashStarEdges(d, "doc_id", "text")
    val cc = Cluster.connectedComponentsAuto(d.select(col("doc_id")), edges, "doc_id")
      .withColumnRenamed("id", "doc_id")
    val sized = cc.withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .where(col("cluster_size") >= 2)
    val q = TextQueries.qualityScores(s, dir).select(col("doc_id"), col("q"))
    val ranked = sized.join(q, Seq("doc_id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("cluster_id")).orderBy(col("q").desc, col("doc_id"))))
    ranked.where(col("rk") === 1)
      .select(col("cluster_id"), col("cluster_size").cast("long").as("cluster_size"),
        col("doc_id").as("keeper_doc"),
        // integer bp via floor(x+0.5) — pure double arithmetic, identical
        // in both engines (round-to-4dp is decimal-vs-binary ambiguous at
        // half boundaries: 0.84025 rounded 0.8402 vs 0.8403 cross-engine)
        floor(col("q") * 10000 + 0.5).cast("long").as("keeper_q_bp"),
        (col("cluster_size") - 1).cast("long").as("dropped"),
        (col("doc_id") =!= col("cluster_id")).cast("int").as("beats_min_id"))
      .orderBy(col("cluster_id"))
  }

  /** C36: INCREMENTAL dedup — the daily-batch shape every standing
    * corpus actually runs: probe only the incoming slice (here docs with
    * `doc_id % 5 = 4`, the "new batch") against the standing corpus's
    * indexes, never re-pair the whole corpus. Three probe faces, coarse
    * to fine: exact content hash, order-insensitive fingerprint, and
    * MinHash-band collision (the C3 signature — an incoming doc is a
    * near-dup CANDIDATE when any of its 4 band keys already exists in
    * the standing corpus's band table).
    *
    * Plan shape at 100 TB: the standing side collapses to three
    * key-distinct index frames (hash set, fingerprint set, band table) —
    * in production these are materialized once and maintained
    * incrementally, so a daily run's cost is bounded by the BATCH size
    * plus one equi-join per index, all on uniformly-distributed md5 keys
    * (no skew by construction). Nothing ever pairs incoming×incoming or
    * rescans the standing corpus's text. Per-source report; `dup_exact`
    * is legitimately 0 below sf0.1 (the synthetic corpus has no exact
    * dups there — `dedup_exact` reports the same), while the fingerprint
    * and band faces carry signal at every SF. */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val isNew = col("doc_id") % 5 === 4
    // NOT cached deliberately: keyed/bands each feed consumers that
    // filter DISJOINT slices (is_new vs !is_new, pushed into the
    // scans), so the "repeated" passes together do one corpus's work —
    // a persist would add a full materialization and save nothing
    // (measured: 2.8 s either way at sf0.1)
    val keyed = d.select(col("doc_id"), col("source"),
      Text.contentHash(col("text")).as("h"),
      Text.fingerprint(col("text")).as("fp"),
      isNew.as("is_new"))
    val bands = Dedup.lshBands(
        Dedup.minhashSignature(Dedup.shingleFrame(d, "doc_id", "text", 3),
          "doc_id", 16), "doc_id", 4, 4)
      .withColumn("is_new", isNew)
    val exBands = bands.where(!col("is_new"))
      .select(col("band_idx"), col("band_key")).distinct()
    val nearHit = bands.where(col("is_new"))
      .join(exBands, Seq("band_idx", "band_key"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("m_near", lit(1L))
    val exH = keyed.where(!col("is_new")).select(col("h")).distinct()
      .withColumn("m_h", lit(1L))
    val exFp = keyed.where(!col("is_new")).select(col("fp")).distinct()
      .withColumn("m_fp", lit(1L))
    keyed.where(col("is_new"))
      .join(exH, Seq("h"), "left")
      .join(exFp, Seq("fp"), "left")
      .join(nearHit, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("incoming_docs"),
        sum(coalesce(col("m_h"), lit(0L))).as("dup_exact"),
        sum(coalesce(col("m_fp"), lit(0L))).as("dup_reorder"),
        sum(coalesce(col("m_near"), lit(0L))).as("dup_near"),
        sum(when(col("m_h").isNull && col("m_fp").isNull && col("m_near").isNull,
          1L).otherwise(0L)).as("new_docs"))
      .orderBy(col("source"))
  }

  /** C49: Bloom-filter incremental dedup probe — the C36 membership
    * check with the standing corpus collapsed to a BLOOM SKETCH before
    * any join runs. `bloom_filter_agg` (Spark's own mergeable
    * TypedImperativeAggregate, SQL-exposed via [[graft.GraftExtensions]])
    * builds the corpus-fingerprint filter in one distributed pass; the
    * incoming batch probes it with `might_contain` as a SCAN-LOCAL
    * predicate (the filter arrives as a scalar-subquery result — the
    * exact mechanism Spark's InjectRuntimeFilter uses for its own
    * runtime row-filters), so only bloom-positives — true duplicates
    * plus the εN false-positive margin — ever enter the exact confirm
    * semi-join. At 100 TB: the standing index's billions of keys become
    * a few hundred MB of bits broadcast to every task, the batch never
    * shuffles for the negatives (the overwhelming majority), and the
    * confirm join's probe side shrinks by ~1/FPP. Blooms can never
    * false-negative, and the confirm join removes the false positives,
    * so the result is EXACTLY the plain semi-join's — SQL-checked
    * against the bloom-free oracle. Keyed on the reorder fingerprint
    * ([[Text.fingerprint]]), the dup class this corpus exhibits at
    * every SF. */
  def dedupBloom(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(s)
    bloomKeyed(s, dir).createOrReplaceTempView("bloom_probe_docs")
    s.sql(s"""
      WITH corpus AS (SELECT DISTINCT fp FROM bloom_probe_docs WHERE NOT is_new),
           batch AS (SELECT doc_id, source, fp FROM bloom_probe_docs WHERE is_new),
           cand AS (
             SELECT batch.* FROM batch
             WHERE might_contain(
               (SELECT bloom_filter_agg(xxhash64(fp), $bloomEstItems) FROM corpus),
               xxhash64(fp)))
      SELECT cand.doc_id, cand.source
      FROM cand LEFT SEMI JOIN corpus ON cand.fp = corpus.fp
      ORDER BY cand.doc_id""")
  }

  /** The bloom-positive candidate stage of [[dedupBloom]] alone (no
    * confirm join) — exposed so the spec can measure the pruning and
    * the false-positive margin the confirm join pays for. */
  def dedupBloomCandidates(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(s)
    bloomKeyed(s, dir).createOrReplaceTempView("bloom_probe_docs")
    s.sql(s"""
      WITH corpus AS (SELECT DISTINCT fp FROM bloom_probe_docs WHERE NOT is_new)
      SELECT doc_id, source, fp FROM bloom_probe_docs
      WHERE is_new AND might_contain(
        (SELECT bloom_filter_agg(xxhash64(fp), $bloomEstItems) FROM corpus),
        xxhash64(fp))""")
  }

  /** Sized for the corpus KEY count (distinct fingerprints), not the
    * row count — over-sizing only lowers the FPP. ~1.2 MB of bits at
    * this estimate; at a 10^9-key corpus the same expression yields a
    * ~1.2 GB filter, the documented trade for a shuffle-free negative
    * path. */
  private val bloomEstItems = 1 << 20

  private def bloomKeyed(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), col("source"),
      Text.fingerprint(col("text")).as("fp"),
      (col("doc_id") % 5 === 4).as("is_new"))

  /** C49 oracle: the identical membership semantics with no bloom —
    * a plain IN-subquery over the corpus fingerprints. */
  val bloomOracle: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |         md5(array_to_string(list_sort(list_distinct(
      |           string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' '))),' ')) AS fp
      |  FROM documents),
      |corpus AS (SELECT DISTINCT fp FROM d WHERE doc_id % 5 <> 4)
      |SELECT doc_id, source FROM d
      |WHERE doc_id % 5 = 4 AND fp IN (SELECT fp FROM corpus)
      |ORDER BY doc_id""".stripMargin

  /** Shared oracle-SQL fragment: normalized token array per doc. */
  private val toksCte =
    """toks AS (
      |  SELECT doc_id,
      |         string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ') AS w
      |  FROM documents),
      |sh0 AS (
      |  SELECT DISTINCT doc_id, w[i]||' '||w[i+1]||' '||w[i+2] AS s
      |  FROM toks, unnest(generate_series(1, len(w)-2)) AS t(i)
      |  WHERE len(w) >= 3)""".stripMargin

  val jaccardOracle: String =
    s"""WITH $toksCte,
       |keep AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 100),
       |sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN keep USING (s)),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |pr AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
       |       FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2)
       |SELECT i AS doc_a, j AS doc_b, cast(c AS BIGINT) AS common,
       |       round(c::DOUBLE/(x.n+y.n-c), 4) AS jaccard
       |FROM pr JOIN sz x ON pr.i = x.doc_id JOIN sz y ON pr.j = y.doc_id
       |WHERE c::DOUBLE/(x.n+y.n-c) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Shared CTE chain producing the LSH band table, generated from the
    * same (numHashes, numBands) constants the Spark plan uses. */
  private val minhashBandCtes: String = {
    val numHashes = 16; val numBands = 4; val rows = numHashes / numBands
    val mins = (0 until numHashes)
      .map(k => s"    min(md5('$k|'||s)) AS m$k").mkString(",\n")
    val bandSelects = (0 until numBands).map { b =>
      val ms = (0 until rows).map(r => s"m${b * rows + r}").mkString("||'|'||")
      s"  SELECT doc_id, $b AS band_idx, md5($ms) AS band_key FROM sig"
    }.mkString("\n  UNION ALL\n")
    s"""$toksCte,
       |sig AS (
       |  SELECT doc_id,
       |$mins
       |  FROM sh0 GROUP BY doc_id),
       |bands AS (
       |$bandSelects)""".stripMargin
  }

  val minhashOracle: String =
    s"""WITH $minhashBandCtes
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_bands
       |FROM bands a JOIN bands b
       |  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |  AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** C99 oracle: generated from the SAME TuningConfigs ladder — the 16
    * signature mins once, one band CTE + candidate/hit aggregate per
    * config, the C2 jaccard CTEs as ground truth, UNION ALL + bp
    * arithmetic. */
  val minhashTuningOracle: String = {
    val mins = (0 until 16).map(k => s"    min(md5('$k|'||s)) AS m$k").mkString(",\n")
    val bandCtes = TuningConfigs.map { case (b, r) =>
      val sel = (0 until b).map { i =>
        val ms = (0 until r).map(j => s"m${i * r + j}").mkString("||'|'||")
        s"  SELECT doc_id, $i AS band_idx, md5($ms) AS band_key FROM sig"
      }.mkString("\n  UNION ALL\n")
      s"bands_$b AS (\n$sel)"
    }.mkString(",\n")
    val cardCtes = TuningConfigs.map { case (b, r) =>
      s"""hot_$b AS (
         |  SELECT band_idx, band_key, count(*) AS m FROM bands_$b
         |  GROUP BY 1, 2 HAVING count(*) > 64),
         |hotstat_$b AS (
         |  SELECT count(*)::BIGINT AS hot_bands,
         |         coalesce(sum(m), 0)::BIGINT AS hot_band_docs FROM hot_$b),
         |kept_$b AS (
         |  SELECT bands_$b.* FROM bands_$b
         |  ANTI JOIN hot_$b USING (band_idx, band_key)),
         |card_$b AS (
         |  SELECT $b AS bands, $r AS rows_per_band,
         |         count(*)::BIGINT AS candidates,
         |         count(t.doc_a)::BIGINT AS hits,
         |         (SELECT hot_bands FROM hotstat_$b) AS hot_bands,
         |         (SELECT hot_band_docs FROM hotstat_$b) AS hot_band_docs
         |  FROM (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |        FROM kept_$b a JOIN kept_$b b
         |          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |          AND a.doc_id < b.doc_id) c
         |  LEFT JOIN truth t ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b)""".stripMargin
    }.mkString(",\n")
    val unioned = TuningConfigs.map { case (b, _) => s"SELECT * FROM card_$b" }
      .mkString(" UNION ALL ")
    s"""WITH $toksCte,
       |keep AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 100),
       |shc AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN keep USING (s)),
       |sz AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
       |pr AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
       |       FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2),
       |truth AS (
       |  SELECT i AS doc_a, j AS doc_b
       |  FROM pr JOIN sz x ON pr.i = x.doc_id JOIN sz y ON pr.j = y.doc_id
       |  WHERE c::DOUBLE/(x.n+y.n-c) >= 0.5),
       |tc AS (SELECT count(*)::BIGINT AS true_pairs FROM truth),
       |sig AS (
       |  SELECT doc_id,
       |$mins
       |  FROM sh0 GROUP BY doc_id),
       |$bandCtes,
       |$cardCtes
       |SELECT bands, rows_per_band, candidates, hits, hot_bands,
       |       hot_band_docs, tc.true_pairs,
       |       CASE WHEN candidates = 0 THEN NULL
       |            ELSE hits * 10000 // candidates END AS precision_bp,
       |       CASE WHEN true_pairs = 0 THEN NULL
       |            ELSE hits * 10000 // true_pairs END AS recall_bp
       |FROM ($unioned) u, tc
       |ORDER BY bands DESC""".stripMargin
  }

  /** C64 oracle: the KMV sketches and the whole estimator algebra
    * replayed in SQL — per source, the 256 smallest distinct 60-bit
    * md5 shingle hashes (a sketch is DATA: identical hashes give both
    * engines identical sketches), then per pair the union-trim sketch,
    * the both-members Jaccard fraction, and (k−1)/u_(k) with the
    * 60-bit unit map, rounded exactly as the face rounds. */
  val kmvOracle: String =
    s"""WITH $toksCte,
       |shs AS (
       |  SELECT DISTINCT d.source,
       |         CAST(concat('0x', substr(md5(sh0.s), 1, 15)) AS BIGINT) AS h
       |  FROM sh0 JOIN documents d USING (doc_id)),
       |rk AS (SELECT source, h,
       |              row_number() OVER (PARTITION BY source ORDER BY h) AS r
       |       FROM shs),
       |sk AS (SELECT source, list(h ORDER BY h) AS kmv
       |       FROM rk WHERE r <= 256 GROUP BY source),
       |pairs AS (
       |  SELECT a.source AS src_a, b.source AS src_b,
       |         list_slice(list_sort(list_distinct(list_concat(a.kmv, b.kmv))),
       |                    1, 256) AS u,
       |         a.kmv AS ka, b.kmv AS kb
       |  FROM sk a JOIN sk b ON a.source < b.source),
       |est AS (
       |  SELECT src_a, src_b,
       |         CASE WHEN len(u) = 0 THEN 0.0::DOUBLE
       |              ELSE len(list_filter(u, v -> list_contains(ka, v)
       |                                       AND list_contains(kb, v)))::DOUBLE
       |                   / len(u) END AS jac,
       |         CASE WHEN len(u) < 256 THEN len(u)::DOUBLE
       |              ELSE 255::DOUBLE
       |                   / (u[256]::DOUBLE / 1152921504606846976::DOUBLE) END AS uni
       |  FROM pairs)
       |SELECT src_a, src_b, round(jac, 4) AS est_jaccard,
       |       round(uni)::BIGINT AS est_union,
       |       round(jac * uni)::BIGINT AS est_shared
       |FROM est ORDER BY src_a, src_b""".stripMargin

  /** C4 oracle: the 60-bit SimHash re-spelled as the exploded
    * 60-aggregate (the construction [[graft.functions.SimHash64]]
    * collapses into one native pass — its own spec proves the two
    * spellings equal): token hash = first 15 hex chars of md5 parsed as
    * a 60-bit integer (the winnowOracle hex-cast pattern), per-bit
    * occurrence-weighted ±1 sums, bit set iff strictly positive; a
    * token-less document keeps signature 0 via the LEFT JOIN (matching
    * the native pass, which sums nothing); then the same 4×15-bit
    * banding, distinct pair join, and Hamming ≤ 3 confirm via
    * xor + bit_count. */
  val simhashOracle: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |         unnest(string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ')) AS w
      |  FROM documents),
      |t2 AS (SELECT doc_id, w FROM toks WHERE w <> ''),
      |h AS (SELECT doc_id,
      |             CAST(concat('0x', substr(md5(w), 1, 15)) AS BIGINT) AS h
      |      FROM t2),
      |bits AS (
      |  SELECT doc_id, t.bit,
      |         sum(CASE WHEN (h >> t.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
      |  FROM h, unnest(generate_series(0, 59)) AS t(bit)
      |  GROUP BY 1, 2),
      |sig0 AS (
      |  SELECT doc_id,
      |         sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
      |  FROM bits GROUP BY 1),
      |sig AS (
      |  SELECT d.doc_id, coalesce(sig0.simhash, 0::BIGINT) AS simhash
      |  FROM documents d LEFT JOIN sig0 USING (doc_id)),
      |banded AS (
      |  SELECT doc_id, simhash, t.i AS band_idx,
      |         (simhash >> (t.i * 15)) & 32767 AS band_val
      |  FROM sig, unnest(generate_series(0, 3)) AS t(i)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |         bit_count(xor(a.simhash, b.simhash)) AS hamming
      |  FROM banded a JOIN banded b
      |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
      |    AND a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= 3
      |ORDER BY doc_a, doc_b""".stripMargin

  /** C58 oracle: positional shingle hashes, the same ±4 local-minimum
    * selection (value-based, tie-order-free), df cap, pair overlap. */
  val winnowOracle: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |         string_split(trim(regexp_replace(lower(text),'\s+',' ','g')),' ') AS w
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, i AS pos,
      |         CAST(concat('0x', substr(md5(w[i]||' '||w[i+1]||' '||w[i+2]),1,12))
      |              AS BIGINT) AS h
      |  FROM toks, unnest(generate_series(1, len(w)-2)) AS t(i)
      |  WHERE len(w) >= 3),
      |sel AS (
      |  SELECT DISTINCT doc_id, h FROM (
      |    SELECT doc_id, h,
      |           min(h) OVER (PARTITION BY doc_id ORDER BY pos
      |             ROWS BETWEEN 4 PRECEDING AND 4 FOLLOWING) AS wmin
      |    FROM sh)
      |  WHERE h = wmin),
      |keep AS (SELECT h FROM sel GROUP BY h HAVING count(*) <= 50),
      |kept AS (SELECT sel.doc_id, sel.h FROM sel JOIN keep USING (h))
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |       cast(count(*) AS BIGINT) AS shared
      |FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
      |GROUP BY 1, 2 HAVING count(*) >= 3
      |ORDER BY doc_a, doc_b""".stripMargin

  /** C62 oracle: the generated band CTEs + DuckDB's own `levenshtein`
    * (both engines implement the classic unit-cost edit distance) with
    * the identical integer threshold predicate. */
  val editOracle: String =
    s"""WITH $minhashBandCtes,
       |cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |    AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |t AS (SELECT doc_id, trim(regexp_replace(lower(text),'\\s+',' ','g')) AS t
       |      FROM documents)
       |SELECT doc_a, doc_b,
       |       CAST(levenshtein(x.t, y.t) AS BIGINT) AS dist,
       |       CAST(greatest(len(x.t), len(y.t)) AS BIGINT) AS max_len
       |FROM cand JOIN t x ON cand.doc_a = x.doc_id
       |          JOIN t y ON cand.doc_b = y.doc_id
       |WHERE levenshtein(x.t, y.t) * 1000 <= greatest(len(x.t), len(y.t)) * 25
       |ORDER BY doc_a, doc_b""".stripMargin

  /** C54 oracle: the generated band CTEs + the same rollup (defined
    * after [[minhashBandCtes]] — object vals initialize in order). */
  val sourceMatrixOracle: String =
    s"""WITH $minhashBandCtes,
       |p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |    AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |s AS (SELECT doc_id, source FROM documents)
       |SELECT least(sa.source, sb.source) AS src_a,
       |       greatest(sa.source, sb.source) AS src_b,
       |       count(*) AS pairs
       |FROM p JOIN s sa ON p.doc_a = sa.doc_id
       |       JOIN s sb ON p.doc_b = sb.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** C36 oracle: same band CTEs, split by the batch rule, membership
    * probes as IN-subqueries. */
  val incrementalOracle: String =
    s"""WITH $minhashBandCtes,
       |keyed AS (
       |  SELECT doc_id, source,
       |         md5(trim(regexp_replace(lower(text),'\\s+',' ','g'))) AS h,
       |         md5(array_to_string(list_sort(list_distinct(
       |           string_split(trim(regexp_replace(lower(text),'\\s+',' ','g')),' '))),' ')) AS fp,
       |         doc_id % 5 = 4 AS is_new
       |  FROM documents),
       |exb AS (SELECT DISTINCT band_idx, band_key
       |        FROM bands JOIN keyed USING (doc_id) WHERE NOT is_new),
       |nearhit AS (SELECT DISTINCT b.doc_id
       |            FROM bands b JOIN keyed k USING (doc_id)
       |            JOIN exb ON b.band_idx = exb.band_idx
       |                    AND b.band_key = exb.band_key
       |            WHERE k.is_new)
       |SELECT source, count(*) AS incoming_docs,
       |  cast(sum(CASE WHEN h IN (SELECT h FROM keyed WHERE NOT is_new)
       |             THEN 1 ELSE 0 END) AS BIGINT) AS dup_exact,
       |  cast(sum(CASE WHEN fp IN (SELECT fp FROM keyed WHERE NOT is_new)
       |             THEN 1 ELSE 0 END) AS BIGINT) AS dup_reorder,
       |  cast(sum(CASE WHEN doc_id IN (SELECT doc_id FROM nearhit)
       |             THEN 1 ELSE 0 END) AS BIGINT) AS dup_near,
       |  cast(sum(CASE WHEN h NOT IN (SELECT h FROM keyed WHERE NOT is_new)
       |             AND fp NOT IN (SELECT fp FROM keyed WHERE NOT is_new)
       |             AND doc_id NOT IN (SELECT doc_id FROM nearhit)
       |             THEN 1 ELSE 0 END) AS BIGINT) AS new_docs
       |FROM keyed WHERE is_new GROUP BY source ORDER BY source""".stripMargin

  /** C17 oracle: reachability via a recursive CTE over the same pairs —
    * every (node, reachable label), min per node = the component label. */
  val clusterOracle: String =
    s"""WITH RECURSIVE $minhashBandCtes,
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |    AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT doc_id AS node, doc_id AS lbl FROM documents
       |  UNION
       |  SELECT e.dst AS node, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
       |cl AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node),
       |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM cl GROUP BY cluster_id)
       |SELECT cl.doc_id, cl.cluster_id, sz.cluster_size,
       |       CASE WHEN cl.doc_id = cl.cluster_id THEN 1 ELSE 0 END AS is_keeper
       |FROM cl JOIN sz USING (cluster_id)
       |ORDER BY doc_id""".stripMargin
  /** C70 oracle: the recursive-CTE clusters + the C9 score formula +
    * the same per-cluster rank. */
  val keeperQualityOracle: String =
    s"""WITH RECURSIVE $minhashBandCtes,
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |    AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT doc_id AS node, doc_id AS lbl FROM documents
       |  UNION
       |  SELECT e.dst AS node, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
       |cl AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node),
       |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM cl
       |       GROUP BY cluster_id HAVING count(*) >= 2),
       |qm AS (
       |  SELECT doc_id,
       |    cast(len(string_split(norm,' ')) AS DOUBLE) AS n_tok,
       |    cast(len(list_filter(string_split(norm,' '),
       |         x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE) AS n_stop,
       |    cast(length(replace(norm,' ','')) AS DOUBLE) AS n_alpha
       |  FROM (SELECT doc_id, trim(regexp_replace(lower(text),'\\s+',' ','g')) AS norm
       |        FROM documents)),
       |q AS (
       |  SELECT doc_id,
       |    0.4*least(n_tok/100.0,1.0) + 0.3*least((n_stop/n_tok)*10.0,1.0)
       |      + 0.3*(CASE WHEN n_alpha/n_tok >= 3.0 AND n_alpha/n_tok <= 8.0
       |                  THEN 1.0 ELSE 0.0 END) AS q
       |  FROM qm),
       |r AS (
       |  SELECT cl.cluster_id, sz.cluster_size, cl.doc_id, q.q,
       |         row_number() OVER (PARTITION BY cl.cluster_id
       |                            ORDER BY q.q DESC, cl.doc_id) AS rk
       |  FROM cl JOIN sz USING (cluster_id) JOIN q USING (doc_id))
       |SELECT cluster_id, cluster_size, doc_id AS keeper_doc,
       |       CAST(floor(q * 10000 + 0.5) AS BIGINT) AS keeper_q_bp,
       |       cluster_size - 1 AS dropped,
       |       CAST(doc_id <> cluster_id AS INT) AS beats_min_id
       |FROM r WHERE rk = 1 ORDER BY cluster_id""".stripMargin
}
