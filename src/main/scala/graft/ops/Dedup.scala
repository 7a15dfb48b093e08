package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for document corpora (SURVEY §2.C C2–C4).
  *
  * Scale design (100 TB): every algorithm here is bucket-first — the only
  * joins are equi-joins on shingle / LSH-band keys, never a cross join, so
  * candidate generation is bounded by bucket sizes rather than n². The
  * Jaccard path additionally caps shingle document-frequency (hot-shingle
  * skew guard: a shingle shared by D docs would otherwise emit D²/2 join
  * rows); MinHash/SimHash need no cap because their joins run on band
  * keys, whose groups are duplicate clusters by construction.
  *
  * Everything is md5-derived so the DuckDB oracle reproduces signatures
  * bit-for-bit (SURVEY §4: integer math + md5 are parity-safe).
  */
object Dedup {

  /** Word n-gram shingles (distinct, space-joined) of a text column —
    * one native codegen'd pass ([[graft.functions.WordShingles]]; the
    * transform/array_distinct spelling evaluated interpreted per element
    * and dominated the dedup runtime). */
  def shingles(text: Column, n: Int): Column =
    graft.functions.WordShingles(text, n)

  /** Exploded (id, shingle) frame for a document frame.
    *
    * The DOC frame is hash-spread by id first (round-15): the explode
    * and everything computed on its output (the k-md5 MinHashes pass,
    * shingle hashing) otherwise run inside the scan task, and a
    * single-rowgroup parquet input pins that to ONE task on a 32-core
    * box (measured: the whole sf0.1 minhash pass as one 1.8 s task).
    * Exchanging the raw docs is far cheaper than exchanging the
    * ~100×-larger exploded shingle stream, and downstream per-doc
    * aggregates cluster on the same key. No-op on already-parallel
    * inputs — the at-scale case keeps its unshuffled scan. */
  def shingleFrame(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    Vectors.ensureParallelismBy(docs, col(idCol))
      .select(col(idCol), explode(shingles(col(textCol), n)).as("s"))

  /** Drop shingles whose document frequency exceeds `maxDf` (the skew
    * guard — mirrors stopword-shingle removal in production dedup).
    * Two-phase: a `groupBy(s).count` discovers over-cap shingles with
    * map-side partial aggregation — no task ever buffers a hot shingle's
    * rows, where the previous count-window over `s` put a 100M-row
    * boilerplate shingle into ONE WindowExec task and made it the job's
    * wall clock. Over-cap shingles are few by definition (each needs
    * > maxDf documents), so the hot set is broadcast-sized and the filter
    * is a narrow broadcast ANTI-join — the exploded frame itself is never
    * re-shuffled here. */
  def capDocFrequency(shingled: DataFrame, maxDf: Int): DataFrame = {
    val hot = shingled.groupBy(col("s")).agg(count(lit(1)).as("__df"))
      .where(col("__df") > maxDf)
      .select(col("s"))
    shingled.join(broadcast(hot), Seq("s"), "left_anti")
  }

  /** Candidate pairs with shingle-set Jaccard >= `minJaccard`.
    * Plan: explode → df-cap → equi-self-join on shingle → pair counts →
    * Jaccard against per-doc set sizes. Output: (doc_a, doc_b, common,
    * jaccard). */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, maxDf: Int = 100, minJaccard: Double = 0.5,
                   persistShingles: Boolean = false): DataFrame = {
    // The capped shingle frame feeds three consumers (per-doc sizes and
    // both self-join sides). `persistShingles` caches it (MEMORY_AND_DISK)
    // so the explode + df-cap shuffle runs once instead of per consumer;
    // the cache is scoped to the caller's next action (CacheScope), so a
    // long-lived session never accumulates dead shingle caches. The
    // default recomputes and caches nothing.
    // (shingleFrame spreads the doc side by id, so the explode itself
    // parallelizes; the join/cap exchanges on `s` are unchanged)
    val sh0 = capDocFrequency(shingleFrame(docs, idCol, textCol, n), maxDf)
    val sh = if (persistShingles) {
      val p = sh0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      CacheScope.releaseAfterAction(docs.sparkSession, p)
      p
    } else sh0
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val a = sh.select(col(idCol).as("doc_a"), col("s"))
    val b = sh.select(col(idCol).as("doc_b"), col("s"))
    val common = a.join(b, a("s") === b("s") && col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col(idCol).as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col(idCol).as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")))
      .where(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("common"),
        round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash signature columns m0..m{k-1}: per permutation k the min (lex)
    * of md5("k|" + shingle) — one groupBy computes all k mins, so the
    * shingle explosion is scanned once regardless of k. The k hashes per
    * row come from ONE native expression pass
    * ([[graft.functions.MinHashes]]: single byte conversion, thread-local
    * digest) instead of k independent concat→md5 trees. */
  def minhashSignature(shingled: DataFrame, idCol: String, numHashes: Int,
                       materialize: Boolean = true): DataFrame = {
    // (shingleFrame spreads the doc side by id, so the k-md5 MinHashes
    // projection below runs parallel with map-side partial aggregation)
    val sigs = shingled.withColumn("__sigs",
      graft.functions.MinHashes(col("s"), numHashes))
    val sig = sigs.groupBy(col(idCol))
      .agg(
        min(element_at(col("__sigs"), 1)).as("m0"),
        (1 until numHashes).map(k =>
          min(element_at(col("__sigs"), k + 1)).as(s"m$k")): _*)
    // Materialize by default (round-15): every band consumer feeds the
    // signature into ≥2 plan subtrees (both sides of the pair self-join,
    // or the star min + its join-back), and Spark does not dedupe common
    // subtrees across a join — the formatted plan of `dedup_minhash`
    // showed the whole shingle→minhash→agg pipeline TWICE, one copy
    // inside a BroadcastExchange. One eager localCheckpoint (doc-count ×
    // 16 hashes — far smaller than the corpus text) runs the pipeline
    // once and every consumer scans blocks. Single-consumer callers
    // (index writers) pass materialize = false and keep the streaming
    // one-pass shape.
    if (materialize) sig.localCheckpoint(true) else sig
  }

  /** LSH banding: (id, band_idx, band_key) with band_key = md5 of the
    * band's row minhashes joined by '|'. */
  def lshBands(sig: DataFrame, idCol: String, numBands: Int, rowsPerBand: Int): DataFrame = {
    val bandKeys = (0 until numBands).map { b =>
      val ms = (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}"))
      md5(concat_ws("|", ms: _*))
    }
    sig.select(col(idCol), posexplode(array(bandKeys: _*)).as(Seq("band_idx", "band_key")))
  }

  /** MinHash-LSH candidate pairs: docs sharing >= 1 band. Output:
    * (doc_a, doc_b, shared_bands). The join key is (band_idx, band_key) —
    * bucket-local, no cross join. */
  /** The (id, band_idx, band_key) table the default 16×4 MinHash faces
    * share — exposed so a face needing BOTH the pair enumeration and
    * the star edges (C106) computes the signature pass once. */
  def bandFrame(docs: DataFrame, idCol: String, textCol: String,
                n: Int = 3, numHashes: Int = 16, numBands: Int = 4): DataFrame =
    lshBands(minhashSignature(shingleFrame(docs, idCol, textCol, n), idCol, numHashes),
      idCol, numBands, numHashes / numBands)

  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, numHashes: Int = 16, numBands: Int = 4): DataFrame =
    candidatesFromBands(
      bandFrame(docs, idCol, textCol, n, numHashes, numBands), idCol)

  /** The pair enumeration of [[minhashCandidates]] over an
    * already-computed band table (shareable/persistable by callers). */
  def candidatesFromBands(bands: DataFrame, idCol: String): DataFrame = {
    val a = bands.select(col(idCol).as("doc_a"), col("band_idx"), col("band_key"))
    val b = bands.select(col(idCol).as("doc_b"), col("band_idx"), col("band_key"))
    // The C5 G×G grid carried over to the band self-join (round-15):
    // the physical join key is (band_idx, band_key, ga, gb), so a HOT
    // bucket — a mega-cluster of near-dups all sharing a band — splits
    // its quadratic pair enumeration into G² independent sub-tasks
    // instead of landing m²/2 join output on ONE reducer. Measured at
    // the planted 10%-mega-cluster 512k corpus (51,200-member bucket,
    // 1.3B pairs): the ungridded join dies of UNABLE_TO_ACQUIRE_MEMORY
    // in the single hot task at the 8 GB bench heap — input-size-based
    // AQE skew splitting never engages because the skew is OUTPUT
    // amplification (the bucket's input partition is a few MB). The
    // pair SET is exactly unchanged (each (a,b) pair meets in exactly
    // one (ga, gb) cell per shared band); each side replicates G ways
    // on corpus-linear band tables, which is noise at any scale.
    val grid = 8
    val cells = array((0 until grid).map(lit): _*)
    val ga = a.withColumn("ga", pmod(hash(col("doc_a")), lit(grid)))
      .withColumn("gb", explode(cells))
    val gb = b.withColumn("gb", pmod(hash(col("doc_b")), lit(grid)))
      .withColumn("ga", explode(cells))
    ga.join(gb, Seq("band_idx", "band_key", "ga", "gb"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_bands"))
  }

  /** SPANNING star edges of the MinHash candidate graph — the
    * scale-safe CONNECTED-COMPONENTS input (round-14 verdict item 7).
    *
    * [[minhashCandidates]] enumerates every within-bucket pair, which
    * is the right face when the pairs themselves are the answer — but
    * as a CC edge list it is Θ(m²) per bucket, and a skewed corpus
    * (one mega-cluster of near-dups = one hot band bucket) makes the
    * edge list quadratic in the cluster: measured on the planted
    * 10%-mega-cluster corpus, the 12.8k-member bucket at 128k docs is
    * already an 82M-pair clique and the 51.2k-member bucket at 512k a
    * 1.3B-pair one — all shipped through the pair shuffle and the
    * propagation loop's persisted symmetric edge list.
    *
    * A bucket is a CLIQUE in the candidate graph, and a star spans a
    * clique, so connecting every member to its bucket's MIN doc id
    * yields EXACTLY the same connected components (any candidate pair
    * shares a bucket; both ends reach that bucket's min) at O(m) edges
    * per bucket — corpus-linear regardless of skew. The per-bucket min
    * is a distributive aggregate (map-side combined, no hot-key
    * blowup), and the join back attaches one min row per bucket.
    * ClusterSpec pins component equality with the pair spelling on the
    * planted skew shape; the C17/C70/C106 oracles replay CC from the
    * candidate PAIRS and stay green because the components are equal
    * by construction. */
  def minhashStarEdges(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, numHashes: Int = 16, numBands: Int = 4): DataFrame =
    starEdgesFromBands(
      bandFrame(docs, idCol, textCol, n, numHashes, numBands), idCol)

  /** The star-edge derivation of [[minhashStarEdges]] over an
    * already-computed band table (shareable/persistable by callers). */
  def starEdgesFromBands(bands0: DataFrame, idCol: String): DataFrame = {
    val bands = bands0
      .select(col(idCol).as("__id"), col("band_idx"), col("band_key"))
    val mins = bands.groupBy(col("band_idx"), col("band_key"))
      .agg(min(col("__id")).as("doc_a"))
    bands.join(mins, Seq("band_idx", "band_key"))
      .where(col("__id") =!= col("doc_a"))
      .select(col("doc_a"), col("__id").as("doc_b"))
      .distinct()
  }

  /** 60-bit SimHash: token hash = first 15 hex chars of md5 (60 bits,
    * sign-safe in a long); signature bit i is set when the
    * occurrence-weighted ±1 sum over tokens is positive. One native
    * pass per document ([[graft.functions.SimHash64]]) — no token
    * explode, no shuffles; the spec proves equality with the exploded
    * 60-aggregate spelling. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), graft.functions.SimHash64(col(textCol)).as("simhash"))

  /** SimHash near-dup candidates: 4 bands of 15 bits block the pairs, then
    * exact Hamming distance <= `maxHamming` filters (any pair within
    * Hamming 3 of 60 bits shares at least one of 4 bands — pigeonhole). */
  def simhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        maxHamming: Int = 3): DataFrame = {
    val sig = simhash(docs, idCol, textCol)
    val bandCols = (0 until 4).map(b =>
      shiftright(col("simhash"), b * 15).bitwiseAND(0x7FFF).as(s"band$b"))
    val banded = sig.select(col(idCol) +: col("simhash") +: bandCols: _*)
      .select(col(idCol), col("simhash"),
        posexplode(array((0 until 4).map(b => col(s"band$b")): _*))
          .as(Seq("band_idx", "band_val")))
    val a = banded.select(col(idCol).as("doc_a"), col("simhash").as("sh_a"),
      col("band_idx"), col("band_val"))
    val b = banded.select(col(idCol).as("doc_b"), col("simhash").as("sh_b"),
      col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val")).where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
