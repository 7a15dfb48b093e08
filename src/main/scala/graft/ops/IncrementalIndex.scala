package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized standing dedup index — the production half of the C36
  * incremental-dedup shape (and the static side D11's stream probes).
  *
  * `dedup_incremental` derives the standing corpus's indexes inline
  * (fine for a query; the bench number carries the rebuild). A real
  * daily intake never rebuilds: it maintains the index AS TABLES on
  * the lake and runs the cycle  probe(batch) → admit survivors →
  * append their keys. This object is that cycle. Two parquet tables
  * under one root:
  *   - `keys`:  (doc_id, h, fp)            — exact hash + reorder
  *     fingerprint, one row per admitted document
  *   - `bands`: (doc_id, band_idx, band_key) — the MinHash-LSH band
  *     table (C3 signature constants)
  *
  * Scale shape: probes are the C36 equi-joins on uniform md5 keys,
  * bounded by O(batch) + the index side's key-distinct collapse;
  * append writes only the admitted batch's rows (the index grows by
  * exactly what was admitted — no rewrite, no rescan of history; the
  * LSH path's meta reconciliation is footer-count + watermark
  * arithmetic, with a full-table distinct recount ONLY on an
  * inconsistency — see [[appendLshIndex]]).
  * The cycle is deterministic and idempotent per batch: re-probing an
  * already-appended batch flags every document as an exact dup.
  */
object IncrementalIndex {

  private def keysOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      Text.contentHash(col(textCol)).as("h"),
      Text.fingerprint(col(textCol)).as("fp"))

  private def bandsOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.lshBands(
      Dedup.minhashSignature(Dedup.shingleFrame(docs, idCol, textCol, 3),
        idCol, 16, materialize = false), idCol, 4, 4)
      .select(col(idCol).as("doc_id"), col("band_idx"), col("band_key"))

  /** Create (overwrite) the index from the current standing corpus. */
  def write(root: String, docs: DataFrame, idCol: String, textCol: String): Unit = {
    keysOf(docs, idCol, textCol)
      .write.mode("overwrite").parquet(s"$root/keys")
    bandsOf(docs, idCol, textCol)
      .write.mode("overwrite").parquet(s"$root/bands")
  }

  /** Append one admitted batch's keys — the only index maintenance a
    * daily run performs. */
  def append(root: String, admitted: DataFrame, idCol: String, textCol: String): Unit = {
    keysOf(admitted, idCol, textCol)
      .write.mode("append").parquet(s"$root/keys")
    bandsOf(admitted, idCol, textCol)
      .write.mode("append").parquet(s"$root/bands")
  }

  /** Probe a batch against the materialized index: the batch frame plus
    * flag columns `dup_exact`, `dup_reorder`, `dup_near` (0/1). The
    * C36 query's semantics against stored tables instead of an inline
    * derivation. */
  def probe(s: SparkSession, root: String, batch: DataFrame,
            idCol: String, textCol: String): DataFrame = {
    val keys = s.read.parquet(s"$root/keys")
    val bands = s.read.parquet(s"$root/bands")
    val keyed = batch
      .withColumn("__h", Text.contentHash(col(textCol)))
      .withColumn("__fp", Text.fingerprint(col(textCol)))
    val nearHit = bandsOf(batch, idCol, textCol)
      .join(bands.select(col("band_idx"), col("band_key")).distinct(),
        Seq("band_idx", "band_key"), "left_semi")
      .select(col("doc_id").as(idCol)).distinct()
      .withColumn("__near", lit(1))
    keyed
      .join(keys.select(col("h").as("__h")).distinct().withColumn("__mh", lit(1)),
        Seq("__h"), "left")
      .join(keys.select(col("fp").as("__fp")).distinct().withColumn("__mfp", lit(1)),
        Seq("__fp"), "left")
      .join(nearHit, Seq(idCol), "left")
      .select(batch.columns.map(col) :+
        coalesce(col("__mh"), lit(0)).as("dup_exact") :+
        coalesce(col("__mfp"), lit(0)).as("dup_reorder") :+
        coalesce(col("__near"), lit(0)).as("dup_near"): _*)
  }

  /** The survivors a daily run admits (and should then [[append]]):
    * documents with no flag set. */
  def admit(s: SparkSession, root: String, batch: DataFrame,
            idCol: String, textCol: String): DataFrame =
    probe(s, root, batch, idCol, textCol)
      .where(col("dup_exact") === 0 && col("dup_reorder") === 0 &&
        col("dup_near") === 0)
      .drop("dup_exact", "dup_reorder", "dup_near")

  // ---- span-level index (the C74 standing table) --------------------

  private val SpanL = 8

  /** Create (overwrite) the `wins` table: the standing corpus's
    * DISTINCT L-token window hashes — the third index table, powering
    * span-level probes ([[probeSpans]]) the way `keys`/`bands` power
    * document-level ones. Distinct-collapsed at write time so the
    * table size is bounded by unique content, not corpus length. */
  def writeSpanIndex(root: String, docs: DataFrame, idCol: String, textCol: String): Unit =
    ExactSubstr.windowHashes(docs, idCol, textCol, SpanL)
      .select(col("h")).distinct()
      .write.mode("overwrite").parquet(s"$root/wins")

  /** Append an admitted batch's window hashes. Append-only like the
    * other tables; duplicate hash rows are harmless (probes semi-join). */
  def appendSpanIndex(root: String, admitted: DataFrame, idCol: String, textCol: String): Unit =
    ExactSubstr.windowHashes(admitted, idCol, textCol, SpanL)
      .select(col("h")).distinct()
      .write.mode("append").parquet(s"$root/wins")

  /** Maximal spans of batch text already present in the standing corpus
    * (C74 against the materialized table instead of an inline
    * derivation): (doc_id, start_pos, end_pos, span_tokens). */
  def probeSpans(s: SparkSession, root: String, batch: DataFrame,
                 idCol: String, textCol: String): DataFrame =
    ExactSubstr.incrementalSpans(batch, s.read.parquet(s"$root/wins"),
      idCol, textCol, SpanL)

  // ---- vector index (the C79 standing tables) -----------------------

  /** C79 index parameters — the C76 residual-PQ shapes. The coarse
    * cluster count is [[KMeans.adaptiveK]]-derived from the standing
    * corpus at build time (8 at the test SFs) — frozen thereafter like
    * the rest of the model. */
  private val VecIters = 3
  private val VecM = 16; private val VecSubDim = 4; private val VecPqK = 64

  /** Create (overwrite) the vector index from the standing embedding
    * corpus: `vcents` (coarse centroids), `vcb` (residual PQ codebook),
    * `vcodes` (vec_id, cluster, codes). Centroids and codebook are
    * FROZEN at build time — appends encode with the stored model, so
    * assignments stay consistent batch over batch (re-learning is a
    * rebuild, the production cadence). Floats are deliberately NOT in
    * the index: the memory-resident part is codes; exact rescore reads
    * candidates from the cold corpus (the PQ posture throughout). */
  def writeVecIndex(root: String, v: DataFrame): Unit = {
    val n = v.count()
    val m = SemanticPq.buildModel(v, KMeans.adaptiveK(n),
      VecIters, VecM, VecSubDim, VecPqK, rows = n)
    m.cents.write.mode("overwrite").parquet(s"$root/vcents")
    m.cb.write.mode("overwrite").parquet(s"$root/vcb")
    // ONE literal-model pass produces both the codes table and the D21
    // drift baseline (cluster, codes, qerr per vector) — and because
    // the baseline and the streaming monitor use the SAME projection,
    // build-time and live qerr are definitionally identical
    val coded = SemanticPq.litAssignCode(v,
        SemanticPq.literalModel(m.cents, m.cb, VecM), VecM, VecSubDim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      coded.select(col("vec_id"), col("cluster"), col("codes"))
        .write.mode("overwrite").parquet(s"$root/vcodes")
      coded.groupBy(col("cluster"))
        .agg(count(lit(1)).as("base_n"), avg(col("qerr")).as("base_qerr"))
        .write.mode("overwrite").parquet(s"$root/vbase")
    } finally coded.unpersist()
  }

  /** Recompute the D21 drift baseline from the CURRENT corpus without
    * retraining — the append-cadence maintenance step: after many
    * appends the build-time baseline under-represents the admitted
    * population (vectors the codebook never trained on quantize a
    * little worse), which makes the monitor over-sensitive. The model
    * stays frozen; only `vbase` rewrites. Refreshing with the original
    * build corpus reproduces the build-time table exactly
    * (IncrementalVecSpec pins it). */
  def refreshVecBaseline(s: SparkSession, root: String, corpus: DataFrame): Unit =
    SemanticPq.litAssignCode(corpus,
        SemanticPq.literalModel(s.read.parquet(s"$root/vcents"),
          s.read.parquet(s"$root/vcb"), VecM), VecM, VecSubDim)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("base_n"), avg(col("qerr")).as("base_qerr"))
      .write.mode("overwrite").parquet(s"$root/vbase")

  /** Append an admitted batch: encode with the STORED centroids +
    * codebook and append codes only. */
  def appendVecIndex(s: SparkSession, root: String, batch: DataFrame): Unit =
    SemanticPq.encodeWith(batch,
        s.read.parquet(s"$root/vcents"), s.read.parquet(s"$root/vcb"),
        VecM, VecSubDim)
      .write.mode("append").parquet(s"$root/vcodes")

  // ---- LSH serve index (the C7a banded table, append cadence) -------

  /** Tables the C7a-shaped LSH serve path reads: `lbanded`
    * (vec_id, tbl, bucket — the slim banding) + `lmeta` (bits, radius,
    * n, tables). Banding is the whole corpus-linear cost of an LSH
    * search, so it persists once and appends band ONLY the admitted
    * batch — the same append-only cadence the text (`keys`/`bands`/
    * `wins`) and PQ-vector (`vcodes`) standing indexes already have.
    * The operating point is FROZEN at build (stored in `lmeta`), and
    * because [[Vectors.hyperplanes]] is seed-deterministic, a batch
    * banded at the stored width lands in exactly the buckets a full
    * rebuild at that width would give it — append-then-serve equals
    * rebuild-then-serve row-identically while the adaptive rule's
    * answer is unchanged (IncrementalLshSpec pins frame equality). */
  private val LshTables = 4

  /** Create (overwrite) the LSH index at the corpus-adaptive operating
    * point. `v` is a [[Vectors.withNorm]] frame.
    *
    * `lmeta` carries, besides the operating point: `n` (distinct
    * vec_ids — what the adaptive staleness rule prices), `rows` (total
    * banded rows, a parquet-METADATA count), and `maxid` (the vec_id
    * watermark). The latter two are what lets [[appendLshIndex]] keep
    * `n` exact WITHOUT a per-append full-table distinct (round-14
    * ADVICE): a fresh batch reconciles by arithmetic, and only an
    * inconsistency (crash-retry duplicates, an out-of-watermark
    * re-send) pays the recount. */
  def writeLshIndex(root: String, v: DataFrame): Unit = {
    val s = v.sparkSession
    import s.implicits._
    val n = v.count()
    VectorQueries.lshBand(v, LshTables, Vectors.adaptiveLshBits(n))
      .write.mode("overwrite").parquet(s"$root/lbanded")
    // rows from the written files' footers (no column scan); maxid in
    // one narrow pass of the corpus frame the caller already holds
    val rows = s.read.parquet(s"$root/lbanded").count()
    val maxid = Option(v.agg(max(col("vec_id"))).head.get(0))
      .fold(-1L)(_.asInstanceOf[Long])
    Seq((Vectors.adaptiveLshBits(n), Vectors.adaptiveLshRadius(n), n,
        LshTables, rows, maxid))
      .toDF("bits", "radius", "n", "tables", "rows", "maxid")
      .write.mode("overwrite").parquet(s"$root/lmeta")
  }

  /** Append an admitted batch: band it at the STORED width (same
    * seeds → same buckets as a rebuild) and refresh the corpus count in
    * `lmeta`. Returns false when the grown corpus crosses the adaptive
    * rule's threshold — the stored width no longer matches
    * [[Vectors.adaptiveLshBits]] of the new count, so serving would
    * band-mismatch (the round-12 ADVICE finding on the cached face);
    * the caller must [[writeLshIndex]]-rebuild over the full corpus
    * before the next serve. Appending first is still correct: the
    * banded rows written are exactly the rebuild's rows for this batch
    * at the OLD width, and the rebuild overwrites everything.
    *
    * RETRY SEMANTICS (round-13 ADVICE) + APPEND COST (round-14
    * ADVICE): the two writes cannot be atomic, so `n` must always
    * describe the table as it actually is, never a counter that
    * drifted from it — but re-deriving it with a full-table
    * count(DISTINCT vec_id) on EVERY append contradicted the module's
    * 'no rescan of history' contract (O(corpus) column scan per daily
    * batch). The recount is now BOUNDED to the inconsistent case. Two
    * cheap checks decide:
    *
    *   - `rows`: the banded table's total row count from parquet
    *     FOOTERS (no column scan). A clean append grows it by exactly
    *     batchRows × tables; any other value means duplicate rows
    *     landed (a crash-retry replayed the banded write).
    *   - `maxid`: the vec_id watermark. A genuinely new batch sits
    *     strictly above it (the lake's watermark-append contract, B4);
    *     a re-SENT already-committed batch — which the row arithmetic
    *     alone cannot distinguish from a fresh one — sits at or below
    *     it.
    *
    * When both agree, `n` advances by the batch's own distinct count
    * (∝ batch). When either disagrees, the full distinct recount runs
    * once and self-heals meta — so a crash between the banded append
    * and the meta overwrite, or an at-least-once replay of the whole
    * call, still converges to the exact `n` (ClosedFindingsSpec pins
    * both: the retried append cannot drift `n`, and the fresh append
    * never pays the recount). Duplicate banded rows remain harmless to
    * serves, which dedup candidates per (query, vec)
    * ([[VectorQueries.lshServe]]). A legacy meta without
    * `rows`/`maxid` upgrades in place via the recount path. */
  def appendLshIndex(s: SparkSession, root: String, batch: DataFrame): Boolean = {
    import s.implicits._
    val meta = s.read.parquet(s"$root/lmeta").head()
    val bits = meta.getAs[Int]("bits")
    val tables = meta.getAs[Int]("tables")
    // one ∝-batch pass: row count, distinct ids, id range
    val bStats = batch.agg(count(lit(1)).as("c"),
      countDistinct(col("vec_id")).as("d"),
      min(col("vec_id")).as("lo"), max(col("vec_id")).as("hi")).head()
    VectorQueries.lshBand(batch, tables, bits)
      .write.mode("append").parquet(s"$root/lbanded")
    val actualRows = s.read.parquet(s"$root/lbanded").count()
    val legacy = !meta.schema.fieldNames.contains("rows")
    val consistent = !legacy && !meta.isNullAt(meta.fieldIndex("rows")) &&
      actualRows == meta.getAs[Long]("rows") + bStats.getAs[Long]("c") * tables &&
      (bStats.isNullAt(bStats.fieldIndex("lo")) ||
        bStats.getAs[Long]("lo") > meta.getAs[Long]("maxid"))
    lastAppendRecounted = !consistent
    val (n, maxid) =
      if (consistent)
        (meta.getAs[Long]("n") + bStats.getAs[Long]("d"),
          if (bStats.isNullAt(bStats.fieldIndex("hi"))) meta.getAs[Long]("maxid")
          else math.max(meta.getAs[Long]("maxid"), bStats.getAs[Long]("hi")))
      else {
        val r = s.read.parquet(s"$root/lbanded")
          .agg(countDistinct(col("vec_id")).as("n"), max(col("vec_id")).as("m"))
          .head()
        (r.getAs[Long]("n"),
          Option(r.get(1)).fold(-1L)(_.asInstanceOf[Long]))
      }
    Seq((bits, meta.getAs[Int]("radius"), n, tables, actualRows, maxid))
      .toDF("bits", "radius", "n", "tables", "rows", "maxid")
      .write.mode("overwrite").parquet(s"$root/lmeta")
    bits == Vectors.adaptiveLshBits(n) &&
      meta.getAs[Int]("radius") == Vectors.adaptiveLshRadius(n)
  }

  /** Test seam: whether the last [[appendLshIndex]] call took the
    * self-heal recount path (true) or the ∝-batch arithmetic path
    * (false). */
  @volatile private[graft] var lastAppendRecounted: Boolean = false

  /** Serve the C7 top-10 search from the standing banded table.
    * `v` supplies the vectors (attached only to candidate-set-sized
    * frames, the C7a rule). */
  def serveLsh(s: SparkSession, root: String, v: DataFrame): DataFrame = {
    val meta = s.read.parquet(s"$root/lmeta").head()
    VectorQueries.lshServe(
      s.read.parquet(s"$root/lbanded")
        .select(col("vec_id"), col("tbl"), col("bucket")),
      v, meta.getAs[Int]("bits"), meta.getAs[Int]("radius"))
  }

  /** Probe a batch of vectors against the standing index: SDC-gated
    * candidates within the batch vector's cluster, exact-cosine
    * confirmed against `standing` (touched ONLY for the candidate
    * rows). Returns (vec_id, n_near, best_cos) for flagged batch
    * vectors — near-dups of HISTORY; batch-internal duplication is
    * deliberately silent (the C36/C74 incremental contract). */
  def probeVecs(s: SparkSession, root: String, batch: DataFrame,
                standing: DataFrame, tau: Double = 0.35,
                margin: Double = 0.25): DataFrame = {
    val cents = s.read.parquet(s"$root/vcents")
    val cb = s.read.parquet(s"$root/vcb")
    val codes = s.read.parquet(s"$root/vcodes")
    SemanticPq.probeAgainst(batch, standing, cents, cb, codes,
      VecM, VecSubDim, tau, margin)
  }
}
