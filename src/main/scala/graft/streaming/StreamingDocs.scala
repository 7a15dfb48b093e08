package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.{Pipeline, Text}

/** Continuous training-data intake — the batch cleaning pipeline's first
  * two stages (quality gate → exact dedup, graft.ops.Pipeline) run as a
  * stream, for the corpus that arrives as a feed rather than a drop.
  *
  * The quality gate is a narrow codegen'd projection (TokenMarkerStats),
  * identical in both faces. Exact dedup streams as
  * `dropDuplicatesWithinWatermark` on the canonical content hash: state
  * holds one hash per distinct document seen inside the watermark
  * horizon — bounded by the delay window, never by corpus history —
  * which is the honest streaming trade: a duplicate arriving later than
  * the lateness bound is admitted (the nightly batch dedup sweeps those).
  * Keeper semantics differ accordingly: the batch face keeps each
  * cluster's MIN id, the stream keeps the FIRST arrival — equal whenever
  * arrival order follows id order, which StreamingDocsSpec exercises by
  * replaying the corpus in id order against the batch face.
  */
object StreamingDocs {

  /** Quality-gated, hash-deduped view of a streaming documents frame
    * (needs `text` and an event-time column `tsCol` for the watermark).
    * Emits each surviving document once, with its content hash. */
  def cleanStream(docs: DataFrame, tsCol: String,
                  watermarkDelay: String = "1 hour"): DataFrame =
    Pipeline.qualityFilter(docs, "text")
      .withColumn("content_hash", Text.contentHash(col("text")))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** D11: the incremental-dedup shape (C36) made continuous — documents
    * arrive as a feed and are admitted only when they collide neither
    * with the STANDING corpus's indexes (exact content hash + reorder
    * fingerprint — stream-static anti-joins against [[standingIndex]])
    * nor with an earlier in-stream arrival inside the watermark horizon
    * (`dropDuplicatesWithinWatermark` on the content hash).
    *
    * The static side is the maintained index frame, not the corpus: at
    * 100 TB the anti-join probes two key-only tables, and state holds
    * one hash per in-horizon arrival — never corpus history. The index
    * is FROZEN for the life of the query: a path-backed static frame
    * binds its file listing at stream start (measured in
    * StreamingSoakSpec — appended index files + refreshByPath do NOT
    * land mid-run), so a nightly index refresh needs either a restart
    * or [[dedupAgainstLiveIndex]], whose foreachBatch re-reads the
    * index per micro-batch. The C36 MinHash-band probe stays in the nightly
    * batch sweep: its signature aggregation can't precede a stateful
    * dedup in an append stream, and that split — cheap exact probes
    * inline, banded probes nightly — is how production intake actually
    * runs. */
  def dedupAgainstStream(docs: DataFrame, standing: DataFrame, tsCol: String,
                         watermarkDelay: String = "1 hour"): DataFrame = {
    val keyed = docs
      .withColumn("content_hash", Text.contentHash(col("text")))
      .withColumn("fp", Text.fingerprint(col("text")))
    keyed
      .join(standing.select(col("h").as("content_hash")).distinct(),
        Seq("content_hash"), "left_anti")
      .join(standing.select(col("fp")).distinct(), Seq("fp"), "left_anti")
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")
  }

  /** D14: the C49 Bloom pre-filter made continuous — the standing
    * corpus's fingerprint set collapses to ONE bloom-sketch row
    * (`bloom_filter_agg`, a mergeable single-pass build) that
    * stream-static-joins in as a broadcast scalar; every arriving
    * document probes it with `might_contain` as a narrow projection.
    * Bloom NEGATIVES — the overwhelming majority of a healthy intake —
    * are admitted with no join and no per-row state at all; only the
    * bloom-positives (true duplicates plus the εN false-positive
    * margin) pay the exact fingerprint anti-join confirm, so the
    * admitted set is EXACTLY the plain stream-static anti-join's
    * (blooms never false-negative; the confirm removes the FPs). The
    * static sides are FROZEN at stream start like D11's (the file
    * listing binds at analysis — StreamingSoakSpec measured it): a
    * nightly index rebuild lands via restart or via
    * [[dedupBloomLiveIndex]]'s per-micro-batch re-read. At
    * 100 TB the bloom is a few hundred MB of broadcast bits standing
    * in for billions of index keys — the difference between every
    * micro-batch paying a corpus-scale join and only its duplicate
    * sliver paying one. */
  def dedupBloomStream(docs: DataFrame, standing: DataFrame,
                       estItems: Int = 1 << 20): DataFrame = {
    graft.GraftExtensions.register(docs.sparkSession)
    // might_contain requires its filter side be a scalar subquery (the
    // InjectRuntimeFilter contract), so the standing index goes in as a
    // temp view — same mechanism as the batch face (DedupQueries.dedupBloom).
    standing.createOrReplaceTempView("bloom_stream_standing")
    // coalesce(.., false): `bloom_filter_agg` over an EMPTY standing
    // index (day one of a pipeline, or a wiped index) yields a NULL
    // bloom and might_contain(NULL, x) is NULL — without the guard
    // BOTH filter branches below drop the row and the whole intake is
    // silently lost (StreamingDegenerateSpec pins the admit-all)
    val probed = docs
      .withColumn("fp", graft.ops.Text.fingerprint(col("text")))
      .withColumn("__maybe", coalesce(expr(
        s"""might_contain(
           |  (SELECT bloom_filter_agg(xxhash64(fp), $estItems)
           |   FROM bloom_stream_standing),
           |  xxhash64(fp))""".stripMargin), lit(false)))
    probed.where(!col("__maybe")).drop("__maybe")
      .unionByName(
        probed.where(col("__maybe")).drop("__maybe")
          .join(standing.select(col("fp")).distinct(), Seq("fp"), "left_anti"))
  }

  /** D11 with a LIVE standing index — the nightly-refresh cadence
    * WITHOUT a restart. [[dedupAgainstStream]] binds its static side's
    * file listing at query start, so refresh-without-restart requires
    * per-micro-batch re-analysis: exactly what foreachBatch gives. The
    * stateful half (watermark dedup on the content hash) stays in the
    * streaming plan; the index anti-joins move into the batch closure
    * over a FRESH read of `standingPath` each micro-batch. Reordering
    * state-dedup before the anti-join admits the same set: an
    * index-dup hash occupying dedup state can only suppress later
    * arrivals of the same text, which the index rejects anyway.
    * `sink` receives each micro-batch's admitted rows; the caller
    * starts/owns the returned writer. */
  def dedupAgainstLiveIndex(docs: DataFrame, standingPath: String,
      tsCol: String, watermarkDelay: String = "1 hour")(
      sink: DataFrame => Unit): DataStreamWriter[Row] =
    docs
      .withColumn("content_hash", Text.contentHash(col("text")))
      .withColumn("fp", Text.fingerprint(col("text")))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")
      .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
        val standing = batch.sparkSession.read.parquet(standingPath)
        sink(batch
          .join(standing.select(col("h").as("content_hash")).distinct(),
            Seq("content_hash"), "left_anti")
          .join(standing.select(col("fp")).distinct(), Seq("fp"), "left_anti"))
      }

  /** D14 with a LIVE standing index: the bloom face is stateless, so
    * the WHOLE probe moves into foreachBatch over a fresh index read —
    * the bloom scalar, the negative fast-path and the positive confirm
    * are per-micro-batch plans, so a rebuilt index (and its refreshed
    * bloom) lands on the next batch. */
  def dedupBloomLiveIndex(docs: DataFrame, standingPath: String,
      estItems: Int = 1 << 20)(sink: DataFrame => Unit): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      sink(dedupBloomStream(batch,
        batch.sparkSession.read.parquet(standingPath), estItems))
    }

  /** D13: streaming benchmark decontamination — the C23 contamination
    * gate run inline on the intake feed, so an eval-set leak is flagged
    * the moment the document arrives instead of at the nightly sweep.
    *
    * STATELESS by construction: benchmarks are eval-sized (always the
    * tiny side), so the distinct benchmark n-gram set collapses to one
    * collect_set row that stream-static-joins in as a broadcast, and
    * the per-document hit count is a higher-order `filter` over the
    * document's own shingle array — a narrow codegen'd projection, no
    * streaming aggregation, no watermark, no state store. Occurrence
    * semantics match the batch face exactly: each shingle OCCURRENCE
    * that appears in the benchmark counts one hit (the C23 join counts
    * occurrence rows against the distinct bench side). The benchmark set is
    * frozen at stream start (the static-side rule above); eval suites
    * change on release cadence, so restart-to-refresh is the honest
    * posture here. */
  def decontaminateStream(docs: DataFrame, benchNgrams: DataFrame,
                          minHits: Int = 3): DataFrame = {
    val benchSet = benchNgrams
      .agg(collect_set(col("ngram")).as("__bench"))
    docs
      .crossJoin(org.apache.spark.sql.functions.broadcast(benchSet))
      .withColumn("n_hits",
        size(filter(graft.ops.Dedup.shingles(col("text"), 2),
          x => array_contains(col("__bench"), x))))
      .withColumn("contaminated", col("n_hits") >= minHits)
      .drop("__bench")
  }

  /** The standing corpus's (content hash, fingerprint) index — one row
    * per document; in production this is the incrementally-maintained
    * lake table the daily batch job also probes. */
  def standingIndex(docs: DataFrame): DataFrame =
    docs.select(Text.contentHash(col("text")).as("h"),
      Text.fingerprint(col("text")).as("fp"))

  /** D19: streaming span-recycle flag — C74's batch-vs-history span
    * probe run inline on the intake feed, flagging per arriving
    * document how many of its tokens lie inside a window history has
    * already seen.
    *
    * STATELESS by construction: the standing window-hash set (corpus-
    * scale — billions of hashes at 100 TB, far past D13's collect_set
    * trick) collapses at stream CONSTRUCTION time into one Bloom sketch
    * embedded as a binary LITERAL, so every document's probe is a
    * higher-order `filter` over its own window array followed by an
    * interval-union fold — a narrow projection, no join, no watermark,
    * no state store. The trade, stated: the sketch is fixed at start
    * (an index refresh needs a stream restart — unlike D14's per-
    * micro-batch re-plan — because `might_contain` requires a constant
    * or scalar-subquery filter side and a subquery cannot sit inside a
    * lambda), and Bloom false positives can only ADD coverage, so the
    * flag is CONSERVATIVE: it never under-reports recycling, and the
    * nightly exact C74 sweep settles the margin. StreamingDocsSpec
    * replays the corpus and pins per-doc equality with the exact batch
    * face at a generous sketch size. */
  def spanRecycleStream(docs: DataFrame, standingWins: DataFrame,
                        L: Int = 8, estItems: Long = 1L << 20): DataFrame = {
    graft.GraftExtensions.register(docs.sparkSession)
    val bloomBytes = standingWins
      .agg(expr(s"bloom_filter_agg(xxhash64(h), ${estItems}L)").as("b"))
      .collect()(0).getAs[Array[Byte]](0)
    // EMPTY standing window set (first deploy): nothing can be recycled
    // FROM, so every arrival reads 0 bp — same first-intake posture as
    // dedupBloomStream's null-bloom guard, same output schema AND null
    // semantics as the indexed path (round-12 degenerate sweep): a
    // null-text arrival reads null total_tokens there (ANSI size(null)),
    // recycled_tokens 0 (empty-array fold), and null recycled_bp (the
    // div's null propagation) — so recycled_bp gates on total_tokens
    // being non-null instead of a bare literal.
    if (bloomBytes == null)
      return docs
        .withColumn("total_tokens", size(Text.tokens(col("text"))))
        .withColumn("recycled_tokens", lit(0))
        .withColumn("recycled_bp",
          when(col("total_tokens").isNotNull, lit(0L)))
    def mightContain(b: Column, v: Column): Column =
      org.apache.spark.sql.GraftBridge.column(
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          org.apache.spark.sql.GraftBridge.expression(b),
          org.apache.spark.sql.GraftBridge.expression(v)))
    val bloom = lit(bloomBytes)
    // ascending window start positions whose L-gram history has seen
    val winIdx = when(size(col("__ts")) >= L,
      sequence(lit(1), size(col("__ts")) - (L - 1)))
      .otherwise(array().cast("array<int>"))
    docs
      .withColumn("__ts", Text.tokens(col("text")))
      .withColumn("__hits", filter(winIdx, i =>
        mightContain(bloom,
          xxhash64(md5(concat_ws(" ", slice(col("__ts"), i, lit(L))))))))
      .withColumn("total_tokens", size(col("__ts")))
      // exact interval-union coverage of the hit windows: fold over the
      // ascending positions tracking (covered, last end)
      .withColumn("recycled_tokens", aggregate(col("__hits"),
        struct(lit(0).as("cov"), lit(0).as("last")),
        (acc, i) => struct(
          (acc.getField("cov") + i + lit(L - 1) -
            greatest(acc.getField("last"), i - 1)).as("cov"),
          (i + lit(L - 1)).as("last")),
        acc => acc.getField("cov")))
      .withColumn("recycled_bp",
        when(col("total_tokens") === 0, lit(0L))
          .otherwise(expr("recycled_tokens * 10000 div total_tokens")))
      .drop("__ts", "__hits")
  }
}
