package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.{SemanticPq, Vectors}

/** D20/D21: the C79 vector index driven from an ARRIVING embedding feed
  * — near-dup flagging at intake time, and the staleness monitor that
  * tells you when the frozen model needs a rebuild.
  *
  * Shape shared by both faces: the MODEL (coarse centroids, residual
  * codebook, SDC tables — all model-scale) collapses into broadcast
  * literals at stream start ([[SemanticPq.literalModel]]), so
  * assignment, residual coding, quantization error, and the SDC gate
  * are ONE narrow stateless projection per arriving vector (the D19
  * posture: model fixed at start, refresh = restart). The corpus-scale
  * pieces stay FRAMES — stream-static joins — but like every
  * path-backed static side their file listing binds at stream start
  * (StreamingSoakSpec measured it), so the standing index/corpus are
  * ALSO frozen for the life of the query; the refresh-without-restart
  * cadence is [[nearDupLiveIndex]], whose foreachBatch re-reads the
  * index tables per micro-batch.
  */
object StreamingVectors {

  /** D20: flag each incoming vector that near-duplicates the standing
    * corpus. `vecs` is a STREAMING (vec_id, e, nrm, tsCol) frame;
    * `cents`/`cb`/`codes` are the stored vector-index tables
    * ([[graft.ops.IncrementalIndex.writeVecIndex]] layout); `standing`
    * is the cold corpus (vec_id, e, nrm) read only for candidate
    * confirm. Candidates form by a stream-static equi-join on the
    * assigned cluster against `codes`; the exact confirm is a second
    * stream-static join touching standing floats only for candidate
    * rows. The only state is `dropDuplicatesWithinWatermark` on vec_id
    * so each flagged vector emits once inside the watermark horizon.
    *
    * Parity contract (StreamingVectorsSpec): replaying a batch through
    * this face flags EXACTLY the vectors the batch probe flags — same
    * frozen model, same margin, same confirm. Flag-only output (no
    * n_near/best_cos): per-vector aggregation in a stream would need
    * stateful aggregation; counts belong to the nightly batch card.
    * Emits (vec_id, tsCol). */
  def nearDupStream(vecs: DataFrame, cents: DataFrame, cb: DataFrame,
      codes: DataFrame, standing: DataFrame, tsCol: String,
      tau: Double = 0.35, margin: Double = 0.25,
      numSub: Int = 16, subDim: Int = 4,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val lm = SemanticPq.literalModel(cents, cb, numSub)
    // degenerate guard, mirroring batch Vectors.withNorm: one
    // failed-encoder (null/zero-norm) vector on an always-on intake
    // feed would otherwise hit the cosine's ANSI divide-by-zero and
    // kill the query. Stateless filter — replay parity preserved.
    val coded = SemanticPq.litAssignCode(
      vecs.withWatermark(tsCol, watermarkDelay)
        .where(col("nrm").isNotNull && col("nrm") > 0), lm, numSub, subDim)
    val cut = 2.0 * (1.0 - tau + margin)
    // the SAME gate expression as the batch probe — shared, not copied,
    // so the replay-equality contract can't silently drift
    val approx = SemanticPq.sdcDist(col("codes"), col("codes_s"),
      typedLit(lm.dtabs))
    coded
      .join(codes.select(col("vec_id").as("s_id"), col("cluster"),
        col("codes").as("codes_s")), Seq("cluster"))
      .where(approx <= cut)
      .join(standing.select(col("vec_id").as("s_id"), col("e").as("se"),
        col("nrm").as("sn")), Seq("s_id"))
      .where(Vectors.cosine(col("e"), col("se"), col("nrm"), col("sn")) >= tau)
      .select(col("vec_id"), col(tsCol))
      .dropDuplicatesWithinWatermark("vec_id")
  }

  /** D20 with a LIVE standing index — the nightly-refresh cadence
    * without a restart, and the appendVecIndex cadence landing between
    * batches. State (watermark dedup, now keyed on EVERY in-horizon
    * arrival, flagged or not) stays in the streaming plan; the probe —
    * assignment, SDC gate, exact confirm — moves into foreachBatch over
    * a fresh read of the [[graft.ops.IncrementalIndex]] tables at
    * `indexRoot` and the cold corpus at `corpusPath`. Because the probe
    * runs as a BATCH plan it can afford the aggregation the inline
    * stream face forgoes: `sink` receives the full
    * (vec_id, n_near, best_cos) probe card per micro-batch.
    *
    * REFRESH VISIBILITY for RE-ARRIVALS (round-13 ADVICE, pinned
    * intended): the watermark dedup sits BEFORE the probe, so a vector
    * re-sent while its key is still inside the watermark horizon is
    * suppressed by dedup state and does NOT re-probe — an index refresh
    * landing mid-run becomes visible to re-arrivals only after their
    * keys age out of the horizon (NEW vec_ids see the refreshed index
    * on their very next batch, which is the claim that distinguishes
    * this face from the frozen stream-static spelling). This is the
    * deliberate trade: dedup-first keeps the per-batch probe bounded by
    * distinct arrivals — dedup-after-probe would re-pay the probe for
    * every duplicate delivery of a hot key, the exact amplification an
    * at-least-once feed produces. [[graft.streaming]] soak coverage
    * pins both sides: in-horizon re-sends stay suppressed, post-horizon
    * re-sends probe the refreshed index
    * (StreamingVectorsSpec). */
  def nearDupLiveIndex(vecs: DataFrame, indexRoot: String,
      corpusPath: String, tsCol: String,
      tau: Double = 0.35, margin: Double = 0.25,
      watermarkDelay: String = "1 hour")(
      sink: DataFrame => Unit): DataStreamWriter[Row] =
    vecs
      .where(col("nrm").isNotNull && col("nrm") > 0)
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("vec_id")
      .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        sink(graft.ops.IncrementalIndex.probeVecs(s, indexRoot,
          batch, s.read.parquet(corpusPath), tau, margin))
      }

  /** D22: SEMANTIC decontamination at INTAKE — C83's embedding-space
    * eval-leakage gate turned to face the corpus side: flag each
    * ARRIVING vector that sits at cos ≥ τ to ANY benchmark item,
    * before it lands in the lake (the D13 n-gram gate catches verbatim
    * leaks at intake; this catches the paraphrased ones n-grams
    * structurally miss). `items` is the eval-side static frame
    * (vec_id, e, nrm) — always broadcast-tiny, so the scored join is
    * ONE stateless narrow projection per arriving vector; re-planned
    * per micro-batch, a benchmark refresh is picked up without a
    * restart (the D11 trade). The only state is the once-per-pair
    * watermark dedup. Emits (vec_id, item_id, tsCol).
    *
    * Parity contract (StreamingVectorsSpec): replaying a batch flags
    * EXACTLY the (vector, item) pairs the batch C83 scoring admits at
    * the same τ — the gate expression is the shared Vectors.cosine,
    * not a copy. */
  def decontaminateSemanticStream(vecs: DataFrame, items: DataFrame,
      tsCol: String, tau: Double = 0.35,
      watermarkDelay: String = "1 hour"): DataFrame =
    vecs.withWatermark(tsCol, watermarkDelay)
      // degenerate guard, mirroring batch C83's Vectors.withNorm: a
      // null/zero-norm embedding reaching the cosine throws
      // DIVIDE_BY_ZERO under ANSI and kills the always-on gate.
      // Stateless filter — replay parity preserved.
      .where(col("nrm").isNotNull && col("nrm") > 0)
      .crossJoin(broadcast(items.select(col("vec_id").as("item_id"),
        col("e").as("qe"), col("nrm").as("qn"))))
      .where(Vectors.cosine(col("e"), col("qe"), col("nrm"), col("qn")) >= tau)
      .select(col("vec_id"), col("item_id"), col(tsCol))
      .dropDuplicatesWithinWatermark("vec_id", "item_id")

  /** D21: index STALENESS monitor — the rebuild signal for the frozen
    * model. When the embedding distribution drifts (a new encoder
    * version, a new domain mixing in), arriving vectors quantize WORSE
    * against the stored codebook: their residual quantization error
    * `qerr` rises above the build-time per-cluster baseline
    * (the `vbase` table [[graft.ops.IncrementalIndex.writeVecIndex]]
    * persists). Per event-time window and cluster, this face reports
    * arrivals, mean qerr, the baseline, integer-bp drift, and the
    * stale flag `avg_qerr > staleFactor × base_qerr` — the D18
    * windowed-aggregate pattern (watermarked window groupBy; state
    * bounded by the window horizon, never feed history).
    *
    * Conservative reading: a stale=true window says "rebuild and
    * re-encode soon"; the probe itself stays CORRECT meanwhile (its
    * exact confirm never admits false positives — only recall decays
    * as the gate's margin assumption erodes). Emits (window_start,
    * window_end, cluster, n_vecs, avg_qerr, base_qerr, drift_bp,
    * stale). */
  def driftStream(vecs: DataFrame, cents: DataFrame, cb: DataFrame,
      baseline: DataFrame, tsCol: String,
      windowDur: String = "1 hour", staleFactor: Double = 2.0,
      numSub: Int = 16, subDim: Int = 4,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val lm = SemanticPq.literalModel(cents, cb, numSub)
    SemanticPq.litAssignCode(
        vecs.withWatermark(tsCol, watermarkDelay), lm, numSub, subDim)
      .groupBy(window(col(tsCol), windowDur), col("cluster"))
      .agg(count(lit(1)).as("n_vecs"), avg(col("qerr")).as("avg_qerr"))
      // LEFT join: a cluster with no baseline row captured zero build
      // vectors, so anything assigning there is by definition novel —
      // dropping those windows would blind the monitor exactly where
      // drift concentrates; they report null baseline + stale=true
      .join(broadcast(baseline.select(col("cluster"),
        col("base_qerr"))), Seq("cluster"), "left")
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("cluster"), col("n_vecs"),
        round(col("avg_qerr"), 6).as("avg_qerr"),
        round(col("base_qerr"), 6).as("base_qerr"),
        // a perfectly-quantized baseline (identical corpus) is 0 —
        // guard the ratio: equal-zero live error reads par, any live
        // error over a zero (or absent) baseline reads null-with-stale
        when(col("base_qerr") === 0,
            when(col("avg_qerr") === 0, lit(10000L)))
          .otherwise(floor(col("avg_qerr") * 10000 / col("base_qerr"))
            .cast("long")).as("drift_bp"),
        (col("base_qerr").isNull ||
          col("avg_qerr") > col("base_qerr") * staleFactor ||
          (col("base_qerr") === 0 && col("avg_qerr") > 0)).as("stale"))
  }
}
