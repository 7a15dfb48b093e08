package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Text

/** D23: per-source QUALITY drift monitor on the intake feed — the
  * text-side sibling of the D21 vector staleness monitor, and the
  * streaming face of the C84 batch-drift card: a feed that switches
  * encoding, starts truncating, or degrades to boilerplate shows a
  * falling mean C9 score within the hour, not at the nightly sweep.
  *
  * Shape: the D18 watermarked-window pattern — arrivals score through
  * the SHARED C9 kernel ([[Text.qualityScoreFromStats]], one stateless
  * narrow projection; the same expression the batch faces use, so the
  * monitor can never silently diverge from the card), aggregate per
  * event-time window × source (state bounded by the horizon), and
  * compare against the batch-fit per-source baseline — a broadcast
  * S-row frame, re-planned per micro-batch (current-table posture: a
  * nightly baseline refresh is picked up without restart).
  */
object StreamingDrift {

  /** Batch-fit per-source baseline: mean C9 quality of the standing
    * corpus (`docs` needs `source` and `text`). Persist and refresh
    * nightly; the monitor broadcasts it. */
  def sourceBaseline(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), graft.functions.TokenMarkerStats(col("text")).as("st"))
      .select(col("source"), Text.qualityScoreFromStats(col("st")).as("q"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("base_docs"), avg(col("q")).as("base_q"))

  /** The monitor. Per (event-time window × source): arrivals, mean
    * live score, the baseline, integer-bp ratio, and the `drifting`
    * flag — live mean below `minFactor` × baseline, or a source with
    * NO baseline row (a brand-new feed is by definition novel — the
    * D21 no-baseline rule). Quality is good-when-high, so the flag is
    * one-sided: an unusually CLEAN window is not an alarm. A zero
    * baseline (a source whose standing docs all score 0) reads par
    * when the live mean is also 0, null-with-no-flag otherwise — any
    * live score over a zero baseline is an improvement.
    * Emits (window_start, window_end, source, n_docs, avg_q, base_q,
    * drift_bp, drifting). */
  def qualityDriftStream(docs: DataFrame, baseline: DataFrame,
      tsCol: String, windowDur: String = "1 hour",
      minFactor: Double = 0.8,
      watermarkDelay: String = "1 hour"): DataFrame =
    docs.withWatermark(tsCol, watermarkDelay)
      .select(col("source"), col(tsCol),
        graft.functions.TokenMarkerStats(col("text")).as("st"))
      .select(col("source"), col(tsCol),
        Text.qualityScoreFromStats(col("st")).as("q"))
      .groupBy(window(col(tsCol), windowDur), col("source"))
      .agg(count(lit(1)).as("n_docs"), avg(col("q")).as("avg_q"))
      .join(broadcast(baseline.select(col("source"), col("base_q"))),
        Seq("source"), "left")
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("source"), col("n_docs"),
        round(col("avg_q"), 6).as("avg_q"),
        round(col("base_q"), 6).as("base_q"),
        when(col("base_q") === 0,
            when(col("avg_q") === 0, lit(10000L)))
          .otherwise(floor(col("avg_q") * 10000 / col("base_q"))
            .cast("long")).as("drift_bp"),
        (col("base_q").isNull ||
          col("avg_q") < col("base_q") * minFactor).as("drifting"))
}
