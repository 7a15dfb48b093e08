package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D18: the A40 volume monitor run on the LIVE feed — hourly windowed
  * counts per event type compared against a batch-fit baseline, so a
  * stalled producer (ratio → 0) or a replayed feed (ratio ≫ 2×) pages
  * within an hour instead of at tomorrow's daily card.
  *
  * This is the STATEFUL member of the intake-gate family: unlike
  * D13/D15–D17 (per-row projections), counting needs a windowed
  * aggregation, so the query carries watermark-bounded window state —
  * exactly D1's shape, plus the broadcast baseline join and the A40
  * integer-ratio arithmetic (baseline ships as 2×median hourly count,
  * an exact integer, so ratio_bp = events·20000 div base_x2 is the
  * same engine-exact expression the batch card uses). Baseline refresh
  * follows the D11/D14 current-table posture: the static side re-plans
  * per micro-batch.
  */
object StreamingVolume {

  /** Batch-fit hourly baseline: per event type, 2× the median hourly
    * count (an exact integer — median of integers interpolates at a
    * half). Computed from history, refreshed nightly. */
  def hourlyBaseline(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg((percentile(col("n"), lit(0.5)) * 2).cast("long").as("base_x2"))

  /** Windowed monitor over an arriving events frame (needs `ts`,
    * `event_type`): one row per finalized (hour, type) with the count,
    * the baseline, ratio_bp, and the ≥2× spike flag. Types without a
    * baseline report ratio_bp null (new type — B13's schema question,
    * same posture as D17). */
  def monitorStream(events: DataFrame, baseline: DataFrame,
                    watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("events"))
      .join(broadcast(baseline), Seq("event_type"), "left")
      .select(col("event_type"), col("window.start").as("hour"),
        col("events"), col("base_x2"),
        expr("events * 20000 div base_x2").as("ratio_bp"))
      .withColumn("is_spike",
        coalesce(col("ratio_bp") >= 20000, lit(false)).cast("int"))
}
