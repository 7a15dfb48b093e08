package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bounded-interval (range) join — pair each left row with the right
  * rows of the same key falling in a time window after it.
  *
  * The naive spelling (`join(keys) WHERE right.ts BETWEEN …`) plans the
  * range as a POST-JOIN filter: every key's full left×right product
  * materializes through the join before the window is applied, and one
  * hot key stalls the stage. The scale-safe plan quantizes time into
  * buckets the width of the window: a window (t, t+W] can only reach
  * right rows in time-buckets b(t) and b(t)+1, so replicating the right
  * side into its own bucket and its predecessor turns the range join
  * into an EQUI-join on (key, bucket) — the per-task unit becomes one
  * key×bucket cell, never one key's whole history, and hot keys gain
  * parallelism along the time axis. A right row's two copies land in
  * different buckets, so no pair can match twice.
  *
  * Window arithmetic runs on second-truncated epochs (floor) — the
  * definition the DuckDB oracle reproduces exactly.
  */
object RangeJoin {

  /** Rows (left.*, right-nonkey.*) where `rightTime` lies in
    * (`leftTime`, `leftTime` + `windowSeconds`]. Right non-key columns
    * must not collide with left's — rename before calling. */
  def withinWindow(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String,
                   windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, s"window must be positive: $windowSeconds")
    val ls = unix_timestamp(col(leftTime))
    val rs = unix_timestamp(col(rightTime))
    val l = left.withColumn("__ls", ls)
      .withColumn("__bucket", floor(ls / windowSeconds))
    val rb = floor(rs / windowSeconds)
    val r = right.withColumn("__rs", rs)
      .withColumn("__bucket", explode(array(rb, rb - 1)))
    l.join(r, keys :+ "__bucket")
      .where(col("__rs") > col("__ls") &&
        col("__rs") <= col("__ls") + windowSeconds)
      .drop("__ls", "__rs", "__bucket")
  }

  /** Query face (`range_join`): for every purchase, the same user's
    * error events in the 5 minutes after it — the "did the checkout
    * throw" funnel join. Purchases with a quiet window keep zero
    * counts via the final left join (the bucketed join itself stays
    * inner and narrow). */
  def rangeJoinErrors(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("__ets"),
        col("event_id").as("__err_id"), col("value").as("__err_value"))
    val hits = withinWindow(purchases, errors, Seq("user_id"), "ts", "__ets", 300L)
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n"), sum(col("__err_value")).as("v"))
    purchases.join(hits, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        coalesce(col("n"), lit(0L)).as("n_errors"),
        round(coalesce(col("v"), lit(0.0)), 2).as("err_value"))
      .orderBy(col("event_id"))
  }
}
