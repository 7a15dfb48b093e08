package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the bounded-interval join (SURVEY §2.D, the D6
  * batch operator made continuous) — purchases paired with the same
  * user's error events in the `windowSeconds` after them, as the two
  * event streams arrive.
  *
  * This face is deliberately ENGINE-NATIVE: Spark's stream-stream inner
  * join with watermarks on both sides and a time-interval predicate is
  * exactly this operator (StreamingSymmetricHashJoin). The interval
  * bounds tell the state store how long each side must be retained —
  * a purchase can stop waiting `windowSeconds + delay` past its event
  * time, an error immediately after the watermark passes it — so state
  * is bounded by the window and the allowed lateness, never by history.
  * Matches emit as soon as both rows have arrived (inner join needs no
  * watermark hold on output, only for state cleanup). The batch face
  * (graft.ops.RangeJoin) keeps the bucketed equi-join spelling the
  * oracle checks; StreamingRangeJoinSpec proves the two faces produce
  * the same pair set on replayed events.
  */
object StreamingRangeJoin {

  /** Matched (purchase_id, user_id, err_id, gap_s) pairs: error strictly
    * after the purchase, at most `windowSeconds` after (the batch face's
    * (t, t+W] window). Inputs need `event_id`, `user_id`, `ts`. */
  def errorsWithinWindow(purchases: DataFrame, errors: DataFrame,
                         windowSeconds: Long = 300L,
                         watermarkDelay: String = "10 minutes"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermarkDelay)
    val e = errors
      .select(col("user_id").as("__e_user"), col("event_id").as("err_id"),
        col("ts").as("e_ts"))
      .withWatermark("e_ts", watermarkDelay)
    p.join(e,
      col("user_id") === col("__e_user") &&
        col("e_ts") > col("p_ts") &&
        col("e_ts") <= col("p_ts") + expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(col("purchase_id"), col("user_id"), col("err_id"),
        (unix_timestamp(col("e_ts")) - unix_timestamp(col("p_ts"))).as("gap_s"))
  }
}
