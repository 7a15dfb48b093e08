package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming point-in-time attribution — the streaming face of
  * [[graft.ops.AsofJoin]] (SURVEY §2.D roadmap: stream-stream as-of).
  * For every purchase event, the same user's most recent click at or
  * before it — the real-time spelling of click→purchase attribution.
  *
  * Spark's stream-stream joins cover equi and interval predicates but
  * not "the LATEST right row ≤ left time", so this is custom state over
  * `flatMapGroupsWithState` keyed by user (the (c) extension tier:
  * compose > Expression > custom state), watermark-bounded on both
  * sides:
  *
  *  - A purchase finalizes only when the watermark passes its event
  *    time — until then a late-but-admissible click could still win —
  *    and emits exactly once (Append mode), null-attributed if no click
  *    preceded it, matching the batch face's left-join semantics.
  *  - Click history is compacted against the watermark: every click
  *    strictly below it collapses into ONE anchor record (any future
  *    admissible purchase is at/after the watermark, so only the latest
  *    such click can ever be the answer). Per-user state is therefore
  *    one anchor + the in-watermark-window clicks + in-flight purchases
  *    — bounded by the delay window, never by history. The anchor gives
  *    the batch face's unbounded lookback with O(1) retained state.
  *
  * At 100 TB/day the plan shuffles once on user_id into the state
  * store, same as the sessionizer; reading the events stream twice (one
  * filter per side) never happens — both types ride one stream and
  * split inside the state function.
  */
object StreamingAsof {

  final case class Ev(user_id: Long, event_id: Long, ts: Timestamp, is_click: Boolean)
  final case class Click(sec: Long, id: Long)
  final case class Purchase(sec: Long, id: Long)
  final case class AsofState(anchor: Option[Click], clicks: Vector[Click],
                             pending: Vector[Purchase])
  final case class Attribution(event_id: Long, user_id: Long, purchase_sec: Long,
                               click_id: Option[Long], click_sec: Option[Long],
                               gap_s: Option[Long])

  /** State transition for one user and micro-batch (or timeout wake-up:
    * empty `rows`). Clicks dedupe per second keeping the max event_id —
    * the batch face's (user, ts) dedupe — so tie resolution is identical
    * on both faces. */
  private def updateUser(userId: Long, rows: Iterator[Ev],
                         state: GroupState[AsofState]): Iterator[Attribution] = {
    val wmSec = state.getCurrentWatermarkMs() / 1000
    val st = state.getOption.getOrElse(AsofState(None, Vector.empty, Vector.empty))
    val (newClicks, newPurchases) = rows.toVector.partition(_.is_click)

    val clicks = (st.clicks ++ newClicks.map(e => Click(e.ts.getTime / 1000, e.event_id)))
      .groupBy(_.sec).map { case (s, cs) => Click(s, cs.map(_.id).max) }
      .toVector.sortBy(_.sec)
    val pending = st.pending ++
      newPurchases.map(e => Purchase(e.ts.getTime / 1000, e.event_id))

    // finalize purchases strictly below the watermark BEFORE compacting:
    // clicks between a pending purchase and the advanced watermark exist
    // in `clicks` and must NOT collapse into the anchor first (they would
    // win with a negative gap). The prior anchor is always a valid "<= p"
    // candidate: every still-pending p satisfied p >= watermark when last
    // seen, and the anchor is strictly below that watermark.
    val (done, wait) = pending.partition(_.sec < wmSec)
    val out = done.sortBy(p => (p.sec, p.id)).map { p =>
      val best = (st.anchor.toVector ++ clicks.filter(_.sec <= p.sec))
        .sortBy(c => (c.sec, c.id)).lastOption
      Attribution(p.id, userId, p.sec,
        best.map(_.id), best.map(_.sec), best.map(c => p.sec - c.sec))
    }

    // now compact clicks strictly below the watermark into the single
    // anchor: every remaining or future admissible purchase is at/after
    // the watermark, so only the latest such click can ever win
    val (belowWm, live) = clicks.partition(_.sec < wmSec)
    val anchor = (st.anchor.toVector ++ belowWm).sortBy(c => (c.sec, c.id)).lastOption

    if (wait.isEmpty && live.isEmpty && anchor.isEmpty) state.remove()
    else {
      state.update(AsofState(anchor, live, wait))
      // wake when the watermark passes the earliest in-flight purchase
      // (its sec is >= wmSec here, so the stamp is always > watermark)
      if (wait.nonEmpty)
        state.setTimeoutTimestamp(wait.map(_.sec).min * 1000 + 1000)
    }
    out.iterator
  }

  /** Continuous attribution over a streaming events frame (needs
    * `user_id`, `event_id`, `ts`, `event_type`). Emits one record per
    * purchase once the watermark finalizes it. */
  def attributionStream(events: DataFrame,
                        watermarkDelay: String = "1 hour"): Dataset[Attribution] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts"), (col("event_type") === "click").as("is_click"))
      .withWatermark("ts", watermarkDelay)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, Attribution](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateUser)
  }
}
