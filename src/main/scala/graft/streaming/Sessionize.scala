package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.sources.Tables

/** Gap-based sessionization of the events stream (SURVEY §2.D).
  *
  * Batch face: session boundaries via lag + cumulative-sum windows — one
  * shuffle on user_id, fully oracle-checkable. Streaming face: the same
  * semantics as custom state over `flatMapGroupsWithState` with an
  * event-time timeout — sessions close either when a later event arrives
  * beyond the gap or when the watermark passes the open session's end.
  * At 100 TB the state store holds ONE small record per active user, and
  * both faces shuffle only on user_id.
  */
object Sessionize {

  /** Inactivity gap that closes a session. */
  val GapSeconds: Long = 1800L

  // ---------- batch face ----------

  /** Adds `sec` (event epoch-seconds) and `session_idx` (1-based per
    * user) to an events frame. */
  def assignSessions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("__gap", col("sec") - lag(col("sec"), 1).over(byUser))
      .withColumn("__is_start",
        when(col("__gap").isNull || col("__gap") > GapSeconds, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("__is_start")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__gap", "__is_start")
  }

  /** D3 query: per-user session statistics (oracle-checked). */
  def streamSessionize(s: SparkSession, dir: String): DataFrame =
    assignSessions(Tables(s, dir, "events"))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("sec")) - min(col("sec"))).as("dur"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("dur")).as("max_dur_s"),
        min(col("dur")).as("min_dur_s"))
      .orderBy(col("user_id"))

  // ---------- engine-native face ----------

  /** The same gap sessions via Spark's built-in `session_window`
    * aggregation — the engine-native spelling of [[assignSessions]].
    * Spark's gap bound is EXCLUSIVE (an event exactly `gap` after the
    * previous one starts a new session) where the custom faces are
    * inclusive (`__gap > GapSeconds` splits), so the native gap is
    * `GapSeconds + 1` over the second-truncated timestamps the other
    * faces use. `session_window.end` is last-event + gap, so `end_sec`
    * subtracts the gap back to the last event — the
    * [[sessionizeStream]] Session shape. */
  def sessionizeNativeBatch(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), timestamp_seconds(unix_timestamp(col("ts"))).as("tsec"))
      .groupBy(col("user_id"), session_window(col("tsec"), s"${GapSeconds + 1} seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("start_sec"),
        (unix_timestamp(col("session_window.end")) - (GapSeconds + 1)).as("end_sec"),
        col("n_events"))

  /** Streaming spelling of the native face: watermark + session_window in
    * Append mode emits each session once its window can no longer grow —
    * the engine-managed counterpart of [[sessionizeStream]]'s custom
    * state (which remains the teaching/extension path: per-event output
    * shapes or custom merge rules need `flatMapGroupsWithState`). */
  def sessionizeStreamNative(events: DataFrame,
                             watermarkDelay: String = "1 hour"): DataFrame =
    events
      .select(col("user_id"), timestamp_seconds(unix_timestamp(col("ts"))).as("tsec"))
      .withWatermark("tsec", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("tsec"), s"${GapSeconds + 1} seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("start_sec"),
        (unix_timestamp(col("session_window.end")) - (GapSeconds + 1)).as("end_sec"),
        col("n_events"))

  // ---------- streaming face ----------

  final case class Event(user_id: Long, ts: Timestamp)
  final case class OpenSession(start: Long, last: Long, n: Long)
  /** State = ALL of a user's not-yet-closed spans. Keeping every span
    * until the watermark passes `last + gap` (not just the newest one)
    * means an above-watermark event in a later batch can still bridge
    * two apparent sessions — emission happens exclusively on timeout,
    * exactly when no in-watermark event can change the span again. */
  final case class OpenSessions(spans: Vector[OpenSession])
  final case class Session(user_id: Long, start_sec: Long, end_sec: Long, n_events: Long)

  private def chainMerge(spans: Vector[OpenSession]): Vector[OpenSession] =
    spans.sortBy(_.start).foldLeft(Vector.empty[OpenSession]) { (acc, sp) =>
      acc.lastOption match {
        case Some(p) if sp.start <= p.last + GapSeconds =>
          acc.init :+ OpenSession(p.start, math.max(p.last, sp.last), p.n + sp.n)
        case _ => acc :+ sp
      }
    }

  /** Session logic for one user and one micro-batch: merge new events
    * into the state's span set; emit spans only when the watermark has
    * passed their close (timeout). */
  private def updateUser(userId: Long, events: Iterator[Event],
                         state: GroupState[OpenSessions]): Iterator[Session] = {
    val out = scala.collection.mutable.ListBuffer.empty[Session]
    val watermark = state.getCurrentWatermarkMs()

    val eventSpans = events.toSeq.map(_.ts.getTime / 1000).sorted
      .map(sec => OpenSession(sec, sec, 1)).toVector
    val merged = chainMerge(
      state.getOption.map(_.spans).getOrElse(Vector.empty) ++ eventSpans)

    // a span is closed once no admissible event can extend it: the
    // watermark has passed its last event + gap
    val (closed, open) = merged.partition(s => (s.last + GapSeconds) * 1000 <= watermark)
    closed.foreach(s => out += Session(userId, s.start, s.last, s.n))
    if (open.isEmpty) state.remove()
    else {
      state.update(OpenSessions(open))
      state.setTimeoutTimestamp(open.map(s => (s.last + GapSeconds) * 1000).min)
    }
    out.iterator
  }

  /** Continuous sessionization over a streaming events frame (needs
    * `ts` + `user_id`). Emits one record per CLOSED session. */
  def sessionizeStream(events: DataFrame,
                       watermarkDelay: String = "1 hour"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), col("ts"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateUser)
  }
}
