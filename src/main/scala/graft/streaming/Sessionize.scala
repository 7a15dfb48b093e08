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

  // ---------- streaming face ----------

  final case class Event(user_id: Long, ts: Timestamp)
  final case class OpenSession(start: Long, last: Long, n: Long)
  final case class Session(user_id: Long, start_sec: Long, end_sec: Long, n_events: Long)

  /** Session-closing logic for one user and one micro-batch. */
  private def updateUser(userId: Long, events: Iterator[Event],
                         state: GroupState[OpenSession]): Iterator[Session] = {
    val out = scala.collection.mutable.ListBuffer.empty[Session]
    if (state.hasTimedOut) {
      val s = state.get
      out += Session(userId, s.start, s.last, s.n)
      state.remove()
    } else {
      // chain-merge: fold the batch's sorted events into local spans,
      // slot the open-session span among them, and merge every pair of
      // adjacent spans within the gap. This reproduces the batch face
      // for ALL orderings within one micro-batch (orphans that a later
      // event bridges, mutual orphans, back-extension). The one
      // remaining approximation — a late event bridging a session
      // ALREADY emitted in an earlier batch — is inherent to append
      // mode (emitted rows cannot be retracted).
      val eventSpans = events.toSeq.map(_.ts.getTime / 1000).sorted
        .foldLeft(Vector.empty[OpenSession]) { (acc, sec) =>
          acc.lastOption match {
            case Some(p) if sec <= p.last + GapSeconds =>
              acc.init :+ OpenSession(p.start, math.max(p.last, sec), p.n + 1)
            case _ => acc :+ OpenSession(sec, sec, 1)
          }
        }
      val merged = (state.getOption.toVector ++ eventSpans)
        .sortBy(_.start)
        .foldLeft(Vector.empty[OpenSession]) { (acc, sp) =>
          acc.lastOption match {
            case Some(p) if sp.start <= p.last + GapSeconds =>
              acc.init :+ OpenSession(p.start, math.max(p.last, sp.last), p.n + sp.n)
            case _ => acc :+ sp
          }
        }
      if (merged.nonEmpty) {
        merged.init.foreach(s => out += Session(userId, s.start, s.last, s.n))
        val open = merged.last
        state.update(open)
        // close the open session once the watermark passes last + gap
        state.setTimeoutTimestamp((open.last + GapSeconds) * 1000)
      }
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
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateUser)
  }
}
