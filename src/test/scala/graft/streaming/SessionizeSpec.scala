package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("batch assignSessions splits on gaps > 30 min") {
    val events = Seq(
      (7L, 1L, ts(0, 0)), (7L, 2L, ts(0, 10)),            // session 1
      (7L, 3L, ts(1, 0)), (7L, 4L, ts(1, 20)),            // session 2 (50 min gap)
      (9L, 5L, ts(0, 0))                                  // other user
    ).toDF("user_id", "event_id", "ts")
    val sess = Sessionize.assignSessions(events)
      .select("user_id", "event_id", "session_idx")
      .as[(Long, Long, Long)].collect().toSet
    assert(sess == Set((7L, 1L, 1L), (7L, 2L, 1L), (7L, 3L, 2L), (7L, 4L, 2L), (9L, 5L, 1L)))
  }

  test("flatMapGroupsWithState emits closed sessions matching batch semantics") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp)]
    val q = Sessionize.sessionizeStream(stream.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 7: two events 10 min apart, then a 2h gap, then one more
      stream.addData((7L, ts(0, 0)), (7L, ts(0, 10)))
      q.processAllAvailable()
      stream.addData((7L, ts(2, 10)))   // closes session 1 via gap
      q.processAllAvailable()
      // advance the watermark far enough to time out the open session
      stream.addData((99L, ts(9, 0)))
      q.processAllAvailable()
      stream.addData((99L, ts(12, 0)))
      q.processAllAvailable()
      val got = spark.table("sessions")
        .select("user_id", "start_sec", "end_sec", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
      def sec(t: Timestamp) = t.getTime / 1000
      assert(got.contains((7L, sec(ts(0, 0)), sec(ts(0, 10)), 2L)),
        s"gap-closed session missing from $got")
      assert(got.contains((7L, sec(ts(2, 10)), sec(ts(2, 10)), 1L)),
        s"timeout-closed session missing from $got")
    } finally q.stop()
  }

  test("late out-of-order events extend the open session or orphan-close") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp)]
    val q = Sessionize.sessionizeStream(stream.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    try {
      stream.addData((7L, ts(2, 0)))          // watermark -> 1:00 after batch
      q.processAllAvailable()
      // 1:10 is > watermark but > gap before the open session -> orphan;
      // 1:50 is within the gap band -> pulls session start back
      stream.addData((7L, ts(1, 10)), (7L, ts(1, 50)))
      q.processAllAvailable()
      stream.addData((99L, ts(9, 0)))
      q.processAllAvailable()
      stream.addData((99L, ts(12, 0)))        // advance watermark: timeout flush
      q.processAllAvailable()
      def sec(t: Timestamp) = t.getTime / 1000
      val got = spark.table("late_sessions")
        .select("user_id", "start_sec", "end_sec", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got.contains((7L, sec(ts(1, 10)), sec(ts(1, 10)), 1L)),
        s"orphan session missing from $got")
      assert(got.contains((7L, sec(ts(1, 50)), sec(ts(2, 0)), 2L)),
        s"back-extended session missing from $got")
    } finally q.stop()
  }

  test("a later event in the same batch bridges an apparent orphan") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp)]
    val q = Sessionize.sessionizeStream(stream.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("bridge_sessions")
      .outputMode("append").start()
    try {
      stream.addData((7L, ts(2, 0)))
      q.processAllAvailable()
      // 1:25 alone would orphan (gap to 2:00 is 35 min) but 1:50 chains
      // 1:25 -> 1:50 -> 2:00 into ONE session, like the batch face
      stream.addData((7L, ts(1, 25)), (7L, ts(1, 50)))
      q.processAllAvailable()
      stream.addData((99L, ts(9, 0)))
      q.processAllAvailable()
      stream.addData((99L, ts(12, 0)))
      q.processAllAvailable()
      def sec(t: Timestamp) = t.getTime / 1000
      val got = spark.table("bridge_sessions")
        .select("user_id", "start_sec", "end_sec", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got.contains((7L, sec(ts(1, 25)), sec(ts(2, 0)), 3L)),
        s"chained events must form one session, got $got")
      assert(!got.contains((7L, sec(ts(1, 25)), sec(ts(1, 25)), 1L)),
        "no spurious orphan for a bridgeable event")
    } finally q.stop()
  }

  test("an event in a LATER batch bridges two spans not yet past the watermark") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp)]
    val q = Sessionize.sessionizeStream(stream.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("xbatch_sessions")
      .outputMode("append").start()
    try {
      // two spans 35 min apart — apparently separate sessions, but the
      // watermark hasn't closed the first, so neither may emit yet
      stream.addData((7L, ts(2, 0)), (7L, ts(2, 35)))
      q.processAllAvailable()
      assert(spark.table("xbatch_sessions").count() == 0,
        "nothing may emit before the watermark passes a span's close")
      // a later batch delivers the bridging event (above watermark)
      stream.addData((7L, ts(2, 15)))
      q.processAllAvailable()
      stream.addData((99L, ts(9, 0)))
      q.processAllAvailable()
      stream.addData((99L, ts(12, 0)))
      q.processAllAvailable()
      def sec(t: Timestamp) = t.getTime / 1000
      val got = spark.table("xbatch_sessions")
        .select("user_id", "start_sec", "end_sec", "n_events")
        .as[(Long, Long, Long, Long)].collect().filter(_._1 == 7L).toSet
      assert(got == Set((7L, sec(ts(2, 0)), sec(ts(2, 35)), 3L)),
        s"the cross-batch bridge must yield ONE session, got $got")
    } finally q.stop()
  }

  /** Custom batch face reduced to the native face's (user, start, end, n)
    * session shape, for face-agreement comparison. */
  private def customSessions(events: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.functions._
    Sessionize.assignSessions(events)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("sec")).as("start_sec"), max(col("sec")).as("end_sec"),
        count(lit(1)).as("n_events"))
      .select("user_id", "start_sec", "end_sec", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("native session_window face agrees with the custom face incl. the exact-gap boundary") {
    val events = Seq(
      (7L, 1L, ts(0, 0)), (7L, 2L, ts(0, 30)),  // gap == 1800 s exactly: same session
      (7L, 3L, ts(1, 1)),                        // gap == 1860 s: splits
      (9L, 4L, ts(0, 0))
    ).toDF("user_id", "event_id", "ts")
    val native = Sessionize.sessionizeNativeBatch(events)
      .select("user_id", "start_sec", "end_sec", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(native == customSessions(events),
      s"native face diverges from custom face: $native")
    def sec(t: Timestamp) = t.getTime / 1000
    assert(native.contains((7L, sec(ts(0, 0)), sec(ts(0, 30)), 2L)),
      "an exactly-gap-apart event must stay in the session (inclusive bound)")
  }

  test("native session_window face agrees with the custom face on the sf0.001 events table") {
    val events = graft.sources.Tables(spark, sfDir, "events")
    val native = Sessionize.sessionizeNativeBatch(events)
      .select("user_id", "start_sec", "end_sec", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    val custom = customSessions(events)
    assert(native == custom,
      s"face disagreement: ${(native diff custom).take(3)} vs ${(custom diff native).take(3)}")
  }

  test("streaming native session_window face emits closed sessions in Append mode") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp)]
    val q = Sessionize.sessionizeStreamNative(stream.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("native_sessions")
      .outputMode("append").start()
    try {
      stream.addData((7L, ts(0, 0)), (7L, ts(0, 10)))
      q.processAllAvailable()
      // advance the watermark far past 0:10 + gap so the session finalizes
      stream.addData((99L, ts(9, 0)))
      q.processAllAvailable()
      stream.addData((99L, ts(12, 0)))
      q.processAllAvailable()
      def sec(t: Timestamp) = t.getTime / 1000
      val got = spark.table("native_sessions")
        .select("user_id", "start_sec", "end_sec", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got.contains((7L, sec(ts(0, 0)), sec(ts(0, 10)), 2L)),
        s"native streaming face must emit the closed session, got $got")
    } finally q.stop()
  }

  test("stream_sessionize query matches its own invariants at sf0.001") {
    val r = Sessionize.streamSessionize(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_sessions") >= 1L)
      assert(row.getAs[Long]("n_events") >= row.getAs[Long]("n_sessions"))
      assert(row.getAs[Long]("max_dur_s") >= row.getAs[Long]("min_dur_s"))
    }
  }
}
