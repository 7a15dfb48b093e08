package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class EventsPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private val sample = Seq(
    (ts(0, 10), "click", 1.0), (ts(0, 40), "click", 2.0), (ts(0, 50), "view", 3.0),
    (ts(1, 5), "click", 4.0), (ts(2, 30), "view", 5.0), (ts(5, 59), "click", 6.0))

  test("MemoryStream run of windowedCounts matches the batch plan") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val q = EventsPipeline
      .windowedCounts(stream.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("win_complete")
      .outputMode("complete").start()
    try {
      stream.addData(sample.take(3))
      q.processAllAvailable()
      stream.addData(sample.drop(3))
      q.processAllAvailable()
      val streamed = spark.table("win_complete").collect().toSet
      val batch = EventsPipeline
        .windowedCounts(sample.toDF("ts", "event_type", "value")).collect().toSet
      assert(streamed == batch,
        "the same transform must produce identical results in both modes")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("checkpoint restart ingests only new files, no duplicate windows") {
    val src = tmpDir("ep-rs-src"); val out = tmpDir("ep-rs-out"); val chk = tmpDir("ep-rs-chk")
    val batch1 = sample.take(4).toDF("ts", "event_type", "value")
    batch1.write.mode("append").parquet(src)
    val q1 = EventsPipeline.start(spark, src, batch1.schema, out, chk)
    q1.awaitTermination(120000)
    val afterFirst = spark.read.parquet(out).count()
    // drop more files, restart from the SAME checkpoint
    sample.drop(4).toDF("ts", "event_type", "value").write.mode("append").parquet(src)
    val q2 = EventsPipeline.start(spark, src, batch1.schema, out, chk)
    q2.awaitTermination(120000)
    val finalRows = spark.read.parquet(out).collect().toSet
    assert(finalRows.size >= afterFirst,
      "restart must extend, never shrink, the output")
    assert(finalRows.size == finalRows.map(_.toString).size)
    val batch = EventsPipeline.windowedCounts(sample.toDF("ts", "event_type", "value"))
      .collect().toSet
    assert(finalRows.subsetOf(batch),
      "restarted stream must agree with the batch plan — no dupes, no drift")
  }

  test("stream-stream interval join correlates events within the band") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, String)]
    val buys = MemoryStream[(Long, Timestamp, String)]
    val q = EventsPipeline.correlatedStream(
        clicks.toDF().toDF("user_id", "ts", "event_type"),
        buys.toDF().toDF("user_id", "ts", "event_type"))
      .writeStream.format("memory").queryName("correlated")
      .outputMode("append").start()
    try {
      clicks.addData((7L, ts(1, 0), "click"), (9L, ts(1, 0), "click"))
      buys.addData(
        (7L, ts(1, 20), "purchase"),   // within 30 min of user 7's click
        (7L, ts(3, 0), "purchase"),    // outside the band
        (8L, ts(1, 5), "purchase"))    // no matching click user
      q.processAllAvailable()
      // advance both watermarks so in-band results flush
      clicks.addData((99L, ts(9, 0), "click")); buys.addData((99L, ts(9, 1), "x"))
      q.processAllAvailable()
      val got = spark.table("correlated")
        .select("user_id", "l_type", "r_type").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got.contains((7L, "click", "purchase")))
      assert(!got.exists(_._1 == 8L), "unmatched user must not appear")
      assert(got.count(_._1 == 7L) == 1, "the out-of-band purchase must not join")
    } finally q.stop()
  }

  test("dedupedStream drops re-delivered event ids within the watermark") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Double)]
    val q = EventsPipeline
      .dedupedStream(stream.toDF().toDF("event_id", "ts", "value"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts(0, 0), 1.0), (2L, ts(0, 5), 2.0))
      q.processAllAvailable()
      // re-deliver event 1 (same id, later ts) plus a new event
      stream.addData((1L, ts(0, 10), 1.0), (3L, ts(0, 15), 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream")
        .select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L),
        "each event id must be emitted exactly once within the watermark")
    } finally q.stop()
  }

  test("file-source pipeline emits watermark-closed windows exactly once") {
    val src = tmpDir("ep-src"); val out = tmpDir("ep-out"); val chk = tmpDir("ep-chk")
    val events = sample.toDF("ts", "event_type", "value")
    events.write.mode("overwrite").parquet(src)
    val q = EventsPipeline.start(spark, src, events.schema, out, chk)
    q.awaitTermination(120000)
    val streamed = spark.read.parquet(out).collect().toSet
    val batch = EventsPipeline.windowedCounts(events).collect().toSet
    assert(streamed.nonEmpty, "at least the early windows are past the watermark")
    assert(streamed.subsetOf(batch), "append mode may hold open windows, never invent rows")
    // windows more than watermark (2h) behind the max event (05:59) are closed
    val closed = batch.filter(_.getString(0) < "2024-01-01 03:00:00")
    assert(closed.subsetOf(streamed), "every closed window must have been emitted")
  }
}
