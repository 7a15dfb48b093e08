package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int, s: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:$s%02d")

  private type Ev = (Long, Long, Timestamp)

  private def run(name: String, windowS: Long = 300L)(
      feed: (MemoryStream[Ev], MemoryStream[Ev],
      org.apache.spark.sql.streaming.StreamingQuery) => Unit): Set[(Long, Long, Long)] = {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pStream = MemoryStream[Ev]
    val eStream = MemoryStream[Ev]
    val q = StreamingRangeJoin.errorsWithinWindow(
        pStream.toDF().toDF("event_id", "user_id", "ts"),
        eStream.toDF().toDF("event_id", "user_id", "ts"), windowS)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      feed(pStream, eStream, q)
      spark.table(name).select("purchase_id", "user_id", "err_id")
        .as[(Long, Long, Long)].collect().toSet
    } finally q.stop()
  }

  test("interval bounds: strictly-after start, inclusive 300s end, same user only") {
    val got = run("srj_bounds") { (p, e, q) =>
      p.addData((1L, 7L, ts(1, 0)))
      e.addData(
        (10L, 7L, ts(1, 0)),        // same second: excluded (strict >)
        (11L, 7L, ts(1, 2)),        // inside
        (12L, 7L, ts(1, 5)),        // exactly +300s: included
        (13L, 7L, ts(1, 5, 1)),     // +301s: excluded
        (14L, 9L, ts(1, 2)))        // other user: excluded
      q.processAllAvailable()
    }
    assert(got == Set((1L, 7L, 11L), (1L, 7L, 12L)), s"got $got")
  }

  test("matches emit across micro-batches in either arrival order") {
    val got = run("srj_order") { (p, e, q) =>
      // error arrives BEFORE its purchase, in an earlier batch
      e.addData((10L, 7L, ts(2, 1)))
      q.processAllAvailable()
      p.addData((1L, 7L, ts(2, 0)))
      q.processAllAvailable()
      // and a purchase waiting for a later error
      p.addData((2L, 9L, ts(2, 10)))
      q.processAllAvailable()
      e.addData((11L, 9L, ts(2, 12)))
      q.processAllAvailable()
    }
    assert(got == Set((1L, 7L, 10L), (2L, 9L, 11L)), s"got $got")
  }

  test("replaying the events table matches the batch bucketed range join") {
    val ev = graft.sources.Tables(spark, sfDir, "events")
      // second-truncated input for BOTH faces: the batch face windows on
      // unix_timestamp floors, the native join on raw timestamps
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        timestamp_seconds(unix_timestamp(col("ts"))).as("ts"), col("event_type"))
    val purchases = ev.where(col("event_type") === "purchase").drop("event_type")
    val errors = ev.where(col("event_type") === "error").drop("event_type")

    // sf0.001 has no (purchase, error) pair within 5 minutes; an hour-wide
    // window exercises both faces on the same predicate with real matches
    val windowS = 3600L
    val batch = graft.ops.RangeJoin.withinWindow(
        purchases.select(col("event_id"), col("user_id"), col("ts")),
        errors.select(col("user_id"), col("ts").as("__ets"),
          col("event_id").as("__err_id")),
        Seq("user_id"), "ts", "__ets", windowS)
      .select("event_id", "user_id", "__err_id")
      .as[(Long, Long, Long)].collect().toSet

    val pRows = purchases.as[Ev].collect().sortBy(_._3.getTime)
    val eRows = errors.as[Ev].collect().sortBy(_._3.getTime)
    val streaming = run("srj_replay", windowS) { (p, e, q) =>
      val pChunks = pRows.grouped(math.max(1, pRows.length / 5)).toSeq
      val eChunks = eRows.grouped(math.max(1, eRows.length / 5)).toSeq
      for (i <- 0 until math.max(pChunks.length, eChunks.length)) {
        if (i < pChunks.length) p.addData(pChunks(i).toIndexedSeq)
        if (i < eChunks.length) e.addData(eChunks(i).toIndexedSeq)
        q.processAllAvailable()
      }
    }
    assert(streaming == batch,
      s"face mismatch: ${(batch diff streaming).take(5)} missing, " +
        s"${(streaming diff batch).take(5)} extra")
    assert(batch.nonEmpty, "replay sanity: the window must match something")
  }
}
