package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** D18 — the A40 volume monitor streamed. Replay proof: finalized
  * windows carry exactly the batch hourly counts and the batch ratio
  * arithmetic; the state is watermark-bounded window state. */
class StreamingVolumeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = graft.sources.Tables(spark, sfDir, "events")
    .select(col("ts"), col("event_type"))

  test("streamed hourly ratios equal the batch recount on finalized windows") {
    val baseline = StreamingVolume.hourlyBaseline(events)
    val base = baseline.as[(String, Long)].collect().toMap

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val q = StreamingVolume.monitorStream(
        stream.toDF().toDF("ts", "event_type"), baseline)
      .writeStream.format("memory").queryName("vol_mon")
      .outputMode("append").start()
    try {
      val rows = events.as[(Timestamp, String)].collect().sortBy(_._1.getTime)
      rows.grouped(math.max(1, rows.length / 4))
        .foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
      // advance the watermark far past the data so every window finalizes
      stream.addData((new Timestamp(rows.last._1.getTime + 86400000L), "flush"))
      q.processAllAvailable()
      val got = spark.table("vol_mon")
        .where(col("event_type") =!= "flush")
        .select(col("event_type"), col("hour"), col("events"),
          col("ratio_bp"), col("is_spike"))
        .as[(String, Timestamp, Long, Long, Int)].collect()
      assert(got.nonEmpty)
      // batch recount: hourly counts + the same integer arithmetic
      val want = rows.groupBy { case (ts, t) =>
        (t, ts.getTime - Math.floorMod(ts.getTime, 3600000L))
      }.map { case ((t, h), rs) => (t, h) -> rs.length.toLong }
      val gotMap = got.map(r => (r._1, r._2.getTime) -> ((r._3, r._4, r._5))).toMap
      assert(gotMap.keySet == want.keySet,
        s"every (type, hour) window must finalize exactly once")
      want.foreach { case ((t, h), n) =>
        val (evs, bp, spike) = gotMap((t, h))
        assert(evs == n, s"($t,$h): streamed count $evs vs batch $n")
        assert(bp == n * 20000 / base(t), s"($t,$h): ratio arithmetic")
        assert((spike == 1) == (bp >= 20000))
      }
      // stateful by design: the windowed aggregation carries state
      val st = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
      assert(st.nonEmpty, "windowed counting must carry watermark-bounded state")
    } finally q.stop()
  }
}
