package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** D17 — the A39 value-anomaly fence streamed. Replay proof: the
  * streamed flags equal the batch card's per event, the gate holds out
  * exactly the flagged set, the query is stateless, and unknown types
  * pass un-flagged. */
class StreamingAnomalySpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = graft.sources.Tables(spark, sfDir, "events")
  private lazy val fences = graft.analytics.LakeQueries
    .q38EventAnomaly(spark, sfDir)
    .select(col("event_type"), col("fence"))

  test("streamed flags equal the batch fence verdicts and keep no state") {
    val f = fences.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rows = events.select(col("event_id"), col("event_type"), col("value"))
      .as[(Long, String, Double)].collect()
    val want = rows.collect { case (id, t, v) if v > f(t) => id }.toSet
    assert(want.nonEmpty && want.size < rows.length, "fence must split the feed")

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String, Double)]
    val q = StreamingAnomaly.flagStream(
        stream.toDF().toDF("event_id", "event_type", "value"), fences)
      .writeStream.format("memory").queryName("anom_flags")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 3))
        .foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
      val got = spark.table("anom_flags")
        .where(col("is_anomaly")).select("event_id").as[Long].collect().toSet
      assert(got == want, "stream flags must equal the batch fence verdicts")
      val st = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
      assert(st.isEmpty, s"expected stateless query, got ${st.mkString(",")}")
    } finally q.stop()
  }

  test("the gate holds out exactly the flagged set; unknown types pass") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String, Double)]
    val q = StreamingAnomaly.gateStream(
        stream.toDF().toDF("event_id", "event_type", "value"), fences)
      .writeStream.format("memory").queryName("anom_clean")
      .outputMode("append").start()
    try {
      val f = fences.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val t0 = f.keys.min
      val feed = IndexedSeq(
        (1L, t0, f(t0) + 1.0),       // over the fence -> quarantined
        (2L, t0, f(t0) - 1.0),       // under -> clean
        (3L, "unknown_type", 1e12))  // no fence -> passes
      stream.addData(feed); q.processAllAvailable()
      val clean = spark.table("anom_clean").select("event_id").as[Long].collect().toSet
      assert(clean == Set(2L, 3L),
        s"gate must hold out the over-fence event and pass unknown types: $clean")
    } finally q.stop()
  }
}
