package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** D23 — per-source text-quality drift on the intake feed. */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private val base0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def bump(h: Long) = new Timestamp(base0.getTime + h * 3600 * 1000)

  private def run(feed: Seq[(String, String, Timestamp)],
                  baseline: org.apache.spark.sql.DataFrame,
                  name: String) = {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(String, String, Timestamp)]
    val q = StreamingDrift.qualityDriftStream(
        stream.toDF().toDF("source", "text", "ts"), baseline, "ts")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      stream.addData(feed.toIndexedSeq)
      q.processAllAvailable()
      // append mode only emits CLOSED windows: advance the watermark
      stream.addData(IndexedSeq(("__wm__", "x", bump(9))))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).where(col("source") =!= "__wm__").collect()
  }

  test("replaying the standing corpus reads par and never drifts") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("source"), col("text"))
    val baseline = StreamingDrift.sourceBaseline(docs)
    val feed = docs.as[(String, String)].collect().toSeq
      .map { case (src, t) => (src, t, base0) }
    val out = run(feed, baseline, "drift_text_par")
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n_docs")).sum == feed.length.toLong)
    out.foreach { r =>
      assert(!r.getAs[Boolean]("drifting"), s"standing replay flagged: $r")
      // the window holds the exact training population: mean == baseline
      assert(math.abs(r.getAs[Long]("drift_bp") - 10000L) <= 1L, s"$r")
    }
  }

  test("a degraded feed trips the flag; a brand-new source is novel by definition") {
    val good = Seq.fill(40)("the quick brown fox jumps of and to in").mkString(" ")
    val standing = (1 to 20).map(i => ("src_a", good)) :+ (("src_b", good))
    val baseline = StreamingDrift.sourceBaseline(standing.toDF("source", "text"))

    val feed =
      (1 to 5).map(_ => ("src_a", "zzzz", base0)) ++           // junk burst
      (1 to 5).map(_ => ("src_b", good, base0)) ++             // healthy
      (1 to 3).map(_ => ("src_new", good, base0))              // no history
    val out = run(feed, baseline, "drift_text_junk")
      .map(r => r.getAs[String]("source") -> r).toMap

    assert(out("src_a").getAs[Boolean]("drifting"),
      s"the junk burst must trip the monitor: ${out("src_a")}")
    assert(out("src_a").getAs[Long]("drift_bp") < 8000L)
    assert(!out("src_b").getAs[Boolean]("drifting"))
    assert(out("src_new").getAs[Boolean]("drifting"),
      "a source with no baseline row is novel, not silent")
    assert(out("src_new").isNullAt(out("src_new").fieldIndex("base_q")))
  }

  test("multi-day replay: each day's windows score independently, late data is bounded by the watermark") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val good = Seq.fill(40)("the quick brown fox jumps of and to in").mkString(" ")
    val baseline = StreamingDrift.sourceBaseline(
      (1 to 10).map(_ => ("src", good)).toDF("source", "text"))

    val stream = MemoryStream[(String, String, Timestamp)]
    val q = StreamingDrift.qualityDriftStream(
        stream.toDF().toDF("source", "text", "ts"), baseline, "ts")
      .writeStream.format("memory").queryName("drift_days")
      .outputMode("append").start()
    try {
      // day 1: healthy feed in hour 0
      stream.addData((1 to 6).map(_ => ("src", good, bump(0))))
      q.processAllAvailable()
      // day 2 (24h later): the feed degrades — this also closes day 1
      stream.addData((1 to 4).map(_ => ("src", "zzzz", bump(24))))
      q.processAllAvailable()
      // a LATE day-1 event arriving after the watermark passed it: must
      // not reopen the closed window (bounded state, the D18 contract)
      stream.addData(IndexedSeq(("src", "zzzz", bump(0))))
      q.processAllAvailable()
      // close day 2
      stream.addData(IndexedSeq(("__wm__", "x", bump(48))))
      q.processAllAvailable()

      val out = spark.table("drift_days")
        .where(col("source") === "src").collect()
        .map(r => r.getAs[java.sql.Timestamp]("window_start") -> r).toMap
      assert(out.size == 2, s"one closed window per day: ${out.keys}")
      val Seq(day1, day2) = out.toSeq.sortBy(_._1.getTime).map(_._2)
      assert(!day1.getAs[Boolean]("drifting") &&
        day1.getAs[Long]("n_docs") == 6L,
        s"day 1 scored on its own healthy arrivals only (late junk dropped): $day1")
      assert(day2.getAs[Boolean]("drifting") &&
        day2.getAs[Long]("n_docs") == 4L,
        s"day 2's degradation flags without contaminating day 1: $day2")
    } finally q.stop()
  }

  test("streamed window means equal the batch recount through the shared kernel") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("source"), col("text"))
    val baseline = StreamingDrift.sourceBaseline(docs)
    val feed = docs.as[(String, String)].collect().toSeq
      .map { case (src, t) => (src, t, base0) }
    val out = run(feed, baseline, "drift_text_eq")
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("avg_q")).toMap
    val batch = docs
      .select(col("source"), graft.functions.TokenMarkerStats(col("text")).as("st"))
      .select(col("source"), graft.ops.Text.qualityScoreFromStats(col("st")).as("q"))
      .groupBy(col("source")).agg(round(avg(col("q")), 6).as("m"))
      .as[(String, Double)].collect().toMap
    assert(out == batch, "stream windows must recount exactly as the batch agg")
  }
}
