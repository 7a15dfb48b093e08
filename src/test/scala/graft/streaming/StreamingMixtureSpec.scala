package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** D24 — source-mix drift on the intake feed. */
class StreamingMixtureSpec extends SparkSpec {
  import spark.implicits._

  private val base0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def bump(h: Long) = new Timestamp(base0.getTime + h * 3600 * 1000)

  private def run(feed: Seq[(String, String, Timestamp)],
                  baseline: org.apache.spark.sql.DataFrame,
                  name: String) = {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(String, String, Timestamp)]
    val q = StreamingMixture.shareDriftStream(
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

  test("replaying the standing corpus reads par on every source") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("source"), col("text"))
    val baseline = StreamingMixture.sourceShareBaseline(docs)
    val feed = docs.as[(String, String)].collect().toSeq
      .map { case (src, t) => (src, t, base0) }
    val out = run(feed, baseline, "mix_par")
    assert(out.length == baseline.count())
    out.foreach { r =>
      // identical totals both sides → identical floor-div shares
      assert(r.getAs[Long]("share_bp") == r.getAs[Long]("base_bp"),
        s"standing replay must read par: $r")
      assert(!r.getAs[Boolean]("drifted"), s"standing replay flagged: $r")
    }
    assert(out.map(_.getAs[Long]("n_docs")).sum == feed.length.toLong)
  }

  test("a flooding source trips the flag both ways; a new source is novel") {
    val txt = "the quick brown fox jumps over the lazy dog again and again"
    // standing mix: a and b at 50/50
    val standing = ((1 to 10).map(_ => ("src_a", txt)) ++
      (1 to 10).map(_ => ("src_b", txt))).toDF("source", "text")
    val baseline = StreamingMixture.sourceShareBaseline(standing)
    // live window: a floods 9:1, c appears unannounced
    val feed =
      (1 to 18).map(_ => ("src_a", txt, base0)) ++
      (1 to 2).map(_ => ("src_b", txt, base0)) ++
      (1 to 2).map(_ => ("src_c", txt, base0))
    val out = run(feed, baseline, "mix_flood")
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out("src_a").getAs[Boolean]("drifted"),
      s"flooded source must trip: ${out("src_a")}")
    assert(out("src_a").getAs[Long]("share_bp") > 5000L + 1500L)
    assert(out("src_b").getAs[Boolean]("drifted"),
      s"starved source must trip: ${out("src_b")}")
    assert(out("src_c").getAs[Boolean]("drifted"),
      "a source with no baseline row is novel, not silent")
    assert(out("src_c").isNullAt(out("src_c").fieldIndex("base_bp")))
    // shares within the window must sum to ~10000 (floor slack)
    val tot = out.values.map(_.getAs[Long]("share_bp")).sum
    assert(tot > 10000 - out.size && tot <= 10000, s"share sum $tot")
  }

  test("windows aggregate independently and replay equals the batch face") {
    val txt = "one two three four five six seven eight nine ten"
    val standing = ((1 to 5).map(_ => ("src_a", txt)) ++
      (1 to 5).map(_ => ("src_b", txt))).toDF("source", "text")
    val baseline = StreamingMixture.sourceShareBaseline(standing)
    // hour 0 balanced, hour 2 skewed — each window judged on its own mix
    val feed =
      (1 to 4).map(_ => ("src_a", txt, bump(0))) ++
      (1 to 4).map(_ => ("src_b", txt, bump(0))) ++
      (1 to 6).map(_ => ("src_a", txt, bump(2))) ++
      (1 to 1).map(_ => ("src_b", txt, bump(2)))
    val out = run(feed, baseline, "mix_windows")
    val h0 = out.filter(_.getAs[Timestamp]("window_start") == bump(0))
    val h2 = out.filter(_.getAs[Timestamp]("window_start") == bump(2))
    assert(h0.forall(!_.getAs[Boolean]("drifted")), "balanced hour must not trip")
    assert(h2.exists(_.getAs[Boolean]("drifted")), "skewed hour must trip")
    // replay parity: the SAME transform over the feed as a batch frame
    // yields the identical rows (ignoring emission order)
    val batch = StreamingMixture.shareDriftStream(
        feed.toDF("source", "text", "ts"), baseline, "ts")
      .collect().map(_.toString).sorted.toSeq
    val streamed = out.map(_.toString).sorted.toSeq
    assert(batch == streamed, "batch face must equal the streamed emission")
  }
}
