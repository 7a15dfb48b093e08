package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Sample

/** D16 — DSIR importance scoring streamed. Replay proof: stream
  * log-weights equal the batch face's per document, the admit gate
  * passes exactly the batch keep set, the query is stateless, and
  * novel vocabulary takes the smoothing default, not zero. */
class StreamingDsirSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.sources.Tables(spark, sfDir, "documents")

  test("streamed scoring equals the batch per-doc log-weights and keeps no state") {
    val m = StreamingDsir.fit(docs, col("lang") === "en")
    val batch = Sample.dsirScores(docs, col("lang") === "en", Sample.DsirBuckets)
      .select(col("doc_id"), col("logw")).as[(Long, Double)].collect().toMap

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = StreamingDsir.scoreStream(
        stream.toDF().toDF("doc_id", "text"), m)
      .writeStream.format("memory").queryName("dsir_scored")
      .outputMode("append").start()
    try {
      val rows = docs.select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().sortBy(_._1)
      rows.grouped(math.max(1, rows.length / 3))
        .foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
      val streamed = spark.table("dsir_scored")
        .select(col("doc_id"), col("logw")).as[(Long, Double)].collect().toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (id, w) =>
        // same doubles, different summation order (per-row array fold vs
        // the batch bucket-group aggregate)
        assert(math.abs(w - batch(id)) < 1e-9, s"doc $id: $w vs ${batch(id)}")
      }
      val st = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
      assert(st.isEmpty, s"expected stateless query, got ${st.mkString(",")}")
    } finally q.stop()
  }

  test("the admit gate passes exactly the batch keep set at the median cut") {
    val m = StreamingDsir.fit(docs, col("lang") === "en")
    val scores = StreamingDsir.scoreStream(
        docs.select(col("doc_id"), col("text")), m)
      .select(col("doc_id"), col("logw")).as[(Long, Double)].collect()
    val cut = scores.map(_._2).sorted.apply(scores.length / 2)
    val keep = scores.collect { case (id, w) if w >= cut => id }.toSet
    assert(keep.nonEmpty && keep.size < scores.length, "cut must split the corpus")

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = StreamingDsir.gateStream(
        stream.toDF().toDF("doc_id", "text"), m, cut)
      .writeStream.format("memory").queryName("dsir_gated")
      .outputMode("append").start()
    try {
      stream.addData(docs.select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().toIndexedSeq)
      q.processAllAvailable()
      val admitted = spark.table("dsir_gated").select("doc_id").as[Long].collect().toSet
      assert(admitted == keep, "stream gate must admit exactly the batch keep set")
    } finally q.stop()
  }

  test("novel vocabulary takes the smoothing default, not zero") {
    val m = StreamingDsir.fit(docs, col("lang") === "en")
    // grams built from UUID-ish junk can still collide into fitted
    // buckets (B=1024), so assert against the per-gram floor instead of
    // an exact value: every gram contributes at least min(fitted lr,
    // default), and a 3-token doc has 5 grams
    val junk = Seq((1L, "qqxjzv wvvqpk zzkkww")).toDF("doc_id", "text")
    val w = StreamingDsir.scoreStream(junk, m).select("logw").as[Double].head()
    val floor = math.min(m.ratios.values.min, m.default)
    val ceil = math.max(m.ratios.values.max, m.default)
    assert(w >= 5 * floor - 1e-9 && w <= 5 * ceil + 1e-9)
    assert(m.default != 0.0, "smoothing default must not be zero")
  }
}
