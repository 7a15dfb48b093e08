package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.QualityModel

/** D15 — the learned quality gate streamed. Replay proof: stream
  * scores equal the batch face's per document, the admit gate passes
  * exactly the batch keep set, and the query is stateless. */
class StreamingQualitySpec extends SparkSpec {
  import spark.implicits._

  test("null and empty arrivals score as junk instead of killing the query") {
    // HashingTF's UDF NPEs on a null token array — before the featurize
    // coalesce guard, ONE null document crashed the whole intake stream
    val model = QualityModel.fitGate(spark, sfDir)
    val edge = Seq((9001L, null.asInstanceOf[String]), (9002L, ""),
      (9003L, "the cluster sorts and shuffles all of the data in a batch"))
      .toDF("doc_id", "text")
    val scored = StreamingQuality.scoreStream(edge, model)
      .select(col("doc_id"), col("q_score")).as[(Long, Double)].collect().toMap
    assert(scored.keySet == Set(9001L, 9002L, 9003L), "no row may be lost or crash")
    assert(scored(9001L) < 0.5 && scored(9002L) < 0.5,
      s"contentless docs must score below the gate: $scored")
    assert(StreamingQuality.gateStream(edge, model)
      .select("doc_id").as[Long].collect().toSet == Set(9003L))
  }

  test("streamed scoring equals the batch face and keeps no state") {
    val model = QualityModel.fitGate(spark, sfDir)
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))

    val batch = StreamingQuality.scoreStream(docs, model)
      .select(col("doc_id"), col("q_score")).as[(Long, Double)]
      .collect().toMap

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = StreamingQuality.scoreStream(
        stream.toDF().toDF("doc_id", "text"), model)
      .writeStream.format("memory").queryName("scored_docs")
      .outputMode("append").start()
    try {
      val rows = docs.as[(Long, String)].collect().sortBy(_._1)
      rows.grouped(math.max(1, rows.length / 3))
        .foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
      val streamed = spark.table("scored_docs")
        .select(col("doc_id"), col("q_score")).as[(Long, Double)]
        .collect().toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (id, sc) =>
        assert(math.abs(sc - batch(id)) < 1e-12, s"doc $id: $sc vs ${batch(id)}")
      }
      // stateless: scoring is a narrow projection — no state operators
      val st = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
      assert(st.isEmpty, s"expected stateless query, got ${st.mkString(",")}")
    } finally q.stop()
  }

  test("the admit gate passes exactly the batch keep set") {
    val model = QualityModel.fitGate(spark, sfDir)
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    // corrupt the odd half so the gate has something real to drop
    val feed = docs.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, col("text"))
        .otherwise(upper(regexp_replace(col("text"), "\\s+", ""))).as("text"))
    val keep = StreamingQuality.gateStream(feed, model)
      .select("doc_id").as[Long].collect().toSet

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = StreamingQuality.gateStream(
        stream.toDF().toDF("doc_id", "text"), model)
      .writeStream.format("memory").queryName("gated_docs")
      .outputMode("append").start()
    try {
      val rows = feed.as[(Long, String)].collect().sortBy(_._1)
      rows.grouped(math.max(1, rows.length / 3))
        .foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
      val streamed = spark.table("gated_docs").select("doc_id").as[Long].collect().toSet
      assert(streamed == keep,
        s"${(keep diff streamed).take(5)} missing, ${(streamed diff keep).take(5)} extra")
      assert(keep.nonEmpty && keep.size < rows.length,
        "sanity: the gate admits some and drops some")
    } finally q.stop()
  }
}
