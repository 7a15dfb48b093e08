package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** D25 — BM25 retrieval triage on the intake feed. */
class StreamingRetrievalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val model = StreamingRetrieval.fit(spark, sfDir)

  private def runStream(rows: Seq[(Long, String, Timestamp)], name: String,
      mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : (Seq[Row], Boolean) = {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = mk(stream.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 3))
        .foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
      val stateless = Option(q.lastProgress)
        .forall(_.stateOperators.isEmpty)
      (spark.table(name).collect().toSeq, stateless)
    } finally q.stop()
  }

  test("streamed scores replay the batch face: every published top-10 pair agrees at 4dp") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").where($"doc_id" >= 5)
      .as[(Long, String)].collect().sortBy(_._1)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = docs.map { case (id, t) => (id, t, new Timestamp(base + id)) }.toSeq
    val (out, stateless) = runStream(rows, "retr_scores",
      df => StreamingRetrieval.scoreStream(df, model))
    assert(stateless, "the scorer must hold no streaming state")
    // streamed per-(doc, item) scores, exploded from the audit array
    val streamed = out.flatMap { r =>
      val doc = r.getAs[Long]("doc_id")
      r.getSeq[Row](r.fieldIndex("scores")).map(s =>
        (doc, s.getAs[Long]("item_id")) -> s.getAs[Double]("score"))
    }.toMap
    // the batch face's published rows (round-4 scores) must all agree
    val published = graft.ops.Retrieval.searchBm25(spark, sfDir).collect()
    assert(published.nonEmpty)
    published.foreach { r =>
      val key = (r.getAs[Long]("doc_id"), r.getAs[Long]("item_id"))
      val got = streamed.getOrElse(key, fail(s"stream missing pair $key"))
      assert(math.abs(got - r.getAs[Double]("score")) <= 1.1e-4,
        s"pair $key: streamed $got vs batch ${r.getAs[Double]("score")}")
    }
    // best_item/best_score are the argmax of the audit array (lowest id ties)
    out.foreach { r =>
      val ss = r.getSeq[Row](r.fieldIndex("scores"))
        .map(s => (s.getAs[Long]("item_id"), s.getAs[Double]("score")))
      val bestScore = ss.map(_._2).max
      val bestItem = ss.filter(_._2 == bestScore).map(_._1).min
      assert(r.getAs[Double]("best_score") == bestScore)
      assert(r.getAs[Long]("best_item") == bestItem)
    }
  }

  test("a verbatim leak of an item flags at the gate; disjoint vocabulary stays silent") {
    val itemText = graft.sources.Tables(spark, sfDir, "documents")
      .where($"doc_id" === model.items.head.itemId)
      .select($"text").as[String].head()
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = Seq(
      (9001L, itemText, new Timestamp(base + 1)),
      (9002L, "zzz qqq xxx completely disjoint vocabulary", new Timestamp(base + 2)))
    val (out, _) = runStream(rows, "retr_gate",
      df => StreamingRetrieval.gateStream(df, model, cut = 1.0))
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(9001L).getAs[Boolean]("retrieval_flagged"),
      s"verbatim item copy must flag (score ${byId(9001L).getAs[Double]("best_score")})")
    assert(!byId(9002L).getAs[Boolean]("retrieval_flagged"),
      "disjoint vocabulary shares no kept term — score must be 0")
    assert(byId(9002L).getAs[Double]("best_score") == 0.0)
  }

  test("the fit is the C97 selection: <= 8 terms per item, idf positive, deterministic") {
    assert(model.items.nonEmpty && model.avgdl > 0)
    model.items.foreach { it =>
      assert(it.terms.nonEmpty && it.terms.size <= 8, s"item ${it.itemId}")
      it.terms.foreach { case (t, idf) => assert(t.nonEmpty && idf > 0) }
    }
    val again = StreamingRetrieval.fit(spark, sfDir)
    assert(again == model, "the frozen model must be rerun-stable")
  }
}
