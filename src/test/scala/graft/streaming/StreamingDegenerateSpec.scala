package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-12 degenerate-input sweep for the streaming intake library —
  * the batch-face sweep (DegenerateExportSweepSpec) found 12 real
  * crashes; these are the streaming counterparts a brand-new or
  * misbehaving deployment hits on day one:
  *
  *  - an EMPTY standing index (the first intake ever) must admit
  *    every arrival — in particular the bloom pre-filter's
  *    `bloom_filter_agg` over zero rows yields a NULL bloom, and a
  *    bare `might_contain(NULL, x)` is NULL, which both filter
  *    branches would silently drop: the whole intake lost, no error;
  *  - NULL-text arrivals must flow through every gate as defined
  *    rows, never kill the query or vanish.
  */
class StreamingDegenerateSpec extends SparkSpec {
  import spark.implicits._

  private val emptyStanding =
    Seq.empty[(String, Long)].toDF("h", "fp")

  test("dedupBloomStream: an EMPTY standing index admits every arrival (null-bloom guard)") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val got = StreamingDocs.dedupBloomStream(docs, emptyStanding)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L),
      s"an empty index must admit the WHOLE intake, got $got")
  }

  test("dedupBloomStream: empty standing index admits a real micro-batched stream") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = StreamingDocs.dedupBloomStream(
        stream.toDF().toDF("doc_id", "text"), emptyStanding)
      .writeStream.format("memory").queryName("deg_bloom")
      .outputMode("append").start()
    try {
      stream.addData(Seq((10L, "one two three"), (11L, "four five six")))
      q.processAllAvailable()
      stream.addData(Seq((12L, "seven eight nine")))
      q.processAllAvailable()
      val got = spark.table("deg_bloom").select("doc_id").as[Long].collect().toSet
      assert(got == Set(10L, 11L, 12L), s"stream lost rows: $got")
    } finally q.stop()
  }

  test("dedupAgainstStream: empty standing index + null-text arrivals, nothing lost but null-dups collapse") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingDocs.dedupAgainstStream(
        stream.toDF().toDF("doc_id", "text", "ts"),
        emptyStanding.withColumnRenamed("fp", "fp"), "ts")
      .writeStream.format("memory").queryName("deg_exact")
      .outputMode("append").start()
    try {
      val t = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      stream.addData(Seq(
        (1L, "healthy document text", t),
        (2L, null.asInstanceOf[String], t),      // failed extraction
        (3L, "another healthy document", t)))
      q.processAllAvailable()
      val got = spark.table("deg_exact").select("doc_id").as[Long].collect().toSet
      // null text hashes to null; the anti-joins pass it through (null
      // never equals an index key) and the in-horizon dedup keeps the
      // FIRST null arrival — contentless docs collapse like exact dups
      assert(Set(1L, 3L).subsetOf(got) && got.contains(2L),
        s"healthy + first-null arrivals must all admit: $got")
    } finally q.stop()
  }

  test("decontaminateStream: an EMPTY benchmark and null-text docs give defined flags") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val noBench = Seq.empty[String].toDF("ngram")
    val got = StreamingDocs.decontaminateStream(docs, noBench).collect()
    assert(got.length == 2, "every arrival keeps its row")
    got.foreach { r =>
      assert(!r.getAs[Boolean]("contaminated") || r.isNullAt(r.fieldIndex("contaminated")),
        s"nothing can be contaminated by an empty benchmark: $r")
    }
  }
}
