package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Pipeline

class StreamingDocsSpec extends SparkSpec {
  import spark.implicits._

  test("streamed quality gate + hash dedup equals the batch pipeline stages") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))

    val batch = Pipeline.dropExactDups(
        Pipeline.qualityFilter(docs, "text"), "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet

    // replay in id order (first arrival == min id, the keeper the batch
    // face picks), with a synthetic arrival timestamp per document
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
      .map { case (id, text) => (id, text, new Timestamp(base + id * 1000)) }

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingDocs.cleanStream(
        stream.toDF().toDF("doc_id", "text", "ts"), "ts")
      .writeStream.format("memory").queryName("clean_docs")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 4))
        .foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
      val streamed = spark.table("clean_docs")
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == batch,
        s"faces diverge: ${(batch diff streamed).take(5)} missing, " +
          s"${(streamed diff batch).take(5)} extra")
      assert(streamed.size < docs.count(),
        "sanity: the gate+dedup must actually drop documents")
    } finally q.stop()
  }

  test("streamed incremental dedup vs a standing index equals the batch recount") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val standingDocs = docs.where(col("doc_id") % 5 =!= 4)
    val incoming = docs.where(col("doc_id") % 5 === 4)
    val standing = StreamingDocs.standingIndex(standingDocs)

    // batch recount: incoming minus standing-hash, minus standing-fp,
    // minus in-batch same-hash later arrivals (min-id keeper)
    val keyed = incoming.select(col("doc_id"),
      graft.ops.Text.contentHash(col("text")).as("h"),
      graft.ops.Text.fingerprint(col("text")).as("fp"))
    val afterStanding = keyed
      .join(standing.select(col("h")).distinct(), Seq("h"), "left_anti")
      .join(standing.select(col("fp")).distinct(), Seq("fp"), "left_anti")
    val expected = afterStanding
      .withColumn("keeper", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .where(col("doc_id") === col("keeper"))
      .select("doc_id").as[Long].collect().toSet

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = incoming.as[(Long, String)].collect().sortBy(_._1)
      .map { case (id, text) => (id, text, new Timestamp(base + id * 1000)) }
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingDocs.dedupAgainstStream(
        stream.toDF().toDF("doc_id", "text", "ts"), standing, "ts")
      .writeStream.format("memory").queryName("inc_dedup")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 3))
        .foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
      val streamed = spark.table("inc_dedup")
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == expected,
        s"faces diverge: ${(expected diff streamed).take(5)} missing, " +
          s"${(streamed diff expected).take(5)} extra")
      assert(streamed.size < incoming.count(),
        "sanity: the standing index must actually reject documents")
    } finally q.stop()
  }

  test("streamed bloom-gated dedup admits exactly the plain anti-join set") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val standingDocs = docs.where(col("doc_id") % 5 =!= 4)
    val incoming = docs.where(col("doc_id") % 5 === 4)
    val standing = StreamingDocs.standingIndex(standingDocs)

    // the bloom face must admit EXACTLY the bloom-free anti-join set
    val expected = incoming
      .withColumn("fp", graft.ops.Text.fingerprint(col("text")))
      .join(standing.select(col("fp")).distinct(), Seq("fp"), "left_anti")
      .select("doc_id").as[Long].collect().toSet

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = incoming.as[(Long, String)].collect().sortBy(_._1)
      .map { case (id, text) => (id, text, new Timestamp(base + id * 1000)) }
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingDocs.dedupBloomStream(
        stream.toDF().toDF("doc_id", "text", "ts"), standing)
      .writeStream.format("memory").queryName("bloom_admit")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 3))
        .foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
      val streamed = spark.table("bloom_admit")
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == expected,
        s"faces diverge: ${(expected diff streamed).take(5)} missing, " +
          s"${(streamed diff expected).take(5)} extra")
      assert(streamed.size < incoming.count(),
        "sanity: the standing corpus must actually reject duplicates")
    } finally q.stop()
  }

  test("streamed decontamination flags exactly the batch C23 contaminated set") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    // the C23 split: docs < 5 are the benchmark, the rest are the corpus
    val bench = docs.where(col("doc_id") < 5)
      .select(explode(graft.ops.Dedup.shingles(col("text"), 2)).as("ngram"))
      .distinct()
    val batch = graft.ops.TextQueries.textContamination(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = docs.where(col("doc_id") >= 5).as[(Long, String)].collect()
      .sortBy(_._1)
      .map { case (id, text) => (id, text, new Timestamp(base + id * 1000)) }
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingDocs.decontaminateStream(
        stream.toDF().toDF("doc_id", "text", "ts"), bench)
      .writeStream.format("memory").queryName("decontam")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 3))
        .foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
      val out = spark.table("decontam")
      val streamed = out.where(col("contaminated"))
        .select("doc_id", "n_hits").as[(Long, Long)]
        .collect().map { case (id, h) => id -> h }.toMap
      assert(streamed == batch,
        s"faces diverge: ${(batch.keySet diff streamed.keySet).take(5)} missing, " +
          s"${(streamed.keySet diff batch.keySet).take(5)} extra")
      // every arriving document is emitted exactly once, flagged or not
      assert(out.count() == rows.length)
      assert(streamed.nonEmpty && streamed.size < rows.length,
        "sanity: the gate must flag some and pass some documents")
    } finally q.stop()
  }

  test("a duplicate arriving within the watermark window is suppressed") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingDocs.cleanStream(
        stream.toDF().toDF("doc_id", "text", "ts"), "ts")
      .writeStream.format("memory").queryName("dedup_docs")
      .outputMode("append").start()
    // long enough to clear the quality gate's token-count term
    val body = Array.fill(60)("the quick brown fox jumps over the lazy dog")
      .mkString(" ")
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    try {
      stream.addData((1L, body, t(0)))
      q.processAllAvailable()
      stream.addData((2L, body, t(5)), (3L, body + " extra tail", t(6)))
      q.processAllAvailable()
      val got = spark.table("dedup_docs").select("doc_id").as[Long].collect().toSet
      assert(got == Set(1L, 3L),
        s"same-hash doc 2 must drop, distinct doc 3 must pass: $got")
    } finally q.stop()
  }

  test("streamed span-recycle flag equals the exact batch C74 coverage per doc") {
    import graft.ops.ExactSubstr
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val standing = docs.where(col("doc_id") % 5 =!= 4)
    val incoming = docs.where(col("doc_id") % 5 === 4)
    val wins = ExactSubstr.windowHashes(standing, "doc_id", "text", 8)

    // exact batch recount: per-incoming-doc recycled coverage (0 when
    // no span hits)
    val exact = ExactSubstr.incrementalSpans(incoming, wins, "doc_id", "text", 8)
      .groupBy(col("doc_id")).agg(sum(col("span_tokens")).as("cov"))
      .as[(Long, Long)].collect().toMap

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = StreamingDocs.spanRecycleStream(
        stream.toDF().toDF("doc_id", "text"), wins)
      .select("doc_id", "recycled_tokens", "total_tokens", "recycled_bp")
      .writeStream.format("memory").queryName("span_recycle")
      .outputMode("append").start()
    try {
      val rows = incoming.as[(Long, String)].collect().toIndexedSeq
      rows.grouped(math.max(1, rows.length / 3))
        .foreach { c => stream.addData(c); q.processAllAvailable() }
      val streamed = spark.table("span_recycle").collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
      assert(streamed.size == rows.size, "every arriving doc gets a flag row")
      streamed.foreach { case (id, (cov, tot, bp)) =>
        assert(cov.toLong == exact.getOrElse(id, 0L),
          s"doc $id: streamed coverage $cov != exact ${exact.getOrElse(id, 0L)}")
        assert(cov <= tot && bp == cov.toLong * 10000 / math.max(tot, 1),
          s"inconsistent flag row for doc $id: cov=$cov tot=$tot bp=$bp")
      }
      // non-vacuous: the corpus recycles something
      assert(streamed.values.exists(_._1 > 0), "no recycling found — vacuous")
    } finally q.stop()
  }
}
