package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Degenerate-input contract for the text kernels: the synthetic corpus
  * contains no empty/whitespace/null documents, so these behaviors are
  * pinned here — null propagates null everywhere, and an empty document
  * tokenizes to `[""]` (size 1), deliberately matching DuckDB's
  * `string_split('', ' ')` so the oracles agree on degenerate rows. */
class TextEdgeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val edge = Seq(
    (1L, "", "s"), (2L, "   ", "s"), (3L, "x", "s"),
    (4L, "\t\n", "s"), (5L, null.asInstanceOf[String], "s"))
    .toDF("doc_id", "text", "source")

  test("tokens/shingles/hashes: nulls propagate, empties are engine-consistent") {
    val t = edge.select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .as[(Long, Option[Seq[String]])].collect().toMap
    assert(t(5L).isEmpty, "null text must tokenize to null, not crash")
    assert(t(1L).get == Seq("") && t(2L).get == Seq("") && t(4L).get == Seq(""),
      "empty/whitespace docs yield one empty token (the DuckDB string_split contract)")
    assert(t(3L).get == Seq("x"))
    val sh = edge.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("s"))
      .as[(Long, Option[Seq[String]])].collect().toMap
    assert(sh(5L).isEmpty)
    assert(Seq(1L, 2L, 3L, 4L).forall(sh(_).get.isEmpty),
      "sub-n documents shingle to empty, never error")
    val sim = edge.select(col("doc_id"),
        graft.functions.SimHash64(col("text")).as("h"))
      .as[(Long, Option[Long])].collect().toMap
    assert(sim(5L).isEmpty && sim(1L).contains(0L),
      "simhash: null propagates, no-token docs hash to 0")
    val ch = edge.select(col("doc_id"), Text.contentHash(col("text")).as("h"))
      .as[(Long, Option[String])].collect().toMap
    assert(ch(5L).isEmpty)
    assert(ch(1L) == ch(2L) && ch(2L) == ch(4L),
      "all whitespace-only variants share the empty content hash")
  }

  test("cleaning operators survive a degenerate frame without crashing") {
    // quality gate: null/empty docs fail the score comparison (null/low)
    // and drop — a degenerate row must never pass the gate or throw
    val gated = Pipeline.qualityFilter(edge, "text").select("doc_id")
      .as[Long].collect().toSet
    assert(!gated.contains(5L) && !gated.contains(1L),
      "null and empty docs must not clear the quality gate")
    // dedup paths: no shingles -> no pairs -> all docs survive
    assert(Dedup.jaccardPairs(edge, "doc_id", "text").count() == 0)
    assert(Pipeline.dropNearDups(edge, "doc_id", "text").count() == 5)
    // exact dedup: the three whitespace-variants share a hash; one keeper
    // survives; the null doc's hash is null (its own group, kept)
    val exact = Pipeline.dropExactDups(edge, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(exact == Set(1L, 3L, 5L),
      s"whitespace variants collapse to min-id 1; got $exact")
  }
}
