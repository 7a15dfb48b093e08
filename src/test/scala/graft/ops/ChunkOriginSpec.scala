package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C82 — chunk-granularity origin attribution. */
class ChunkOriginSpec extends SparkSpec {
  import spark.implicits._

  test("card equals a driver-side recomputation of the origin rule") {
    val chunks = TextQueries.chunkFrame(spark, sfDir, 32, 24)
      .select($"source", ($"doc_id" * 1048576L + $"chunk_idx").as("pos"),
        $"chunk_tokens", $"chunk_hash")
      .as[(String, Long, Int, String)].collect()
    val byHash = chunks.groupBy(_._4).filter(_._2.length > 1)
    val expected = byHash.toSeq.flatMap { case (_, occ) =>
      val sorted = occ.sortBy(_._2)
      val from = sorted.head._1
      sorted.tail.map(o => ((from, o._1), (o._4, o._3.toLong)))
    }.groupBy(_._1).map { case ((from, to), rows) =>
      (from, to) -> ((rows.map(_._2._1).distinct.size.toLong,
        rows.size.toLong, rows.map(_._2._2).sum))
    }
    val got = TextQueries.chunkOriginCard(spark, sfDir)
      .as[(String, String, Long, Long, Long)].collect()
    assert(got.nonEmpty, "the planted dup docs must produce adopted chunks")
    assert(got.length == expected.size)
    got.foreach { case (from, to, contents, chunks2, toks) =>
      val (ec, en, et) = expected((from, to))
      assert(contents == ec, s"($from->$to) n_contents")
      assert(chunks2 == en, s"($from->$to) adopted_chunks")
      assert(toks == et, s"($from->$to) adopted_tokens")
    }
  }

  test("mass conservation: adopted chunks across the card = C31's dropped chunks") {
    val adopted = TextQueries.chunkOriginCard(spark, sfDir)
      .agg(sum($"adopted_chunks")).as[Long].collect()(0)
    val dropped = TextQueries.dedupChunk(spark, sfDir)
      .agg(sum($"dup_chunks")).as[Long].collect()(0)
    assert(adopted == dropped,
      "every window the C31 keeper rule drops is attributed exactly once")
  }

  test("degenerate corpus: empty/whitespace docs fall into one [''] content group, defined rows") {
    val dir = tmpDir("chunkorigin")
    Seq(
      (1L, "", "en", "a", 0L),
      (2L, "   ", "en", "b", 3L),
      (3L, "solo tokens that appear nowhere else at all", "en", "c", 43L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextQueries.chunkOriginCard(spark, dir)
      .as[(String, String, Long, Long, Long)].collect()
    // docs 1 and 2 both tokenize to [""] (the documented convention), so
    // source b adopts one 1-token chunk from origin a; source c is unique
    assert(got.toSeq == Seq(("a", "b", 1L, 1L, 1L)))
  }
}
