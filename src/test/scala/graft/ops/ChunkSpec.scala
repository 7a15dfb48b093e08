package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C30/C31 — sliding-window chunking and chunk-level dedup. */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def normToks(text: String): Seq[String] =
    text.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1).toSeq

  test("chunks cover every token at the declared width/stride") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val chunks = TextQueries.textChunk(spark, sfDir)
      .as[(Long, Int, Int, String)].collect()
      .groupBy(_._1)
    docs.foreach { case (id, text) =>
      val toks = normToks(text)
      val n = toks.size
      val cs = chunks(id).sortBy(_._2)
      // one chunk per stride offset that begins inside the doc
      assert(cs.length == (n - 1) / 24 + 1, s"doc $id: ${cs.length} chunks for $n tokens")
      cs.foreach { case (_, idx, ct, hash) =>
        val start = idx * 24
        assert(ct == math.min(32, n - start), s"doc $id chunk $idx token count")
        assert(ct >= 1 && ct <= 32)
        // the hash is md5 of exactly that token window
        val expected = java.security.MessageDigest.getInstance("MD5")
          .digest(toks.slice(start, start + 32).mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(hash == expected, s"doc $id chunk $idx hash")
      }
      // coverage: the last chunk reaches the final token
      val last = cs.last
      assert(last._2 * 24 + last._3 == n, s"doc $id tail uncovered")
    }
  }

  test("chunk frame is a narrow projection — no exchange before the consumer") {
    val plan = TextQueries.chunkFrame(spark, sfDir, 32, 24)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"chunking must not shuffle (pure map + generate):\n$plan")
  }

  test("chunk dedup finds the planted duplicate documents' windows") {
    val got = TextQueries.dedupChunk(spark, sfDir)
      .as[(String, Long, Long, Long)].collect()
    assert(got.map(_._2).sum > 0, "corpus has chunks")
    // the corpus plants exact-dup docs (dedup_exact finds them), and every
    // chunk of a duplicated doc is a duplicated window
    assert(got.map(_._3).sum > 0, "planted dup docs must surface dup chunks")
    // brute-force recomputation of the global first-occurrence rule
    val chunks = TextQueries.chunkFrame(spark, sfDir, 32, 24)
      .select($"source", ($"doc_id" * 1048576L + $"chunk_idx").as("pos"), $"chunk_hash")
      .as[(String, Long, String)].collect()
    val firstByHash = chunks.groupBy(_._3).map { case (h, cs) => h -> cs.map(_._2).min }
    val expDup = chunks.groupBy(_._1).map { case (src, cs) =>
      src -> cs.count(c => firstByHash(c._3) != c._2).toLong
    }
    got.foreach { case (src, n, dup, bp) =>
      assert(dup == expDup(src), s"source $src dup count")
      assert(bp == dup * 10000 / n, s"source $src basis points")
    }
  }
}
