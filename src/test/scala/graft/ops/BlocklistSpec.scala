package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C101 — explicit-wordlist gate. */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  test("card recounts driver-side at sf0.001 and is non-vacuous both ways") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text", $"source").as[(Long, String, String)].collect()
    val toks = (t: String) =>
      t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1).toSeq.filter(_.nonEmpty)
    val block = TextQueries.DefaultBlocklist.toSet
    val got = TextQueries.textBlocklist(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    var flaggedTotal = 0L
    docs.groupBy(_._3).foreach { case (src, ds) =>
      val perDoc = ds.map { case (_, t, _) =>
        val ts = toks(t); (ts.size.toLong, ts.count(block).toLong) }
      val flagged = perDoc.count { case (total, hits) => hits * 10000 >= total * 600 }
      val r = got(src)
      assert(r.getAs[Long]("docs") == ds.length.toLong)
      assert(r.getAs[Long]("block_tokens") == perDoc.map(_._2).sum)
      assert(r.getAs[Long]("total_tokens") == perDoc.map(_._1).sum)
      assert(r.getAs[Long]("flagged_docs") == flagged.toLong, s"source $src")
      assert(r.getAs[Long]("flagged_bp") == flagged.toLong * 10000 / ds.length)
      flaggedTotal += flagged
    }
    val docsTotal = docs.length.toLong
    assert(flaggedTotal > 0, "the gate must flag something at sf0.001")
    assert(flaggedTotal < docsTotal, "the gate must not flag everything")
  }

  test("absent blocklist entries cost nothing; an empty-share corpus flags nothing") {
    val dir = tmpDir("blocklist")
    Seq(
      (1L, "alpha beta gamma delta", "clean"),
      (2L, "slow slow slow slow alpha", "dirty"), // 80% share
      (3L, "slow alpha beta gamma delta epsilon zeta eta theta iota", "mild") // 10% < cut? 1000bp >= 600 -> flagged
    ).toDF("doc_id", "text", "source").write.parquet(s"$dir/documents.parquet")
    val got = TextQueries.textBlocklist(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(got("clean").getAs[Long]("flagged_docs") == 0L)
    assert(got("clean").getAs[Long]("block_tokens") == 0L)
    assert(got("dirty").getAs[Long]("flagged_docs") == 1L)
    assert(got("dirty").getAs[Long]("flagged_bp") == 10000L)
    // 1 hit of 10 tokens = 1000 bp >= the 600 bp cut
    assert(got("mild").getAs[Long]("flagged_docs") == 1L)
    // a custom list with only absent terms flags nothing anywhere
    val none = TextQueries.textBlocklist(spark, dir,
      blocklist = Seq("zzz", "qqq")).collect()
    assert(none.forall(_.getAs[Long]("flagged_docs") == 0L))
    assert(none.forall(_.getAs[Long]("block_tokens") == 0L))
  }
}
