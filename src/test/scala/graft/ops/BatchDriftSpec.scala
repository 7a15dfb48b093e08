package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C84 — intake-batch text drift vs the standing corpus. */
class BatchDriftSpec extends SparkSpec {
  import spark.implicits._

  test("card equals a driver-side recomputation at sf0.001") {
    val rows = graft.sources.Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text", $"source", $"n_chars")
      .as[(Long, String, String, Long)].collect()
    val toks = (t: String) =>
      t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1).toSeq
    val got = TextQueries.corpusBatchDrift(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    rows.groupBy(_._3).foreach { case (src, ds) =>
      val (batch, standing) = ds.partition(_._1 % 5 == 4)
      val r = got(src)
      assert(r.getAs[Long]("standing_docs") == standing.length.toLong)
      assert(r.getAs[Long]("batch_docs") == batch.length.toLong)
      val bTerms = batch.flatMap(d => toks(d._2)).toSet
      val sTerms = standing.flatMap(d => toks(d._2)).toSet
      assert(r.getAs[Long]("batch_terms") == bTerms.size.toLong)
      val novel = (bTerms diff sTerms).size.toLong
      assert(r.getAs[Long]("novel_terms") == novel)
      if (bTerms.isEmpty)
        assert(r.isNullAt(r.fieldIndex("novel_bp")),
          "a source with no batch docs has no novelty share, not a fake 0")
      else
        assert(r.getAs[Long]("novel_bp") == novel * 10000 / bTerms.size)
      val meanLen = (xs: Seq[Long]) =>
        BigDecimal(xs.map(_.toDouble).sum / xs.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (standing.nonEmpty)
        assert(r.getAs[Double]("len_standing") == meanLen(standing.map(_._4)))
      if (batch.nonEmpty)
        assert(r.getAs[Double]("len_batch") == meanLen(batch.map(_._4)))
    }
  }

  test("a drifting feed is caught: new source reads maximally novel, truncated feed shows the gap") {
    val dir = tmpDir("batchdrift")
    val longText = Seq.fill(40)("the quick brown fox jumps of and to in").mkString(" ")
    (
      // src_ok: standing docs 0-3, batch doc 4 — same distribution
      (0L to 4L).map(i => (i, longText, "en", "src_ok", longText.length.toLong)) ++
      // src_trunc: healthy standing, batch doc suddenly tiny
      (10L to 13L).map(i => (i, longText, "en", "src_trunc", longText.length.toLong)) :+
      ((14L, "tiny", "en", "src_trunc", 4L)) :+
      // src_new: exists ONLY in the batch — no standing history
      ((24L, "completely fresh vocabulary here", "en", "src_new", 32L))
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val got = TextQueries.corpusBatchDrift(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap

    val ok = got("src_ok")
    assert(ok.getAs[Double]("q_drift") == 0.0, s"steady feed must read zero drift: $ok")
    assert(ok.getAs[Long]("novel_bp") == 0L)

    val tr = got("src_trunc")
    assert(tr.getAs[Double]("q_drift") < -0.1,
      s"the truncated batch must show a material quality gap: $tr")
    assert(tr.getAs[Double]("len_batch") < tr.getAs[Double]("len_standing"))

    val nw = got("src_new")
    assert(nw.getAs[Long]("standing_docs") == 0L)
    assert(nw.isNullAt(nw.fieldIndex("q_standing")),
      "a brand-new source has no standing mean, not a fake zero")
    assert(nw.getAs[Long]("novel_bp") == 10000L,
      s"a source with no history is maximally novel: $nw")
  }
}
