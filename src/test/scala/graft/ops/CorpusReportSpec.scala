package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C33 quality_funnel, C34 corpus_stats, C35 text_normalize — the
  * corpus-reporting operators. Each is cross-checked by a driver-side
  * recomputation from the raw documents with the same rules. */
class CorpusReportSpec extends SparkSpec {

  private def docs = graft.sources.Tables(spark, sfDir, "documents")

  test("quality_gopher: every rule discriminates and accounting is exact") {
    val rows = TextQueries.qualityGopher(spark, sfDir).collect()
    assert(rows.length == 20)
    val docs = rows.map(_.getLong(1)).sum
    assert(docs == 500L)
    // per-source: pass counts bounded by docs, all-rules <= each rule
    rows.foreach { r =>
      val (d, cols) = (r.getLong(1), (2 to 6).map(r.getLong))
      assert(cols.forall(c => c >= 0 && c <= d))
      assert(cols.take(4).forall(_ >= cols(4)),
        s"p_all exceeds a single-rule pass count in $r")
    }
    // corpus-wide: each rule must pass some and fail some documents —
    // a rule that never fires (or always fires) is a vacuous gate
    (2 to 5).foreach { i =>
      val passed = rows.map(_.getLong(i)).sum
      assert(passed > 0 && passed < docs, s"rule column $i is vacuous: $passed/$docs")
    }
    // driver-side recount: apply the same rule battery to the raw text
    // with plain Scala string ops and compare the per-source survivors
    val stop = Set("the", "a", "of", "and", "to", "in")
    val recount = docs2.map { d =>
      val norm = d._2.toLowerCase.replaceAll("\\s+", " ").trim
      val w = norm.split(" ")
      val n = w.length.toLong
      val chars = norm.length.toLong
      val u = w.distinct.length.toLong
      val st = w.count(stop.contains).toLong
      val pass = n >= 25 && n <= 100000 &&
        3 * n <= chars - n + 1 && 2 * (chars - n + 1) <= 9 * n &&
        st >= 4 && 20 * u >= 9 * n
      d._1 -> (if (pass) 1L else 0L)
    }.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    rows.foreach { r =>
      assert(recount(r.getString(0)) == r.getLong(6),
        s"p_all recount mismatch for ${r.getString(0)}")
    }
  }

  private def docs2: Seq[(String, String)] =
    docs.select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  test("corpus_divergence: integer bp math matches a driver-side recount") {
    val rows = TextQueries.corpusDivergence(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("top_coverage_bp") <= 10000L)
      // L1 distance over shares is bounded by 2 (20000 bp)
      assert(r.getAs[Long]("divergence_bp") <= 20000L)
    }
    // brute recount with the same tokenization + integer rules
    val texts = docs.select(col("source"), col("text"))
      .as[(String, String)](org.apache.spark.sql.Encoders.product).collect()
    def toks(t: String): Seq[String] =
      t.toLowerCase.replaceAll("\\s+", " ").trim.split(' ').toSeq
    val bySrcTerm = texts.flatMap { case (src, t) => toks(t).map(src -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val srcTotals = bySrcTerm.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val corpus = bySrcTerm.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val ct = corpus.values.sum
    val top = corpus.toSeq.sortBy { case (term, n) => (-n, term) }.take(30)
    val expected = srcTotals.toSeq.sortBy(_._1).map { case (src, st) =>
      val cov = top.map { case (term, _) =>
        bySrcTerm.getOrElse((src, term), 0L) * 10000L / st }.sum
      val div = top.map { case (term, cn) =>
        math.abs(bySrcTerm.getOrElse((src, term), 0L) * 10000L / st -
          cn * 10000L / ct) }.sum
      (src, st, cov, div)
    }
    val got = rows.map(r => (r.getAs[String]("source"), r.getAs[Long]("src_tokens"),
      r.getAs[Long]("top_coverage_bp"), r.getAs[Long]("divergence_bp"))).toSeq
    assert(got == expected)
  }

  test("text_vocab: contiguous ranks, exact running coverage, recounted top terms") {
    val rows = TextQueries.textVocab(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
    // cum column IS the running sum, and coverage never exceeds 10000 bp
    var run = 0L
    rows.foreach { r =>
      run += r.getAs[Long]("share_bp")
      assert(r.getAs[Long]("cum_share_bp") == run)
    }
    assert(run <= 10000L)
    // counts are non-increasing in rank and recount from the raw corpus
    val ns = rows.map(_.getAs[Long]("n"))
    ns.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => }
    val texts = docs.select(col("text")).as[String](
      org.apache.spark.sql.Encoders.STRING).collect()
    val counts = texts.flatMap(
        _.toLowerCase.replaceAll("\\s+", " ").trim.split(' '))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      assert(counts(r.getAs[String]("term")) == r.getAs[Long]("n"))
    }
  }

  test("corpus_lengths: buckets partition each source exactly") {
    val rows = TextQueries.corpusLengths(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    val srcDocs = docs.groupBy(col("source")).count()
      .as[(String, Long)](org.apache.spark.sql.Encoders.product).collect().toMap
    bySrc.foreach { case (src, rs) =>
      assert(rs.map(_.getAs[Long]("docs")).sum == srcDocs(src),
        s"buckets must partition $src")
      // integer shares floor-truncate, so they sum to at most 10000
      val shares = rs.map(_.getAs[Long]("share_bp")).sum
      assert(shares <= 10000L && shares > 9900L)
      rs.foreach { r =>
        assert(r.getAs[Long]("lo_chars") == r.getAs[Long]("bucket") * 100)
      }
    }
  }

  test("quality_funnel: monotone survivors, exact stage accounting, brute recount") {
    val rows = TextQueries.qualityFunnel(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      Seq("0_all", "1_length", "2_quality", "3_diversity", "4_unique"))
    val surv = rows.map(_.getAs[Long]("survivors"))
    assert(surv.head == docs.count())
    surv.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, "funnel survivors must be monotone non-increasing")
    }
    // dropped at each stage is exactly the survivor delta
    rows.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur.getAs[Long]("dropped") ==
        prev.getAs[Long]("survivors") - cur.getAs[Long]("survivors"))
    }
    assert(surv.last > 0, "the full funnel must keep some documents")

    // brute recount of the cumulative rules from raw text
    val raw = docs.select("doc_id", "text", "n_chars").collect().map { r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("text"), r.getAs[Long]("n_chars"))
    }
    val stop = Set("the", "a", "of", "and", "to", "in")
    def toks(t: String): Array[String] =
      t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ")
    def q(t: String): Double = {
      val w = toks(t)
      val nTok = w.length.toDouble
      val stopRatio = w.count(stop) / nTok
      val avgLen = w.map(_.length).sum / nTok
      0.4 * math.min(nTok / 100.0, 1.0) + 0.3 * math.min(stopRatio * 10.0, 1.0) +
        0.3 * (if (avgLen >= 3.0 && avgLen <= 8.0) 1.0 else 0.0)
    }
    val keeper = raw.groupBy { case (_, t, _) => toks(t).mkString(" ") }
      .values.map(_.map(_._1).min).toSet
    val s1 = raw.filter(_._3 >= 100)
    val s2 = s1.filter { case (_, t, _) => q(t) >= 0.5 }
    val s3 = s2.filter { case (_, t, _) =>
      val w = toks(t); w.distinct.length.toDouble / w.length >= 0.5
    }
    val s4 = s3.filter { case (id, _, _) => keeper(id) }
    assert(surv.toSeq == Seq(raw.length.toLong, s1.length.toLong,
      s2.length.toLong, s3.length.toLong, s4.length.toLong))
  }

  test("corpus_stats: rollup levels are consistent and totals match the corpus") {
    val rows = TextQueries.corpusStats(spark, sfDir).collect()
    val grand = rows.filter(r => r.getAs[String]("source") == "ALL")
    assert(grand.length == 1 && grand.head.getAs[String]("lang") == "ALL",
      "exactly one grand-total row; no (ALL, lang) rows in a rollup")
    assert(grand.head.getAs[Long]("docs") == docs.count())

    val cells = rows.filter(r =>
      r.getAs[String]("source") != "ALL" && r.getAs[String]("lang") != "ALL")
    val subtotals = rows.filter(r =>
      r.getAs[String]("source") != "ALL" && r.getAs[String]("lang") == "ALL")
    // every source subtotal equals the sum of its cells, for each measure
    subtotals.foreach { st =>
      val mine = cells.filter(_.getAs[String]("source") == st.getAs[String]("source"))
      assert(mine.nonEmpty)
      for (c <- Seq("docs", "chars", "tokens"))
        assert(mine.map(_.getAs[Long](c)).sum == st.getAs[Long](c),
          s"rollup subtotal mismatch on $c for ${st.getAs[String]("source")}")
    }
    assert(cells.map(_.getAs[Long]("docs")).sum == docs.count())
    // avg is consistent with the sums it summarizes
    cells.foreach { c =>
      assert(math.abs(c.getAs[Double]("avg_tokens") -
        c.getAs[Long]("tokens").toDouble / c.getAs[Long]("docs")) < 5e-5)
    }
  }

  test("text_normalize: non-vacuous audit matches a driver-side normalization byte for byte") {
    val rows = TextQueries.textNormalize(spark, sfDir).collect()
    val raw = docs.select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[String]("text")))
    assert(rows.map(_.getAs[Long]("docs")).sum == raw.length)
    // the planted mess makes the gate non-vacuous: ~2/3 of docs change
    assert(rows.map(_.getAs[Long]("changed")).sum > raw.length / 2)
    def norm(s: String): String = s.toLowerCase.replaceAll("\\s+", " ").trim
    val bySource = raw.groupBy(_._2)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val mine = bySource(src)
      val messy = mine.map { case (id, _, t) =>
        if (id % 3 == 0) "  " + t.toUpperCase
        else if (id % 3 == 1) t.replace(" ", "  ")
        else t
      }
      val norms = messy.map(norm)
      assert(r.getAs[Long]("docs") == mine.length.toLong)
      assert(r.getAs[Long]("changed") ==
        messy.zip(norms).count { case (t, n) => t != n }.toLong)
      assert(r.getAs[Long]("chars_removed") ==
        messy.zip(norms).map { case (t, n) => (t.length - n.length).toLong }.sum)
      // normalization undoes the planted mess: every doc recovers its
      // original canonical form
      assert(r.getAs[Long]("recovered") == mine.length.toLong)
      assert(norms.toSeq == mine.map { case (_, _, t) => norm(t) }.toSeq)
      val md = java.security.MessageDigest.getInstance("MD5")
      val hashes = norms.map(n =>
        md.digest(n.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      assert(r.getAs[String]("sample_hash") == hashes.min)
    }
  }
}
