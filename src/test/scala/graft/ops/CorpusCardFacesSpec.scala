package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C92 mixture_temperature, C93 corpus_zipf, C94 token_fertility,
  * C95 dedup_prefix — the round-10 corpus-card wave. Each face is
  * driver-recounted from the raw documents with plain Scala string ops,
  * and the structural theorems each card trades on (temperature
  * flattening, Zipf monotonicity, prefix-superset) are pinned. */
class CorpusCardFacesSpec extends SparkSpec {

  private def rawDocs: Seq[(Long, String, String, String)] =
    graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSeq

  private def norm(t: String): String =
    t.toLowerCase.replaceAll("\\s+", " ").trim

  // ---------------------------------------------------------------- C92

  test("mixture_temperature: integer-sqrt weights recount and shares close") {
    val rows = Sample.mixtureTemperature(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // driver recount of the per-source token budget and sqrt chain
    val toks = rawDocs.groupBy(_._4).map { case (src, ds) =>
      src -> ds.map(d => norm(d._2).split(" ", -1).length.toLong).sum
    }
    val s = rows.length
    rows.foreach { r =>
      val (src, tokens, wh, wq) =
        (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(tokens == toks(src), s"token recount mismatch for $src")
      assert(wh == math.sqrt(tokens.toDouble).toLong, s"w_half for $src")
      assert(wh * wh <= tokens && (wh + 1) * (wh + 1) > tokens)
      assert(wq == math.sqrt(wh.toDouble).toLong, s"w_quarter for $src")
    }
    // floor-division shares: each α column sums into (10000-S, 10000]
    Seq(5, 6, 7).foreach { i =>
      val tot = rows.map(_.getLong(i)).sum
      assert(tot > 10000 - s && tot <= 10000, s"share col $i sums to $tot")
    }
    // exact integer share recount (same floor-div the face performs)
    val whs = rows.map(_.getLong(3)).sum
    val wqs = rows.map(_.getLong(4)).sum
    val t1 = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      assert(r.getLong(5) == r.getLong(2) * 10000 / t1)
      assert(r.getLong(6) == r.getLong(3) * 10000 / whs)
      assert(r.getLong(7) == r.getLong(4) * 10000 / wqs)
    }
    // temperature FLATTENS: the head source loses share as α drops, and
    // the bp spread of the mix narrows down the ladder (floor(√·) on
    // near-equal sources adds ±bp noise, hence the small slack — the
    // real-valued theorem is strict)
    val hi = rows.maxBy(_.getLong(5))
    assert(hi.getLong(6) <= hi.getLong(5) + 1 && hi.getLong(7) <= hi.getLong(6) + 4,
      "head source must flatten down the α ladder")
    def spread(i: Int) = rows.map(_.getLong(i)).max - rows.map(_.getLong(i)).min
    assert(spread(6) <= spread(5) + 4 && spread(7) <= spread(5) + 4,
      s"α ladder must narrow the share spread: ${spread(5)}/${spread(6)}/${spread(7)}")
    // boost factor consistency: factor = t_bp * 10000 div natural_bp
    rows.foreach { r =>
      assert(r.getLong(8) == r.getLong(6) * 10000 / math.max(r.getLong(5), 1))
      assert(r.getLong(9) == r.getLong(7) * 10000 / math.max(r.getLong(5), 1))
    }
  }

  // ---------------------------------------------------------------- C96

  test("mixture_apply: full integer composition recounts; achieved lands on target") {
    val rows = Sample.mixtureApply(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // driver recount: plan arithmetic, coin, copies, achieved rollup
    val toks = rawDocs.map(d => (d._1, d._4, norm(d._2).split(" ", -1).length.toLong))
    val bySrc = toks.groupBy(_._2)
    val d1 = toks.length.toLong
    val t1 = toks.map(_._3).sum
    val planned = bySrc.map { case (src, ds) =>
      val docs = ds.length.toLong
      val tokens = ds.map(_._3).sum
      val target = docs * 10000 / d1
      val factor = target * 10000 / math.max(tokens * 10000 / t1, 1L)
      src -> (docs, tokens, target, factor)
    }
    def coin(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"mixapply|$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(3).map(b => f"$b%02x").mkString, 16)
    }
    val achieved = toks.map { case (id, src, tok) =>
      val f = planned(src)._4
      val copies = f / 10000 + (if (coin(id) < (f % 10000) * 16777216 / 10000) 1L else 0L)
      (src, copies, copies * tok)
    }.groupBy(_._1).map { case (s, xs) => s -> (xs.map(_._2).sum, xs.map(_._3).sum) }
    val at = achieved.values.map(_._2).sum
    rows.foreach { r =>
      val src = r.getString(0)
      val (docs, tokens, target, factor) = planned(src)
      assert((r.getLong(1), r.getLong(2), r.getLong(7), r.getLong(3)) ==
        ((docs, tokens, target, factor)), s"plan recount for $src")
      assert((r.getLong(4), r.getLong(5)) == achieved(src), s"achieved recount for $src")
      assert(r.getLong(6) == achieved(src)._2 * 10000 / at)
      assert(r.getLong(8) == r.getLong(6) - r.getLong(7))
      // the composition theorem: achieved token share ≈ the equal-per-doc
      // target (weight × tokens ∝ doc share); slack = fractional-coin
      // sampling noise at 25 docs/source plus bp floors
      assert(math.abs(r.getLong(8)) <= 300, s"err_bp too large for $src: $r")
    }
    val plan = Sample.mixtureApply(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      "the S-row factor frame must broadcast back onto the scan")
  }

  // ---------------------------------------------------------------- C93

  test("corpus_zipf: rank-doubling ratios recount against the raw histogram") {
    val rows = TextQueries.corpusZipf(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    val hist = rawDocs.flatMap(d => norm(d._2).split(" ", -1))
      .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
    val ranked = hist.toSeq.sortBy { case (t, n) => (-n, t) }
    rows.foreach { r =>
      val (rank, term, n, n2r, ratio) = (r.getInt(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(Set(1, 2, 4, 8, 16, 32).contains(rank))
      assert(ranked(rank - 1) == ((term, n)), s"rank $rank recount")
      assert(ranked(2 * rank - 1)._2 == n2r, s"rank ${2 * rank} count")
      assert(ratio == n * 10000 / n2r)
      // frequencies are non-increasing in rank, so every ratio ≥ 1×
      assert(ratio >= 10000, s"ratio at rank $rank below 1x: $ratio")
    }
    // ranks are distinct and ascending in the output
    val rs = rows.map(_.getInt(0)).toSeq
    assert(rs == rs.sorted && rs.distinct == rs)
  }

  test("corpus_zipf: no cartesian product; one histogram aggregation") {
    val plan = TextQueries.corpusZipf(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "zipf join must be equi-join")
  }

  // ---------------------------------------------------------------- C94

  test("token_fertility: per-language economics recount exactly") {
    val rows = TextQueries.tokenFertility(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val re = "[a-z0-9]+|[^a-z0-9 ]".r
    val by = rawDocs.groupBy(_._3)
    rows.foreach { r =>
      val (lang, docsN, words, reToks, chars) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      val ds = by(lang)
      assert(docsN == ds.length.toLong)
      assert(words == ds.map(d => norm(d._2).split(" ", -1).length.toLong).sum)
      assert(reToks == ds.map(d => re.findAllIn(norm(d._2)).length.toLong).sum)
      assert(chars == ds.map(_._2.length.toLong).sum)
      assert(r.getLong(5) == reToks * 10000 / math.max(words, 1))
      assert(r.getLong(6) == chars * 100 / math.max(reToks, 1))
    }
    // same piece counter as the C10 card: the two faces cannot diverge
    val c10 = TextQueries.textTokens(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    rows.foreach(r => assert(c10(r.getString(0)) == r.getLong(3),
      s"re_tokens diverges from text_tokens for ${r.getString(0)}"))
  }

  // ---------------------------------------------------------------- C95

  test("dedup_prefix: superset theorem and exact recount on a hand corpus") {
    import spark.implicits._
    val dir = tmpDir("prefixdedup")
    val pad = ("x " * 200).trim // shared 256-char prefix, then divergence
    Seq(
      (1L, s"$pad alpha ending one", "en", "web", 1L),
      (2L, s"$pad alpha ending one", "en", "web", 1L),  // exact dup of 1
      (3L, s"$pad totally different tail", "en", "web", 1L), // prefix-only dup
      (4L, "short unique doc", "en", "books", 1L),
      (5L, "another short unique doc", "en", "books", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextQueries.dedupPrefix(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // web: docs 1,2,3 share the 256-char prefix (one group), only 1↔2
    // are exact dups → prefix_dups=2 (docs 2,3), exact_dups=1 (doc 2)
    assert(rows("web") == ((3L, 1L, 2L, 1L, 3333L)), s"web card: ${rows("web")}")
    assert(rows("books") == ((2L, 2L, 0L, 0L, 0L)), s"books card: ${rows("books")}")
  }

  test("dedup_prefix: prefix pass catches >= the exact pass on the real corpus") {
    val rows = TextQueries.dedupPrefix(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= r.getLong(4),
        s"prefix_dups < exact_dups for ${r.getString(0)}")
      assert(r.getLong(2) <= r.getLong(1), "groups cannot exceed docs")
      assert(r.getLong(5) == (r.getLong(3) - r.getLong(4)) * 10000 /
        math.max(r.getLong(1), 1))
    }
    val plan = TextQueries.dedupPrefix(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
