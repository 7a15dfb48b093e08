package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C97/C98 — BM25 lexical retrieval and RRF hybrid fusion. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Planted corpus: item 0 has three rare query terms; item 1 is a
    * stopword-only query. Every corpus doc is 6 tokens (avgdl exactly
    * 6.0) and every planted tf is 1, so tfn = 2.2/2.2 = 1.0 exactly and
    * the hand recount is pure idf sums. */
  private lazy val plantedDir: String = {
    val dir = tmpDir("retrieval")
    (Seq(
      (0L, "alpha beta gamma"),
      (1L, "the"),
      (5L, "alpha beta gamma the delta one"),
      (6L, "alpha zeta eta the theta two"),
      (7L, "kappa lambda mu the nu three"),
      (8L, "beta gamma omicron the pi four"),
      (9L, "rho sigma tau the upsilon five"),
      (10L, "phi chi psi the six seven"),
      (11L, "eight nine ten the twelve thirteen"),
      (12L, "fourteen fifteen sixteen the eighteen nineteen")
    )).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("bm25 ranks by matched-term count on the planted corpus and recounts exactly") {
    val got = Retrieval.searchBm25(spark, plantedDir).collect()
    // N = 8 corpus docs; alpha/beta/gamma each df = 2
    val idf = math.log(1.0 + (8L - 2L + 0.5) / (2L + 0.5))
    val expected = Seq(
      (0L, 1, 5L, round4(idf + idf + idf)), // all three query terms
      (0L, 2, 8L, round4(idf + idf)),       // beta + gamma
      (0L, 3, 6L, round4(idf))              // alpha only
    )
    assert(got.map(r => (r.getAs[Long]("item_id"), r.getAs[Int]("rnk"),
      r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq == expected)
  }

  test("junk-grade query terms are pruned: the all-stopword item returns no rows") {
    val got = Retrieval.searchBm25(spark, plantedDir).collect()
    // "the" appears in all 8 corpus docs (df*10 > N*9) — pruned, so item
    // 1 has no scoreable term and doc 7 (which shares ONLY "the" with
    // item 0's universe) never appears anywhere
    assert(!got.exists(_.getAs[Long]("item_id") == 1L))
    assert(!got.exists(_.getAs[Long]("doc_id") == 7L))
  }

  test("bm25 at sf0.001: items covered, ranks bounded, rounded scores non-increasing, deterministic") {
    val a = Retrieval.searchBm25(spark, sfDir).collect()
    assert(a.nonEmpty)
    assert(a.forall(r => r.getAs[Long]("item_id") < 5 && r.getAs[Long]("doc_id") >= 5))
    assert(a.forall(_.getAs[Int]("rnk") <= 10))
    a.groupBy(_.getAs[Long]("item_id")).foreach { case (_, rows) =>
      val byRank = rows.sortBy(r => (r.getAs[Int]("rnk"), r.getAs[Long]("doc_id")))
      val scores = byRank.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y },
        "rounded scores must be non-increasing in rank")
    }
    val b = Retrieval.searchBm25(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("bm25 recounts against a driver-side scorer at sf0.001") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val toks = (t: String) =>
      t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1).toSeq.filter(_.nonEmpty)
    val corpus = docs.filter(_._1 >= 5).map { case (id, t) => id -> toks(t) }.toMap
    val tf = corpus.map { case (id, ts) =>
      id -> ts.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong } }
    val dl = tf.map { case (id, m) => id -> m.values.sum }
    val n = corpus.size.toLong
    val avgdl = dl.values.sum.toDouble / n
    val df = tf.values.flatMap(_.keys).groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val items = docs.filter(_._1 < 5).map { case (id, t) => id -> toks(t).distinct }.toMap
    val got = Retrieval.searchBm25(spark, sfDir).collect()
    // the scoreable terms per item: junk-floored, then the 8 rarest
    val kept: Map[Long, Set[String]] = items.map { case (item, ts) =>
      item -> ts.filter(w => df.contains(w) && df(w) * 10 <= n * 9)
        .sortBy(w => (df(w), w)).take(8).toSet
    }
    assert(got.nonEmpty, "the synthetic corpus must produce BM25 matches")
    got.foreach { r =>
      val (item, doc) = (r.getAs[Long]("item_id"), r.getAs[Long]("doc_id"))
      val exp = kept(item).toSeq
        .filter(w => tf(doc).contains(w))
        .map { w =>
          val idf = math.log(1.0 + (n - df(w) + 0.5) / (df(w) + 0.5))
          val t = tf(doc)(w).toDouble
          idf * ((t * 2.2) / (t + 1.2 * (0.25 + 0.75 * dl(doc) / avgdl)))
        }.sum
      assert(math.abs(r.getAs[Double]("score") - round4(exp)) <= 1.1e-4,
        s"item $item doc $doc: got ${r.getAs[Double]("score")} expected ~${round4(exp)}")
    }
  }

  test("hybrid equals the RRF fusion of its two published top-10 lists at sf0.001") {
    val bm = Retrieval.bm25Ranked(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("item_id"), r.getAs[Long]("doc_id")) -> r.getAs[Int]("rnk")).toMap
    val cs = Retrieval.cosineRanked(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("item_id"), r.getAs[Long]("doc_id")) -> r.getAs[Int]("rnk")).toMap
    val hy = Retrieval.searchHybrid(spark, sfDir).collect()
    assert(hy.nonEmpty)
    hy.foreach { r =>
      val key = (r.getAs[Long]("item_id"), r.getAs[Long]("doc_id"))
      assert(bm.contains(key) || cs.contains(key),
        "every fused doc must come from one of the two lists")
      val exp = round6(
        bm.get(key).map(rk => 1.0 / (60 + rk)).getOrElse(0.0) +
        cs.get(key).map(rk => 1.0 / (60 + rk)).getOrElse(0.0))
      assert(r.getAs[Double]("rrf") == exp, s"rrf recount mismatch at $key")
      // the published per-list ranks ride along (null when absent)
      assert(Option(r.getAs[Any]("bm25_rnk")).map(_.asInstanceOf[Int]) == bm.get(key))
      assert(Option(r.getAs[Any]("cos_rnk")).map(_.asInstanceOf[Int]) == cs.get(key))
    }
    // a doc on BOTH lists outranks any doc on one list with equal-or-worse ranks
    hy.groupBy(_.getAs[Long]("item_id")).foreach { case (_, rows) =>
      val both = rows.filter(r => !r.isNullAt(r.fieldIndex("bm25_rnk")) &&
        !r.isNullAt(r.fieldIndex("cos_rnk")))
      val one = rows.filter(r => r.isNullAt(r.fieldIndex("bm25_rnk")) ||
        r.isNullAt(r.fieldIndex("cos_rnk")))
      for (b <- both; o <- one)
        if (Seq(b.getAs[Int]("bm25_rnk"), b.getAs[Int]("cos_rnk")).max <=
            Seq(Option(o.getAs[Any]("bm25_rnk")), Option(o.getAs[Any]("cos_rnk")))
              .flatten.map(_.asInstanceOf[Int]).min)
          assert(b.getAs[Int]("rnk") <= o.getAs[Int]("rnk"))
    }
  }

  test("retrieval_negatives is the 11–50 band of the same ranking: disjoint from top-10, contiguous") {
    val top = Retrieval.searchBm25(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("item_id"), r.getAs[Long]("doc_id"))).toSet
    val neg = Retrieval.retrievalNegatives(spark, sfDir).collect()
    assert(neg.nonEmpty, "the negative band must be non-empty at sf0.001")
    neg.foreach { r =>
      val rk = r.getAs[Int]("rnk")
      assert(rk >= 11 && rk <= 50)
      assert(!top.contains((r.getAs[Long]("item_id"), r.getAs[Long]("doc_id"))),
        "a negative must never be a presumed positive")
    }
    // per item the band is contiguous from rank 11 (same ranking frame)
    neg.groupBy(_.getAs[Long]("item_id")).foreach { case (item, rows) =>
      val ranks = rows.map(_.getAs[Int]("rnk")).sorted
      assert(ranks.head == 11, s"item $item band must start at 11")
      assert(ranks.zip(ranks.tail).forall { case (a, b) => b == a + 1 },
        s"item $item band must be contiguous (vec_id tiebreak => no gaps)")
    }
  }

  test("hybrid is deterministic and rank-bounded") {
    val a = Retrieval.searchHybrid(spark, sfDir).collect()
    val b = Retrieval.searchHybrid(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.forall(_.getAs[Int]("rnk") <= 10))
  }
}
