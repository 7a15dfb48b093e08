package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C42 text_perplexity — unigram cross-entropy scoring. Rows-only
  * CORRECTNESS entry; this spec is its oracle: a full driver-side
  * recount of the LM and every document's score (tolerances cover
  * summation-order float drift only). */
class PerplexitySpec extends SparkSpec {
  import spark.implicits._

  test("per-source xent distribution matches a driver-side recount") {
    val rep = TextQueries.textPerplexity(spark, sfDir).collect()
    assert(rep.nonEmpty)
    val texts = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    def toks(t: String): Seq[String] =
      t.toLowerCase.replaceAll("\\s+", " ").trim.split(' ').toSeq
    val lm = texts.flatMap(t => toks(t._3)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val total = lm.values.sum.toDouble
    val perDoc = texts.map { case (_, src, t) =>
      val tf = toks(t).groupBy(identity).view.mapValues(_.size).toMap
      val n = tf.values.sum
      val h = -tf.map { case (term, f) => f * math.log(lm(term) / total) }.sum / n
      (src, h)
    }
    val expected = perDoc.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rep.foreach { r =>
      val hs = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("docs") == hs.size.toLong)
      assert(math.abs(r.getAs[Double]("avg_xent") - hs.sum / hs.size) <= 2e-4)
      assert(math.abs(r.getAs[Double]("min_xent") - hs.min) <= 2e-4)
      assert(math.abs(r.getAs[Double]("max_xent") - hs.max) <= 2e-4)
    }
    // non-vacuous: the corpus scores are not all identical
    assert(rep.exists(r => r.getAs[Double]("max_xent") > r.getAs[Double]("min_xent")))
    // Determinism run-over-run: exact on non-float columns, tolerance on
    // doubles (partial-agg merge order may flip the rounded 4th decimal).
    val again = TextQueries.textPerplexity(spark, sfDir).collect()
    assert(rep.length == again.length)
    rep.zip(again).foreach { case (a, b) =>
      (0 until a.length).foreach { i =>
        (a.get(i), b.get(i)) match {
          case (x: Double, y: Double) => assert(math.abs(x - y) <= 2e-4, s"col $i")
          case (x, y) => assert(x == y, s"col $i")
        }
      }
    }
  }

  test("ccnet buckets: terciles partition each source with monotone xent bands") {
    val rows = TextQueries.qualityCcnet(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    val srcDocs = graft.sources.Tables(spark, sfDir, "documents")
      .groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (src, bs) =>
      val byBucket = bs.map(b => b._2 -> b._3).toMap
      // the buckets partition the source (every doc in exactly one)
      assert(bs.map(_._3).sum == srcDocs(src), s"$src: buckets must partition")
      assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")))
      // rank-based tercile cuts: each bucket holds about a third
      val n = srcDocs(src)
      byBucket.values.foreach(c =>
        assert(math.abs(c - n / 3.0) <= math.max(2, n / 10.0), s"$src sizes $byBucket"))
      // shares sum to ~10000 bp (integer-division remainders only)
      assert(math.abs(bs.map(_._4).sum - 10000L) <= bs.length)
      // fluency is monotone across the ladder
      if (Set("head", "middle", "tail").subsetOf(byBucket.keySet)) {
        val avg = bs.map(x => x._2 -> x._5).toMap
        assert(avg("head") <= avg("middle") && avg("middle") <= avg("tail"),
          s"$src avg xent not monotone: $avg")
      }
    }
  }

  test("bigram LM with stupid backoff matches a driver-side recount") {
    val rep = TextQueries.textPerplexityBigram(spark, sfDir).collect()
    assert(rep.nonEmpty)
    val texts = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    def toks(t: String): Seq[String] =
      t.toLowerCase.replaceAll("\\s+", " ").trim.split(' ').toSeq
    def bigrams(t: String): Seq[(String, String)] = {
      val ts = toks(t); ts.zip(ts.drop(1))
    }
    // LM counts from the even-doc training slice, all derived from the
    // ONE bigram count table — exactly the query's accounting.
    val c12 = texts.filter(_._1 % 2 == 0).flatMap(t => bigrams(t._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = c12.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val c2 = c12.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = c12.values.sum.toDouble
    val alpha = 0.4
    val perDoc = texts.flatMap { case (id, src, t) =>
      val bg = bigrams(t)
      if (bg.isEmpty) None
      else {
        val h = -bg.map { b =>
          math.log(
            if (c12.contains(b)) c12(b).toDouble / c1(b._1)
            else if (c2.contains(b._2)) alpha * c2(b._2) / n
            else alpha * alpha / n)
        }.sum / bg.size
        val backed = bg.count(b => !c12.contains(b)).toLong
        Some((src, h, backed, bg.size.toLong))
      }
    }
    val bySrc = perDoc.groupBy(_._1)
    rep.foreach { r =>
      val g = bySrc(r.getAs[String]("source"))
      assert(r.getAs[Long]("docs") == g.size.toLong)
      val hs = g.map(_._2)
      assert(math.abs(r.getAs[Double]("avg_xent") - hs.sum / hs.size) <= 2e-4)
      assert(math.abs(r.getAs[Double]("min_xent") - hs.min) <= 2e-4)
      assert(math.abs(r.getAs[Double]("max_xent") - hs.max) <= 2e-4)
      assert(r.getAs[Long]("backoff_bp") ==
        g.map(_._3).sum * 10000 / g.map(_._4).sum)
    }
    // Non-vacuous BOTH ways: backoff fires on held-out docs somewhere,
    // and the seen-bigram main path dominates everywhere (the LM is not
    // so sparse that scoring degenerates to the unigram floor).
    assert(rep.exists(_.getAs[Long]("backoff_bp") > 0), "backoff never fired")
    rep.foreach(r => assert(r.getAs[Long]("backoff_bp") < 5000))
    // Held-in docs (even ids, self-scored) never back off; alignment of
    // texts↔perDoc is sound because no doc dropped (asserted first).
    assert(texts.forall(t => bigrams(t._3).nonEmpty),
      "recount covers every doc (no <2-token docs at this SF)")
    assert(texts.zip(perDoc).filter(_._1._1 % 2 == 0).forall(_._2._3 == 0L),
      "a training-slice doc hit the backoff path")
  }
}
