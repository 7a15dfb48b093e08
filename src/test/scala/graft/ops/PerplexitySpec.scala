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
}
