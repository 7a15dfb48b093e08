package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextRepetitionSpec extends SparkSpec {

  test("repetition profile: invariants and a hand recomputation per source") {
    val rows = TextQueries.textRepetition(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    assert(rows.map(_.getAs[Long]("docs")).sum == docs.count(),
      "every document lands in exactly one source profile")
    rows.foreach { r =>
      val dr = r.getAs[Double]("avg_distinct_ratio")
      val ts = r.getAs[Double]("avg_top_share")
      assert(dr > 0 && dr <= 1, s"distinct ratio $dr out of range")
      assert(ts > 0 && ts <= 1, s"top share $ts out of range")
      assert(r.getAs[Long]("n_repetitive") <= r.getAs[Long]("docs"))
    }

    // hand-recompute one source from the raw text with the same tokenizer
    val src = rows.head.getAs[String]("source")
    val texts = docs.where(col("source") === src)
      .select("text").collect().map(_.getString(0))
    val perDoc = texts.map { t =>
      val toks = t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ")
      val counts = toks.groupBy(identity).view.mapValues(_.length)
      (counts.size.toDouble / toks.length,
        counts.values.max.toDouble / toks.length)
    }
    val got = rows.find(_.getAs[String]("source") == src).get
    assert(math.abs(got.getAs[Double]("avg_distinct_ratio") -
      perDoc.map(_._1).sum / perDoc.length) < 1e-4)
    assert(math.abs(got.getAs[Double]("avg_top_share") -
      perDoc.map(_._2).sum / perDoc.length) < 1e-4)
    assert(got.getAs[Long]("n_repetitive") == perDoc.count(_._1 < 0.5))
  }
}
