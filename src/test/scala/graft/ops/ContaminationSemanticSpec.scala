package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C83 — embedding-space decontamination. */
class ContaminationSemanticSpec extends SparkSpec {
  import spark.implicits._

  test("card equals a driver-side brute-force recomputation") {
    val vecs = Vectors.withNorm(
        graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
      .select($"vec_id", $"e", $"nrm")
      .as[(Long, Seq[Double], Double)].collect()
    val items = vecs.filter(_._1 < 5)
    val corpus = vecs.filter(_._1 >= 5)
    val got = VectorQueries.contaminationSemantic(spark, sfDir)
      .as[(Long, Long, Option[Double], Option[Long])].collect()
    assert(got.length == items.length)
    items.foreach { case (id, qe, qn) =>
      val scored = corpus.map { case (v, e, n) =>
        val cos = BigDecimal(qe.zip(e).map { case (x, y) => x * y }.sum / (qn * n))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (v, cos)
      }
      val maxCos = scored.map(_._2).max
      val nearest = scored.filter(_._2 == maxCos).map(_._1).min
      val flagged = scored.count(_._2 >= 0.35).toLong
      val row = got.find(_._1 == id).get
      assert(row._2 == flagged, s"item $id n_flagged")
      assert(row._3.contains(maxCos), s"item $id nearest_cos")
      assert(row._4.contains(nearest), s"item $id nearest_vec")
    }
  }

  test("a planted paraphrase-leak (same embedding, zero shared n-grams) is caught") {
    val dir = tmpDir("semcon")
    val item = Seq.tabulate(8)(i => (i + 1).toFloat)
    Seq(
      (0L, item, 0),
      (1L, Seq.tabulate(8)(i => if (i == 0) 1f else 0f), 0),
      // vec 100 IS item 0's embedding — the paraphrased leak
      (100L, item, 1),
      (200L, Seq.tabulate(8)(i => if (i == 7) 1f else 0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = VectorQueries.contaminationSemantic(spark, dir)
      .as[(Long, Long, Option[Double], Option[Long])].collect().toSeq
    val item0 = got.find(_._1 == 0L).get
    assert(item0._2 >= 1L && item0._3.contains(1.0) && item0._4.contains(100L),
      s"the planted leak must flag item 0 at cos 1.0: $item0")
  }

  test("empty corpus: every item keeps its row with 0 flagged and NULL nearest") {
    val dir = tmpDir("semcon-empty")
    Seq(
      (0L, Seq(1f, 0f, 0f), 0),
      (1L, Seq(0f, 1f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = VectorQueries.contaminationSemantic(spark, dir)
      .as[(Long, Long, Option[Double], Option[Long])].collect().toSeq.sortBy(_._1)
    assert(got == Seq((0L, 0L, None, None), (1L, 0L, None, None)))
  }
}
