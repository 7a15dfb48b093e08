package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SQ8 bounds: codes live on the byte grid, reconstruction error is
  * within half a grid step per dimension, recall@10 holds against the
  * brute-force C6 baseline, and the search is deterministic. */
class ScalarQuantSpec extends SparkSpec {
  import spark.implicits._

  private lazy val unit = {
    val v = Vectors.withNorm(
      graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
    v.select(col("vec_id"), transform(col("e"), x => x / col("nrm")).as("e"))
  }

  test("codes are bytes and reconstruction stays within half a grid step") {
    val dim = VectorQueries.EmbeddingDim
    val (lo, hi) = ScalarQuant.dimRanges(unit, dim)
    assert(lo.zip(hi).forall { case (l, h) => l <= h })
    val pairs = unit.select(col("e"),
        ScalarQuant.dequantize(
          ScalarQuant.quantize(col("e"), lo, hi), lo, hi).as("r"),
        ScalarQuant.quantize(col("e"), lo, hi).as("q"))
      .collect()
    pairs.foreach { row =>
      val e = row.getSeq[Double](0)
      val r = row.getSeq[Double](1)
      val q = row.getSeq[Int](2)
      assert(q.forall(v => v >= 0 && v <= 255), "a code left the byte grid")
      e.indices.foreach { i =>
        val step = (hi(i) - lo(i)) / 255d
        assert(math.abs(e(i) - r(i)) <= step / 2 + 1e-12,
          s"dim $i reconstruction off by more than half a step")
      }
    }
  }

  test("recall@10 vs the brute-force baseline, and determinism") {
    val brute = VectorQueries.simSearchTopk(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sq = ScalarQuant.simSearchSq8(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.keys.toSeq.sorted.map { q =>
      brute(q).intersect(sq.getOrElse(q, Set.empty)).size.toDouble / brute(q).size
    }
    val mean = recalls.sum / recalls.size
    // 8-bit per-dimension resolution barely perturbs 64-dim cosines, and
    // the exact rescore fixes ordering inside the margin — near-perfect
    assert(mean >= 0.95, s"SQ8 mean recall@10 $mean (per-query: $recalls)")
    val again = ScalarQuant.simSearchSq8(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq
    val first = ScalarQuant.simSearchSq8(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq
    assert(again == first, "rerun diverged")
  }
}
