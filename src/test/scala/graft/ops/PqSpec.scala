package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C38 sim_search_pq — product-quantization ANN. Rows-only CORRECTNESS
  * entry; this spec is its oracle: code-shape invariants, ADC-vs-exact
  * consistency, recall against the brute-force C6 baseline, and
  * determinism. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val (numSub, subDim, k) = (8, 8, 16)

  private lazy val unit = {
    val v = Vectors.withNorm(
      graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
    v.select(col("vec_id"), transform(col("e"), x => x / col("nrm")).as("e"))
  }

  test("codebooks and codes have the PQ shape") {
    val cb = ProductQuant.fit(unit, numSub, subDim, k, iters = 2)
    val rows = cb.select(col("m"), col("code"), size(col("cv")).as("w")).collect()
    assert(rows.map(_.getAs[Int]("m")).distinct.sorted.toSeq == (0 until numSub))
    assert(rows.forall(_.getAs[Int]("w") == subDim), "codebook entries are subDim wide")
    val perM = rows.groupBy(_.getAs[Int]("m")).view.mapValues(_.length)
    assert(perM.values.forall(_ <= k), "at most k entries per subspace (empties may drop)")
    val validCodes = rows.groupBy(_.getAs[Int]("m"))
      .view.mapValues(_.map(_.getAs[Long]("code")).toSet).toMap
    val codes = ProductQuant.encode(unit, cb, numSub, subDim)
      .select(col("vec_id"), col("codes")).as[(Long, Seq[Long])].collect()
    assert(codes.length == unit.count())
    assert(codes.forall(_._2.length == numSub), "one code per subspace")
    codes.foreach { case (_, cs) =>
      cs.zipWithIndex.foreach { case (c, m) =>
        assert(validCodes(m).contains(c), s"code $c not in subspace $m codebook")
      }
    }
  }

  test("every vector's code is its true argmin codebook entry (driver recount)") {
    val cb = ProductQuant.fit(unit, numSub, subDim, k, iters = 2)
    val book = cb.select(col("m"), col("code"), col("cv"))
      .as[(Int, Long, Seq[Double])].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).sortBy(_._1)).toMap
    val vecs = unit.select(col("vec_id"), col("e")).as[(Long, Seq[Double])].collect()
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    val got = ProductQuant.encode(unit, cb, numSub, subDim)
      .select(col("vec_id"), col("codes")).as[(Long, Seq[Long])].collect().toMap
    vecs.foreach { case (id, e) =>
      (0 until numSub).foreach { m =>
        val sv = e.slice(m * subDim, (m + 1) * subDim)
        // ties break to the lowest code id, like the Spark argmin
        val expect = book(m).map { case (c, cv) => (l2(sv, cv), c) }.min._2
        assert(got(id)(m) == expect, s"vec $id subspace $m")
      }
    }
  }

  test("recall@10 vs the brute-force baseline, and determinism") {
    val brute = VectorQueries.simSearchTopk(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pq = ProductQuant.simSearchPq(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.keys.toSeq.sorted.map { q =>
      brute(q).intersect(pq.getOrElse(q, Set.empty)).size.toDouble / brute(q).size
    }
    val mean = recalls.sum / recalls.size
    // measured 0.94 at sf0.001 (deterministic build); generous floor
    assert(mean >= 0.8, s"PQ mean recall@10 $mean (per-query: $recalls)")
    val a = ProductQuant.simSearchPq(spark, sfDir).collect().map(_.toString).toSeq
    val b = ProductQuant.simSearchPq(spark, sfDir).collect().map(_.toString).toSeq
    assert(a == b, "PQ search is deterministic run over run")
  }
}
