package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C37 dedup_semantic — SemDeDup-style within-learned-cluster pruning.
  * Rows-only CORRECTNESS entry; this spec is its oracle: a full
  * driver-side recount of the pair/prune/report logic given the same
  * cluster assignment, plus determinism. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val tau = 0.35

  test("per-cluster report matches a driver-side brute recount") {
    val rep = VectorQueries.dedupSemantic(spark, sfDir).collect()
    assert(rep.nonEmpty)
    // same fit + the same broadcast-argmax assignment the query uses
    val v = Vectors.withNorm(
        graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
      .select(col("vec_id"), col("e"), col("nrm"))
    val fit = KMeans.fit(v, k = 8, iters = 3)
    val centsArr = fit.centroids.agg(array_sort(collect_list(
      struct(col("cluster"), col("ce"), col("cn")))).as("cents"))
    val assigned = v.crossJoin(broadcast(centsArr))
      .select(col("vec_id"), col("e"), col("nrm"),
        graft.functions.NearestCentroids(col("e"), col("cents"), 1)
          .getItem(0).as("cluster"))
      .as[(Long, Seq[Double], Double, Long)].collect()
    // brute within-cluster pairs with the same left-to-right double math
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    val byCluster = assigned.groupBy(_._4)
    val expected = byCluster.toSeq.sortBy(_._1).map { case (cl, vs) =>
      val sorted = vs.sortBy(_._1)
      val pairs = for {
        i <- sorted.indices; j <- (i + 1) until sorted.length
        a = sorted(i); b = sorted(j)
        cos = dot(a._2, b._2) / (a._3 * b._3)
        if cos >= tau
      } yield (a._1, b._1, cos)
      val pruned = pairs.map(_._2).distinct.size
      val avg = if (pairs.isEmpty) 0.0
        else BigDecimal(pairs.map(_._3).sum / pairs.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (cl, vs.size.toLong, pruned.toLong, (vs.size - pruned).toLong,
        pairs.size.toLong, avg)
    }
    val got = rep.map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("n_vecs"),
      r.getAs[Long]("n_pruned"), r.getAs[Long]("n_kept"),
      r.getAs[Long]("n_pairs"), r.getAs[Double]("avg_pair_cos"))).toSeq
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)) ==
      expected.map(t => (t._1, t._2, t._3, t._4, t._5)),
      "counts must recount exactly (grid join finds ALL within-cluster pairs)")
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._6 - e._6) <= 2e-4, s"avg_pair_cos cluster ${g._1}")
    }
    // accounting invariants + corpus coverage
    assert(got.map(_._2).sum == v.count())
    got.foreach { t => assert(t._3 + t._4 == t._2) }
    assert(got.map(_._3).sum > 0, "non-vacuous: the corpus has semantic dups")
  }

  test("deterministic run over run") {
    // Exact on non-float columns, tolerance on doubles (partial-agg merge
    // order may flip the rounded 4th decimal at a half boundary).
    val a = VectorQueries.dedupSemantic(spark, sfDir).collect()
    val b = VectorQueries.dedupSemantic(spark, sfDir).collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      (0 until x.length).foreach { i =>
        (x.get(i), y.get(i)) match {
          case (p: Double, q: Double) => assert(math.abs(p - q) <= 2e-4, s"col $i")
          case (p, q) => assert(p == q, s"col $i")
        }
      }
    }
  }
}
