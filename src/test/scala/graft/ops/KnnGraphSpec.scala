package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = graft.sources.Tables(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"))
    .as[(Long, Seq[Float])].collect()
    .map { case (id, e) => id -> e.map(_.toDouble).toArray }

  test("knn_graph: valid graph shape, bounded recall vs the exact graph") {
    val got = VectorQueries.knnGraph(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val n = vecs.length
    assert(got.length == n * 3, "every vector must carry exactly 3 neighbors")
    // per-src: ranks 1..3, cosine non-increasing, no self-edges
    got.groupBy(_._1).foreach { case (src, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == Seq(1, 2, 3))
      assert(sorted.sliding(2).forall { case Array(x, y) => x._4 >= y._4; case _ => true })
      assert(rows.forall(_._3 != src))
    }
    // exact top-3 graph, driver-side
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val exact = vecs.map { case (id, e) =>
      id -> vecs.filter(_._1 != id)
        .map { case (j, f) => (j, cos(e, f)) }
        .sortBy { case (j, c) => (-c, j) }.take(3).map(_._1).toSet
    }.toMap
    val hit = got.groupBy(_._1).map { case (src, rows) =>
      rows.map(_._3).toSet.intersect(exact(src)).size
    }.sum
    val recall = hit.toDouble / (n * 3)
    // 3-probe over 8 learned cells (2-probe measured 0.745); pinned with
    // slack — a real miss (blocking broken) craters this
    assert(recall >= 0.8, s"kNN-graph recall@3 $recall below the 3-probe band")
    val again = VectorQueries.knnGraph(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == again.toSeq, "deterministic")
  }

  test("knn_graph plan: cell-blocked equi-join, no cartesian, partial top-k") {
    val plan = VectorQueries.knnGraph(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"pairs must form only within cells:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"the per-vector top-3 must rank with a partial group limit:\n$plan")
    // round-15: the multi-assign argmax is checkpointed ONCE (it feeds
    // both pair-join sides, which Spark would otherwise compute twice),
    // so the serve plan reads the materialized assignment instead of
    // re-running nearest_centroids inline — both join sides must scan
    // the checkpoint blocks
    assert(plan.contains("ExistingRDD"),
      s"the pair join must read the one materialized assignment:\n$plan")
    assert(!plan.contains("nearest_centroids"),
      "the argmax must not be recomputed inside the pair join " +
        "(it runs once, in the checkpointed assignment pass)")
  }
}
