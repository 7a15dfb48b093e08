package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphAnnSpec extends SparkSpec {

  private lazy val vecs = graft.sources.Tables(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"))
    .collect()
    .map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray)

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / math.sqrt(na * nb)
  }

  test("sim_search_graph: valid result shape, bounded recall@10 vs brute force") {
    val got = GraphAnn.simSearchGraph(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == (0L until 5L).toSet, "one result group per query")
    byQ.foreach { case (q, rows) =>
      assert(rows.length >= 10, s"query $q returned ${rows.length} < 10 rows")
      assert(rows.forall(_._3 != q), "no self-matches")
      val sorted = rows.sortBy(r => (r._2, r._3))
      assert(sorted.sliding(2).forall {
        case Array(x, y) => x._4 >= y._4; case _ => true
      }, "cosine non-increasing in rank")
    }
    // exact top-10 ground truth, driver-side
    val exact = (0L until 5L).map { q =>
      val qe = vecs.find(_._1 == q).get._2
      q -> vecs.filter(_._1 != q)
        .map { case (j, f) => (j, cos(qe, f)) }
        .sortBy { case (j, c) => (-c, j) }.take(10).map(_._1).toSet
    }.toMap
    val hit = byQ.map { case (q, rows) =>
      rows.map(_._3).toSet.intersect(exact(q)).size.min(10)
    }.sum
    val recall = hit.toDouble / (5 * 10)
    info(s"graph-search recall@10 = $recall")
    // degree-8 graph, beam 8, 3 hops from 8 cell medoids; pinned with
    // slack — a broken expansion (wrong join key, frontier never
    // advancing) craters this to entry-medoids-only
    assert(recall >= 0.8, s"graph-search recall@10 $recall below band")
  }

  test("sim_search_graph: deterministic across runs") {
    val a = GraphAnn.simSearchGraph(spark, sfDir).collect().map(_.toSeq).toSeq
    val b = GraphAnn.simSearchGraph(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("graph build: degree bound, no self-edges, edges land on real corpus ids") {
    val v = Vectors.withNorm(
      graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
    val (adj, entries) = GraphAnn.buildGraph(v)
    val rows = adj.collect()
    val bySrc = rows.groupBy(_.getLong(0))
    assert(bySrc.values.forall(_.length <= GraphAnn.Degree),
      "out-degree must not exceed Degree")
    assert(bySrc.values.forall(_.forall(r => r.getLong(0) != r.getLong(1))),
      "no self-edges")
    // every node has a full fan-out at this SF (cells are larger than R)
    assert(bySrc.values.forall(_.length == GraphAnn.Degree))
    // the slim adjacency is pure ids — both ends must be corpus ids
    // (the serve path re-attaches vectors by joining the corpus, so a
    // dangling dst would silently drop its edge)
    val byId = vecs.toMap
    assert(rows.forall(r => byId.contains(r.getLong(0)) && byId.contains(r.getLong(1))))
    // entry points: one medoid per learned cell, all distinct corpus ids
    val ents = entries.collect().map(_.getLong(0))
    assert(ents.distinct.length == ents.length)
    assert(ents.forall(byId.contains))
  }

  test("plan: cell-blocked build and broadcast-only scoring, no cartesian") {
    val v = Vectors.withNorm(
      graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
    val (adj, _) = GraphAnn.buildGraph(v)
    val buildPlan = adj.queryExecution.executedPlan.toString
    assert(!buildPlan.contains("CartesianProduct"),
      s"graph build must pair only within cells:\n$buildPlan")
    val servePlan = GraphAnn.simSearchGraph(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!servePlan.contains("CartesianProduct"),
      s"serve tail must stay equi-join + broadcast:\n$servePlan")
  }
}
