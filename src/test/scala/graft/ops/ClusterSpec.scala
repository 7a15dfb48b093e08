package graft.ops

import graft.SparkSpec

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)], maxIters: Int = 20) =
    Cluster.connectedComponents(
      nodes.toDF("doc_id"), edges.toDF("doc_a", "doc_b"), "doc_id", maxIters)
      .as[(Long, Long)].collect().toMap

  test("transitivity: A~B and B~C cluster A with C") {
    val got = cc(Seq(1L, 2L, 3L, 4L), Seq((1L, 2L), (2L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  test("independent components keep independent labels") {
    val got = cc(Seq(1L, 2L, 5L, 6L, 9L), Seq((1L, 2L), (5L, 6L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L))
  }

  test("a long chain converges to the chain's min id") {
    // path graph 10-11-...-19: diameter 9, needs several rounds
    val chain = (10L until 19L).map(i => (i, i + 1))
    val got = cc((10L to 19L) ++ Seq(3L), chain)
    assert((10L to 19L).forall(got(_) == 10L) && got(3L) == 3L)
  }

  test("edge direction is irrelevant (symmetric closure)") {
    val got = cc(Seq(1L, 2L, 3L), Seq((3L, 2L), (2L, 1L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("exceeding the iteration bound fails loudly, never silently wrong") {
    val chain = (1L until 12L).map(i => (i, i + 1))
    val ex = intercept[IllegalArgumentException] {
      cc(1L to 12L, chain, maxIters = 2)
    }
    assert(ex.getMessage.contains("converge"))
  }

  private def ccStar(nodes: Seq[Long], edges: Seq[(Long, Long)], maxIters: Int = 25) =
    Cluster.connectedComponentsStar(
      nodes.toDF("doc_id"), edges.toDF("doc_a", "doc_b"), "doc_id", maxIters)
      .as[(Long, Long)].collect().toMap

  test("star face equals the propagation face on assorted graphs") {
    val cases = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq((1L, 2L), (2L, 3L))),
      (Seq(1L, 2L, 5L, 6L, 9L), Seq((1L, 2L), (5L, 6L))),
      ((10L to 19L) ++ Seq(3L), (10L until 19L).map(i => (i, i + 1))),
      (Seq(1L, 2L, 3L), Seq((3L, 2L), (2L, 1L), (1L, 3L))))  // with a cycle
    for ((nodes, edges) <- cases)
      assert(ccStar(nodes, edges) == cc(nodes, edges),
        s"faces diverge on $edges")
  }

  test("star face equals the propagation face on the real minhash pair graph") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .select("doc_a", "doc_b")
    val prop = Cluster.connectedComponents(
      docs.select("doc_id"), pairs, "doc_id")
      .as[(Long, Long)].collect().toMap
    val star = Cluster.connectedComponentsStar(
      docs.select("doc_id"), pairs, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(star == prop)
  }

  test("star face closes a 64-node path within the budget that trips propagation") {
    val n = 64
    val chain = (1L until n).map(i => (i, i + 1))
    val budget = 12
    // propagation needs ~diameter rounds: 12 is far too few for 64 nodes
    val ex = intercept[IllegalArgumentException] {
      cc(1L to n, chain, maxIters = budget)
    }
    assert(ex.getMessage.contains("converge"))
    // the star rounds collapse the path exponentially: same budget passes
    val got = ccStar(1L to n, chain, maxIters = budget)
    assert((1L to n).forall(got(_) == 1L),
      s"chain must collapse to min id, got ${got.toSeq.sortBy(_._1).take(8)}...")
  }

  test("dedup_cluster query: keepers are cluster minima, sizes add to corpus") {
    val df = DedupQueries.dedupCluster(spark, sfDir)
    val rows = df.as[(Long, Long, Long, Int)].collect()
    assert(rows.nonEmpty)
    // every cluster's keeper is its min doc_id, exactly one keeper per cluster
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid, s"cluster $cid label isn't its min doc")
      assert(members.count(_._4 == 1) == 1, s"cluster $cid needs exactly one keeper")
      assert(members.forall(_._3 == members.length), s"cluster $cid size mismatch")
    }
    // partition: every document appears exactly once
    assert(rows.map(_._1).distinct.length == rows.length)
    // clusters must be consistent with the pair graph: every minhash pair
    // ends up in the same cluster
    val pairs = Dedup.minhashCandidates(
      graft.sources.Tables(spark, sfDir, "documents"), "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val label = rows.map(r => r._1 -> r._2).toMap
    pairs.foreach { case (a, b) =>
      assert(label(a) == label(b), s"paired docs $a,$b landed in different clusters")
    }
  }
}
