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

  private def ccAuto(nodes: Seq[Long], edges: Seq[(Long, Long)],
      budget: Int = 8, maxIters: Int = 25) =
    Cluster.connectedComponentsAuto(
      nodes.toDF("doc_id"), edges.toDF("doc_a", "doc_b"), "doc_id", budget, maxIters)
      .as[(Long, Long)].collect().toMap

  test("auto face: blob graphs finish inside the propagation budget (star never engages)") {
    // a dense 12-node blob (diameter 2) plus a triangle: propagation
    // closes in ~3 rounds, so auto == propagation and no star phase runs
    val blob = for (i <- 1L to 12L) yield (1L, i)
    val tri = Seq((20L, 21L), (21L, 22L), (22L, 20L))
    val edges = blob ++ tri
    val run = Cluster.propagationRun(edges.toDF("doc_a", "doc_b"), 8)
    assert(run.converged && run.rounds <= 4,
      s"a diameter-2 blob must close in a few propagation rounds, took ${run.rounds}")
    assert(ccAuto(1L to 22L, edges) == cc(1L to 22L, edges))
  }

  test("auto face: a 300-node chain exceeds the budget, star phase closes it correctly") {
    val n = 300L
    val chain = (1L until n).map(i => (i, i + 1))
    // propagation alone would need ~299 rounds; auto must stay inside
    // budget + log-star rounds and still label every node with the min
    val got = ccAuto(1L to n, chain, budget = 6)
    assert((1L to n).forall(got(_) == 1L),
      s"auto must close the chain exactly: ${got.toSeq.sortBy(_._1).takeRight(5)}")
    // sanity: the same budget WITHOUT the fallback trips the bound
    intercept[IllegalArgumentException] { cc(1L to n, chain, maxIters = 6) }
  }

  test("auto face: singletons and an empty pair set stay their own cluster (no NPE)") {
    val got = ccAuto(Seq(7L, 8L, 9L), Seq.empty)
    assert(got == Map(7L -> 7L, 8L -> 8L, 9L -> 9L))
    assert(cc(Seq(7L, 8L), Seq.empty) == Map(7L -> 7L, 8L -> 8L))
  }

  test("star rounds grow with LOG of the path length, not the diameter") {
    def starRounds(n: Long): Int = {
      val chain = (1L until n).map(i => (i, i + 1))
      val run = Cluster.starRun0(chain.toDF("src", "dst"), 25)
      assert(run.converged, s"path($n) star did not converge")
      // correctness, not just convergence
      val lbl = run.labels.as[(Long, Long)].collect().toMap
      assert((1L to n).forall(lbl(_) == 1L), s"path($n) mislabeled")
      run.rounds
    }
    val r256 = starRounds(256)
    val r1024 = starRounds(1024)
    // diameter grew 4x (255 -> 1023); log-convergence means the round
    // count moves by a constant, not a factor
    assert(r256 <= 10, s"path(256) took $r256 star rounds")
    assert(r1024 <= r256 + 3,
      s"4x the diameter must cost O(1) extra star rounds: $r256 -> $r1024")
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

  test("dedup_cluster end-to-end on a planted chain corpus: the star fallback engages INSIDE the shipping query") {
    // Round-13 queue item (c): a corpus whose near-dup relation is
    // transitive-but-not-direct — sliding token windows, so doc_i
    // near-dups doc_{i±1..3} (Jaccard ≈ (W−ks−2)/(W+ks−2)) but nothing
    // further, and the MinHash component's DIAMETER grows with the
    // corpus instead of staying the dense-blob 2–4. 300 windows over a
    // unique-token stream: diameter ≈ 100 ≫ the 8-round propagation
    // budget, so correctness of the shipped face on this corpus PROVES
    // the label-contracted star phase ran end-to-end (ClusterSpec's
    // other cases only probe the CC internals on synthetic edges).
    // step 2 of width 100: adjacent Jaccard ≈ 96/100, so a chain break
    // needs >=3 consecutive independent band misses (~1e-9) — the chain
    // is statistically certain while distance >~6 shares nothing
    val width = 100; val step = 2; val nDocs = 300
    val stream = (0 until (nDocs * step + width)).map(i => s"w$i")
    val docs = (0 until nDocs).map { i =>
      (i.toLong, stream.slice(i * step, i * step + width).mkString(" "),
        "en", "chain", 0L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir("chaincorpus")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // the planted shape really is chain-shaped and really exceeds the
    // budget: propagation alone under the auto face's default budget
    // must NOT reach fixpoint on this pair graph
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .select("doc_a", "doc_b")
    assert(!Cluster.propagationRun(pairs, 8).converged,
      "chain corpus must exceed the propagation budget, or this test proves nothing")

    val clustered = DedupQueries.dedupCluster(spark, dir)
      .as[(Long, Long, Long, Int)].collect()
    assert(clustered.length == nDocs)
    // every window is reachable from doc 0 through its neighbors: ONE
    // component, labeled by the chain's min doc id — a propagation
    // budget miss would leave far windows labeled by a mid-chain id
    assert(clustered.forall(_._2 == 0L),
      s"chain must close to one component: ${clustered.filter(_._2 != 0L).take(5).toSeq}")
    assert(clustered.forall(_._3 == nDocs.toLong))
    assert(clustered.count(_._4 == 1) == 1)
  }

  test("minhashStarEdges: identical components to the pair spelling, " +
      "including a planted mega-cluster (round-14 verdict item 7)") {
    import org.apache.spark.sql.functions._
    // a skewed corpus: 40 near-dups of ONE seed (the hot-bucket shape),
    // two small clusters, and uniques — built like the generator's
    // --skew-docs mode
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    def nearDup(i: Int) = {
      val w = base.split(" ")
      w(i % w.length) = "dup"
      w.mkString(" ")
    }
    val mega = (0 until 40).map(i =>
      (i.toLong, if (i == 0) base else nearDup(i)))
    val small = Seq((100L, "one two three four five six seven eight nine ten"),
      (101L, "one two three four five six seven eight nine dup"),
      (102L, "cat dog bird fish horse sheep goat cow duck hen"),
      (103L, "cat dog bird fish horse sheep goat cow duck dup"))
    val uniq = (200 until 230).map(i =>
      (i.toLong, s"unique$i words ${i * 7} other ${i * 13} tokens ${i * 3} here ${i * 29} now ${i * 31} end"))
    val docs = (mega ++ small ++ uniq).toDF("doc_id", "text")

    val ids = docs.select(col("doc_id"))
    val pairCc = Cluster.connectedComponentsAuto(ids,
        Dedup.minhashCandidates(docs, "doc_id", "text")
          .select(col("doc_a"), col("doc_b")), "doc_id")
      .as[(Long, Long)].collect().toMap
    val starCc = Cluster.connectedComponentsAuto(ids,
        Dedup.minhashStarEdges(docs, "doc_id", "text"), "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(pairCc == starCc,
      "star edges must produce the exact components of the pair graph")
    // non-vacuous: the planted cluster's dominant component is big (a
    // few variants may band-split — equality above is the real pin)
    val megaSizes = starCc.filter(_._1 < 40L).values
      .groupBy(identity).map(_._2.size)
    assert(megaSizes.max >= 10,
      s"planted mega-cluster must largely cluster: ${starCc.filter(_._1 < 40L)}")
    // and the edge volume is linear, not quadratic, in the hot bucket
    val starEdges = Dedup.minhashStarEdges(docs, "doc_id", "text").count()
    val pairEdges = Dedup.minhashCandidates(docs, "doc_id", "text").count()
    assert(starEdges < pairEdges,
      s"star edge list ($starEdges) must undercut the pair list ($pairEdges)")
  }
}
