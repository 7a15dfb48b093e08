package graft.ops

import graft.SparkSpec

/** C87 — the ANN recall audit card. */
class AnnAuditSpec extends SparkSpec {
  import spark.implicits._

  test("audit recounts each method's overlap with exact ground truth") {
    val exact = VectorQueries.simSearchTopk(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
    val got = VectorQueries.annRecallAudit(spark, sfDir).collect()
    assert(got.map(_.getAs[String]("method")).distinct.sorted.toSeq ==
      Seq("adaptive", "graph", "ivf", "lsh", "pq", "sq8"))
    // every (method, query) row present, arithmetic exact
    got.foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert(r.getAs[Long]("exact_k") == exact(q).size.toLong)
      val hits = r.getAs[Long]("hits")
      assert(hits >= 0L && hits <= r.getAs[Long]("exact_k"))
      assert(r.getAs[Long]("recall_bp") == hits * 10000 / r.getAs[Long]("exact_k"))
    }
    assert(got.length == 6 * exact.size) // 6 methods x 5 queries
    // one independent recount: lsh hits really are the set overlap
    val lsh = VectorQueries.simSearchLsh(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
    got.filter(_.getAs[String]("method") == "lsh").foreach { r =>
      val q = r.getAs[Long]("query_id")
      val expect = lsh.getOrElse(q, Set.empty).intersect(exact(q)).size.toLong
      assert(r.getAs[Long]("hits") == expect, s"lsh query $q")
    }
    // sanity floors only — the CARD's job is to report the real number
    // (lsh top-k at this corpus's low-cosine regime is legitimately
    // weak, exactly what the audit exists to surface); the rescoring
    // methods must stay strong
    val mean = got.groupBy(_.getAs[String]("method")).map { case (m, rs) =>
      m -> rs.map(_.getAs[Long]("recall_bp")).sum / rs.length
    }
    assert(mean.values.forall(_ > 0L), s"every method finds something: $mean")
    assert(mean("pq") >= 5000L && mean("sq8") >= 5000L,
      s"quantized-rescore methods must stay strong: $mean")
    assert(mean("graph") >= 5000L,
      s"graph traversal rescores exact cosines — must stay strong: $mean")
    // adaptive's 16-dim-prefix shortlist is strong at gate scale (its
    // measured collapse starts past ~10^5 vectors — BASELINE round-13)
    assert(mean("adaptive") >= 5000L,
      s"adaptive must stay strong at gate scale: $mean")
  }

  test("serve-shaped graph audit rows == the inline trainer's overlap (round-11 re-shape)") {
    // the audit serves `graph` from the persisted adjacency; its rows
    // must be exactly what auditing the inline build would report
    val exact = VectorQueries.simSearchTopk(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
    val inline = GraphAnn.simSearchGraph(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
    VectorQueries.annRecallAudit(spark, sfDir).collect()
      .filter(_.getAs[String]("method") == "graph").foreach { r =>
        val q = r.getAs[Long]("query_id")
        val expect = inline.getOrElse(q, Set.empty).intersect(exact(q)).size.toLong
        assert(r.getAs[Long]("hits") == expect, s"graph query $q")
      }
  }

  test("cached-index audit: persisted serve artifacts keep their recall, warm == cold") {
    val cold = VectorQueries.annRecallAuditCached(spark, sfDir).collect()
    assert(cold.map(_.getAs[String]("method")).distinct.sorted.toSeq ==
      Seq("graph", "ivfpq", "opq"))
    cold.foreach { r =>
      val hits = r.getAs[Long]("hits")
      assert(hits >= 0L && hits <= r.getAs[Long]("exact_k"))
      assert(r.getAs[Long]("recall_bp") == hits * 10000 / r.getAs[Long]("exact_k"))
    }
    val mean = cold.groupBy(_.getAs[String]("method")).map { case (m, rs) =>
      m -> rs.map(_.getAs[Long]("recall_bp")).sum / rs.length
    }
    assert(mean.values.forall(_ >= 3000L),
      s"served indexes must keep usable recall: $mean")
    // warm call: artifacts already persisted — the audit is a pure read
    val warm = VectorQueries.annRecallAuditCached(spark, sfDir).collect()
    assert(warm.map(_.toString).sorted.toSeq == cold.map(_.toString).sorted.toSeq,
      "auditing a stored index twice must give identical rows")
  }
}
