package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C100 — dimension-truncation (Matryoshka) recall audit. */
class DimAuditSpec extends SparkSpec {
  import spark.implicits._

  test("the full-dim row is its own ground truth; every recall is a valid bp") {
    val rows = VectorQueries.annDimAudit(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("dims")).toSeq == Seq(8, 16, 32, 64))
    val full = rows.find(_.getAs[Int]("dims") == 64).get
    assert(full.getAs[Long]("recall_bp") == 10000L,
      "d=64 IS the truth set — recall must be exactly 10000 bp")
    assert(full.getAs[Long]("hits") == full.getAs[Long]("truth"))
    rows.foreach { r =>
      assert(r.getAs[Long]("recall_bp") >= 0 && r.getAs[Long]("recall_bp") <= 10000)
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("returned"))
      assert(r.getAs[Long]("queries") == 5L)
      // the vec_id tiebreak makes the ordering key unique: exactly 10
      assert(r.getAs[Long]("returned") == 50L)
    }
  }

  test("recall recounts against a driver-side prefix-space search") {
    val vecs = graft.sources.Tables(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, e) => id -> e.map(_.toDouble).toArray }.toMap
    // Spark's Round(double) goes through BigDecimal.valueOf (the
    // shortest-decimal representation), NOT the exact binary expansion —
    // mirror that, or a cosine landing a hair under a .00005 boundary
    // recounts one rank differently
    def round4(x: Double) =
      java.math.BigDecimal.valueOf(x)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    def top(d: Int): Map[Long, Set[Long]] =
      (0L until 5L).map { q =>
        val qe = vecs(q).take(d)
        val qn = math.sqrt(qe.map(x => x * x).sum)
        val scored = vecs.filter(_._1 >= 5).toSeq.flatMap { case (id, e0) =>
          val e = e0.take(d)
          val n = math.sqrt(e.map(x => x * x).sum)
          if (n > 0 && qn > 0)
            Some(id -> round4(qe.zip(e).map { case (a, b) => a * b }.sum / (qn * n)))
          else None
        }
        // the window orders by (rounded cos desc, vec_id): the id
        // tiebreak makes every ordering key unique, so rank() == a plain
        // top-10 cut — exactly 10 per query
        q -> scored.sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      }.toMap
    val got = VectorQueries.annDimAudit(spark, sfDir).collect()
      .map(r => r.getAs[Int]("dims") -> r).toMap
    val truth = top(64)
    Seq(8, 16, 32, 64).foreach { d =>
      val t = top(d)
      val hits = (0L until 5L).map(q => (t(q) intersect truth(q)).size).sum
      val returned = (0L until 5L).map(q => t(q).size).sum
      assert(got(d).getAs[Long]("hits") == hits.toLong, s"d=$d hits")
      assert(got(d).getAs[Long]("returned") == returned.toLong, s"d=$d returned")
    }
  }

  test("deterministic run over run") {
    val a = VectorQueries.annDimAudit(spark, sfDir).collect().map(_.toString).toSeq
    val b = VectorQueries.annDimAudit(spark, sfDir).collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("adaptive two-stage serving rescues the prefix stage's recall (C104)") {
    // exact full-dim ground truth = the C6 brute-force face's pair set
    val truth = VectorQueries.simSearchTopk(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val adaptive = VectorQueries.simSearchAdaptive(spark, sfDir).collect()
    assert(adaptive.nonEmpty)
    val got = adaptive
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (got intersect truth).size.toDouble / truth.size
    // the d=16 PREFIX top-10 alone reads ~18% recall on these random
    // vectors (the C100 card); the 100-deep shortlist + exact rescore
    // must rescue most of it — pin a conservative floor and publish the
    // measured value in the assertion message
    assert(recall >= 0.6, f"two-stage recall@10 = $recall%.2f (floor 0.6)")
    // exactness where the shortlist suffices: every returned pair's
    // cosine equals the brute-force face's value for that pair
    val exactCos = VectorQueries.simSearchTopk(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")) ->
        r.getAs[Double]("cosine")).toMap
    adaptive.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))
      exactCos.get(k).foreach(c => assert(r.getAs[Double]("cosine") == c))
    }
    // determinism
    val again = VectorQueries.simSearchAdaptive(spark, sfDir).collect()
    assert(adaptive.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
