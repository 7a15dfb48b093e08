package graft.ops

import graft.SparkSpec

class PercentileSpec extends SparkSpec {

  test("exact percentiles match a driver-side sort-and-interpolate at sf0.001") {
    val got = TextQueries.qualityPercentile(spark, sfDir).collect()
    assert(got.nonEmpty)
    // recompute one source by hand from the raw per-doc scores
    val d = graft.sources.Tables(spark, sfDir, "documents")
    val src = got.head.getAs[String]("source")
    val qs = TextQueries.textQuality(spark, sfDir) // smoke: same pipeline compiles
    assert(qs.columns.contains("avg_quality"))
    val scores = d.where(org.apache.spark.sql.functions.col("source") === src)
      .select(org.apache.spark.sql.functions.col("text"))
      .collect().map { r =>
        val norm = r.getString(0).toLowerCase.replaceAll("\\s+", " ").trim
        val toks = norm.split(" ")
        val nTok = toks.length.toDouble
        val stop = toks.count(Set("the", "a", "of", "and", "to", "in")).toDouble
        val alpha = norm.replace(" ", "").length.toDouble
        0.4 * math.min(nTok / 100.0, 1.0) + 0.3 * math.min(stop / nTok * 10.0, 1.0) +
          0.3 * (if (alpha / nTok >= 3.0 && alpha / nTok <= 8.0) 1.0 else 0.0)
      }.sorted
    def interp(p: Double): Double = {
      val pos = p * (scores.length - 1)
      val lo = scores(pos.toInt)
      val hi = scores(math.min(pos.toInt + 1, scores.length - 1))
      val f = pos - pos.toInt
      math.rint(((1 - f) * lo + f * hi) * 10000) / 10000
    }
    val row = got.find(_.getAs[String]("source") == src).get
    assert(row.getAs[Double]("q25") == interp(0.25), s"q25 for $src")
    assert(row.getAs[Double]("q50") == interp(0.50), s"q50 for $src")
    assert(row.getAs[Double]("q90") == interp(0.90), s"q90 for $src")
  }

  test("decile approx face: population split within 2% of the exact cuts") {
    import graft.analytics.LakeQueries
    val exact = LakeQueries.q18RevenueDeciles(spark, sfDir).collect()
      .map(r => r.getAs[Int]("decile") -> r.getAs[Long]("customers")).toMap
    val approx = LakeQueries.q18RevenueDecilesApprox(spark, sfDir).collect()
      .map(r => r.getAs[Int]("decile") -> r.getAs[Long]("customers")).toMap
    val n = exact.values.sum
    assert(approx.values.sum == n, "approx face must bucket every customer")
    // GK accuracy 1/1e4 at this cardinality: each decile's population may
    // shift by at most the sketch's rank error (bounded at 2% of N here)
    (1 to 10).foreach { d =>
      val diff = math.abs(approx.getOrElse(d, 0L) - exact.getOrElse(d, 0L))
      assert(diff <= math.max(1L, n / 50),
        s"decile $d population ${approx.getOrElse(d, 0L)} vs exact ${exact.getOrElse(d, 0L)}")
    }
  }

  test("approx face stays within 5% of the exact cutoffs") {
    val exact = TextQueries.qualityPercentile(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("q25"), r.getAs[Double]("q50"), r.getAs[Double]("q90"))).toMap
    val approx = TextQueries.qualityPercentileApprox(spark, sfDir).collect()
    assert(approx.map(_.getAs[String]("source")).toSet == exact.keySet)
    approx.foreach { r =>
      val (e25, e50, e90) = exact(r.getAs[String]("source"))
      for ((a, e) <- Seq(r.getAs[Double]("q25") -> e25,
          r.getAs[Double]("q50") -> e50, r.getAs[Double]("q90") -> e90))
        assert(math.abs(a - e) <= math.max(0.02, e * 0.05),
          s"approx $a vs exact $e for ${r.getAs[String]("source")}")
    }
  }
}
