package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantLmSpec extends SparkSpec {
  import spark.implicits._

  test("quantize: <=2^bits codes, monotone, exact when distinct values fit") {
    // 10k values from a skewed distribution
    val df = spark.range(10000)
      .select((log(col("id").cast("double") + 1.0) * -1.0).as("lp"))
    val q = LmQuant.quantize(df, "lp", bits = 4).select("lp", "bin", "q")
      .as[(Double, Int, Double)].collect()
    val codes = q.map(_._2).distinct
    assert(codes.length <= 16 && codes.forall(b => b >= 0 && b < 16))
    // monotone: a larger lp can never land in a smaller bin
    val sorted = q.sortBy(_._1)
    assert(sorted.sliding(2).forall { case Array(a, b) => a._2 <= b._2; case _ => true })
    // codebook value = mean of the bin's members
    q.groupBy(_._2).foreach { case (_, rows) =>
      val mean = rows.map(_._1).sum / rows.length
      assert(math.abs(rows.head._3 - mean) < 1e-9)
      assert(rows.forall(r => math.abs(r._3 - rows.head._3) < 1e-12),
        "every member of a bin shares one codebook value")
    }
    // when the distinct values fit in the codebook, quantization is lossless
    val tiny = Seq(-1.0, -2.0, -3.0).toDF("lp")
    val exact = LmQuant.quantize(tiny, "lp", bits = 4)
      .select("lp", "q").as[(Double, Double)].collect()
    assert(exact.forall { case (lp, qv) => lp == qv })
  }

  test("equal-frequency bins: no bin holds more than ~2x its fair share") {
    val df = spark.range(100000)
      .select((col("id").cast("double") / -1000.0).as("lp")) // uniform
    val sizes = LmQuant.quantize(df, "lp", bits = 8)
      .groupBy("bin").count().select("count").as[Long].collect()
    val fair = 100000.0 / 256
    assert(sizes.forall(_ <= fair * 2), s"worst bin ${sizes.max} vs fair $fair")
  }

  test("codeBytes accounting") {
    assert(LmQuant.codeBytes(1000, 8) == 1000L)
    assert(LmQuant.codeBytes(1000, 4) == 500L)
    assert(LmQuant.codeBytes(3, 4) == 2L)
  }

  test("quantized scoring: full column reproduces C42a, drift bounded, 8x smaller") {
    val q = TextQueries.textPerplexityQuantized(spark, sfDir).collect()
    val full = TextQueries.textPerplexityBigram(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("avg_xent")).toMap
    assert(q.nonEmpty && q.length == full.size)
    q.foreach { r =>
      val src = r.getString(0)
      // the full-precision path through the quantized plan must equal
      // C42a's scoring exactly (same LM, same backoff; only the plan
      // spelling differs) — both are rounded to 4dp upstream
      assert(math.abs(r.getAs[Double]("avg_xent") - full(src)) <= 1e-3,
        s"$src: full-precision column ${r.getAs[Double]("avg_xent")} vs C42a ${full(src)}")
      // 8-bit equal-frequency codebooks keep scoring drift small: the
      // measured per-source avg drift at the test SFs is < 0.02 nats;
      // pinned with slack
      assert(r.getAs[Double]("avg_abs_dev") <= 0.05,
        s"$src: avg |drift| ${r.getAs[Double]("avg_abs_dev")}")
      assert(r.getAs[Double]("max_abs_dev") <= 0.2,
        s"$src: max |drift| ${r.getAs[Double]("max_abs_dev")}")
    }
    val again = TextQueries.textPerplexityQuantized(spark, sfDir).collect()
    assert(q.map(_.toString).toSeq == again.map(_.toString).toSeq, "deterministic")
  }
}
