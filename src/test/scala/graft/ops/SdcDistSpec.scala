package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec


/** The native SDC kernel must be VALUE-IDENTICAL to the HOF spelling it
  * replaced — same tables, same codes, same doubles (lookup-sum order
  * is fixed by the subspace index in both, so equality is exact, not
  * approximate). */
class SdcDistSpec extends SparkSpec {

  test("sdc_dist == HOF spelling on the real coded corpus, exactly") {
    val v = Vectors.withNorm(
        graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
      .select(col("vec_id"), col("e"), col("nrm"))
    val m = SemanticPq.buildModel(v, k = KMeans.adaptiveK(v.count()),
      iters = 3, numSub = 16, subDim = 4, pqK = 64)
    val a = m.coded.select(col("cluster"), col("vec_id").as("va"),
      col("codes").as("ca"))
    val b = m.coded.select(col("cluster"), col("vec_id").as("vb"),
      col("codes").as("cb"))
    val pairs = a.join(b, Seq("cluster")).where(col("va") < col("vb"))
      .crossJoin(broadcast(m.dtabs))
      .select(col("va"), col("vb"),
        SemanticPq.sdcDist(col("ca"), col("cb"), col("dtabs")).as("native"),
        SemanticPq.sdcDistHof(col("ca"), col("cb"), col("dtabs")).as("hof"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getDouble(2) == r.getDouble(3),
        s"pair (${r.getLong(0)}, ${r.getLong(1)}): " +
          s"native ${r.getDouble(2)} != hof ${r.getDouble(3)}")
    }
  }

  test("sdc_dist rejects wrong input types at analysis time") {
    import spark.implicits._
    val df = Seq((Seq(0.5), Seq(0.5))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(graft.functions.SdcDist(col("a"), col("b"), col("a"))).collect()
    }
    assert(e.getMessage.contains("sdc_dist") ||
      e.getMessage.toLowerCase.contains("data type"))
  }

  test("sdc_dist throws on out-of-range codes instead of reading garbage") {
    import spark.implicits._
    // one subspace, a 2x2 table; code 5 is out of range
    val df = Seq((Seq(5), Seq(0), Seq(Seq(Seq(0.0, 1.0), Seq(1.0, 0.0)))))
      .toDF("a", "b", "t")
    val e = intercept[Exception] {
      df.select(graft.functions.SdcDist(col("a"), col("b"), col("t"))).collect()
    }
    assert(e.getMessage.contains("out of range") ||
      Option(e.getCause).exists(_.getMessage.contains("out of range")))
  }
}
