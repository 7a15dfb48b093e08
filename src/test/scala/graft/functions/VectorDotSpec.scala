package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorDotSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (Seq(0.5, -0.5), Seq(2.0, 2.0))).toDF("a", "b")

  test("matches the built-in aggregate(zip_with) spelling exactly") {
    val builtin = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)).as[Double].collect()
    val native = df.select(VectorDot(col("a"), col("b"))).as[Double].collect()
    assert(native.toSeq == builtin.toSeq)
    assert(native(0) == 32.0 && native(1) == 0.0)
  }

  test("survives both codegen and interpreted evaluation") {
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val r = df.select(VectorDot(col("a"), col("b"))).as[Double].collect()
        assert(r.toSeq == Seq(32.0, 0.0), s"mode=$mode")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null inputs yield null") {
    val withNull = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val r = withNull.select(VectorDot(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0))
  }

  test("rejects non-double-array inputs at analysis time") {
    val bad = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    val e = intercept[Exception](bad.select(VectorDot(col("a"), col("b"))).collect())
    assert(e.getMessage.toLowerCase.contains("vector_dot") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("vector_dot is callable from SQL once registered") {
    // register the same triples GraftExtensions injects at session build
    // (the shared test session predates any extensions config)
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    graft.GraftExtensions.functions.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
    val r = spark.sql("SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .collect()(0).getDouble(0)
    assert(r == 11.0)
  }
}
