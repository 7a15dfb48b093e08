package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Degenerate-embedding contract: a null or all-zero vector (failed
  * encoder output) must never reach a cosine — under Spark 4's ANSI
  * default, nrm=0 makes every cosine a DIVIDE_BY_ZERO that kills the
  * job (reproduced before the withNorm guard landed). */
class VectorEdgeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val edge = Seq(
    (1L, Seq.fill(4)(0.0f), "a"),               // zero vector
    (2L, Seq(1.0f, 0f, 0f, 0f), "a"),
    (3L, Seq(0.9f, 0.1f, 0f, 0f), "a"),
    (4L, null.asInstanceOf[Seq[Float]], "a"),   // null embedding
    (5L, Seq(0f, 0f, 1.0f, 0f), "b"))
    .toDF("vec_id", "embedding", "label")

  test("withNorm drops null and zero-norm vectors by default") {
    val v = Vectors.withNorm(edge, "embedding")
    val ids = v.select("vec_id").as[Long].collect().toSet
    assert(ids == Set(2L, 3L, 5L), s"degenerate vectors must drop: $ids")
    // raw pass-through keeps them for callers that handle them
    assert(Vectors.withNorm(edge, "embedding", dropDegenerate = false)
      .count() == 5)
  }

  test("cosine pipelines survive a corpus containing degenerate vectors") {
    val v = Vectors.withNorm(edge, "embedding")
    val a = v.select(col("vec_id").as("ia"), col("e").as("ea"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("ib"), col("e").as("eb"), col("nrm").as("nb"))
    // this exact shape threw DIVIDE_BY_ZERO with the zero vector present
    val cos = a.join(b, col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        Vectors.cosine(col("ea"), col("eb"), col("na"), col("nb")).as("cos"))
      .collect()
    assert(cos.length == 3, "3 valid pairs among the surviving vectors")
    assert(cos.forall(r => !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
    val best = cos.maxBy(_.getDouble(2))
    assert((best.getLong(0), best.getLong(1)) == ((2L, 3L)),
      "near-parallel vectors must rank top once degenerates are out")
  }
}
