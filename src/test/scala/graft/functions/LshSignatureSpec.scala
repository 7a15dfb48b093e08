package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{Vectors, VectorQueries}

/** The fused LSH signature kernel vs the composed per-plane dot
  * spelling: bit-identical buckets (the FP-parity contract the
  * seeded-planes-inlined oracles rest on), interpreted == codegen,
  * and degenerate inputs defined. */
class LshSignatureSpec extends SparkSpec {
  import spark.implicits._

  private def composed(numTables: Int, bits: Int, dim: Int, seedBase: Long) =
    (0 until numTables).map { l =>
      struct(lit(l).as("tbl"),
        Vectors.lshBucket(col("e"), Vectors.hyperplanes(bits, dim, seedBase + l))
          .as("bucket"))
    }

  test("fused kernel buckets equal the composed per-plane spelling, row for row") {
    val v = Vectors.withNorm(
      graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
    for ((numTables, bits, seed) <- Seq((4, 6, 42L), (4, 7, 42L), (8, 2, 142L))) {
      val planes = (0 until numTables).flatMap(l =>
        Vectors.hyperplanes(bits, VectorQueries.EmbeddingDim, seed + l)).toArray
      val fused = v.select(col("vec_id"),
          posexplode(LshSignature(col("e"), planes, numTables, bits))
            .as(Seq("tbl", "bucket")))
        .as[(Long, Int, Long)].collect().sorted.toSeq
      val old = v.select(col("vec_id"),
          explode(array(composed(numTables, bits,
            VectorQueries.EmbeddingDim, seed): _*)).as("tb"))
        .select(col("vec_id"), col("tb.tbl"), col("tb.bucket"))
        .as[(Long, Int, Long)].collect().sorted.toSeq
      assert(fused == old, s"kernel diverges at (L=$numTables, b=$bits)")
    }
  }

  test("interpreted eval equals codegen (collect on a local frame exercises both paths)") {
    val planes = (0 until 4).flatMap(l =>
      Vectors.hyperplanes(6, 4, 42L + l)).toArray
    val rows = Seq(
      Seq(1.0, -2.0, 3.0, -4.0), Seq(0.0, 0.0, 0.0, 0.0),
      Seq(1e300, -1e300, 1e-300, 0.5)).toDF("e")
    val viaCol = rows.select(LshSignature(col("e"), planes, 4, 6).as("sig"))
      .as[Seq[Long]].collect().toSeq
    // interpreted: drive nullSafeEval directly through the case class
    val interp = rows.as[Seq[Double]].collect().toSeq.map { e =>
      val dim = 4
      val signs = new Array[Byte](dim * planes.length)
      for (i <- 0 until dim; p <- planes.indices)
        signs(i * planes.length + p) = if (planes(p)(i) > 0) 1 else -1
      val expr = LshSignature(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          e, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)), signs, 4, 6)
      expr.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
    }
    assert(viaCol == interp)
  }

  test("short and empty vectors band like the composed spelling (missing dims read 0)") {
    val planes = (0 until 2).flatMap(l =>
      Vectors.hyperplanes(3, 4, 7L + l)).toArray
    val rows = Seq(Seq.empty[Double], Seq(5.0), Seq(1.0, 2.0, 3.0, 4.0)).toDF("e")
    val got = rows.select(LshSignature(col("e"), planes, 2, 3).as("sig"))
      .as[Seq[Long]].collect()
    assert(got.length == 3)
    // empty vector: every dot is 0.0, no sign bit set, bucket 0 per table
    assert(got.head == Seq(0L, 0L))
  }
}
