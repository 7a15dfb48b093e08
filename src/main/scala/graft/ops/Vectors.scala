package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-vector primitives (SURVEY §2.C C5–C7, C13).
  *
  * Vectors are `array<float>` columns cast to `array<double>` up front so
  * every engine (and the DuckDB oracle) accumulates in double precision in
  * array order — bit-stable dot products. All arithmetic is Catalyst
  * `aggregate`/`zip_with` higher-order functions: codegen'd, no UDFs.
  */
object Vectors {

  /** array<float> → array<double>. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product in array order (parity with the oracle): a native fused
    * expression (graft.functions.VectorDot, codegen'd single loop) —
    * same left-to-right double accumulation as the previous
    * `aggregate(zip_with(...))` spelling, minus its per-row intermediate
    * array. Inputs are assumed equal-length (embedding columns are). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorDot(a, b)

  /** L2 norm as sqrt(dot(v, v)) — the same expression shape the oracle
    * uses, so intermediate rounding is identical. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine from precomputed norms (precompute per row before a pair
    * join — never recompute norms per candidate pair). */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Corpus with `e` (double vector) and `nrm` columns added.
    * DEGENERATE vectors — null or zero-norm (a failed encoder's output,
    * absent from testdata but guaranteed in a real 100 TB corpus) — are
    * dropped by default: a zero norm makes every cosine a division by
    * zero, which under Spark 4's ANSI default THROWS and kills the
    * whole job (probed; VectorEdgeSpec pins the guard). They cannot
    * participate in any similarity operator anyway; pass
    * `dropDegenerate = false` for raw pass-through. */
  def withNorm(df: DataFrame, vecCol: String,
               dropDegenerate: Boolean = true): DataFrame = {
    val e = toDouble(col(vecCol))
    val framed = df.withColumn("e", e).withColumn("nrm", norm(col("e")))
    if (dropDegenerate) framed.where(col("nrm").isNotNull && col("nrm") > 0)
    else framed
  }

  /** Deterministic ±1 random-hyperplane set: `numPlanes` planes of `dim`
    * components, seeded — identical across sessions/executors, so LSH
    * signatures are reproducible (SURVEY §4 determinism rule). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Signature bucket id: bit j set iff dot(v, plane_j) > 0. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(dot(v, typedLit(p.toSeq)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((x, y) => x + y)
}
