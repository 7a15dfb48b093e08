package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scalar (int8) quantization ANN — the memory rung between the
  * full-precision brute force (C6) and product quantization (C38):
  * every dimension of the unit-normalized corpus is affinely mapped to
  * one byte using per-dimension [min, max] learned in a single
  * aggregate pass, cutting the resident index to 1/8 of the double
  * (1/4 of the float32) footprint while keeping per-dimension
  * resolution PQ gives up. FAISS's ScalarQuantizer(QT_8bit) is the
  * public shape.
  *
  * Scale design: the per-dimension range statistics partial-aggregate
  * to `dim` rows (map-side combined — the corpus shuffles nothing),
  * come back as one metadata-scale array literal, and both quantize and
  * dequantize are narrow codegen'd projections. Search scores the
  * DEQUANTIZED bytes against the broadcast query set in place — no
  * shuffle touches the corpus — then the top candidates alone pay the
  * exact full-precision rescore, so ranking errors from the byte grid
  * can only cost recall inside the candidate margin, never precision of
  * the reported cosine.
  */
object ScalarQuant {

  /** Per-dimension (lo, hi) of a unit-vector frame's `e` column. */
  def dimRanges(unit: DataFrame, dim: Int): (Seq[Double], Seq[Double]) = {
    val stats = unit.select(posexplode(col("e")).as(Seq("d", "x")))
      .groupBy(col("d")).agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .orderBy(col("d")).collect()
    require(stats.length == dim, s"expected $dim dims, saw ${stats.length}")
    (stats.map(_.getDouble(1)).toSeq, stats.map(_.getDouble(2)).toSeq)
  }

  /** x → round((x − lo) / (hi − lo) · 255), clamped to [0, 255]; a
    * degenerate dimension (hi == lo) maps to 0. */
  def quantize(e: Column, lo: Seq[Double], hi: Seq[Double]): Column = {
    val loC = array(lo.map(lit): _*)
    val hiC = array(hi.map(lit): _*)
    transform(e, (x, i) => {
      val l = element_at(loC, i + 1)
      val h = element_at(hiC, i + 1)
      when(h === l, lit(0))
        .otherwise(greatest(lit(0), least(lit(255),
          round((x - l) / (h - l) * 255).cast("int"))))
    })
  }

  /** The byte grid's midpoint reconstruction. */
  def dequantize(q: Column, lo: Seq[Double], hi: Seq[Double]): Column = {
    val loC = array(lo.map(lit): _*)
    val hiC = array(hi.map(lit): _*)
    transform(q, (v, i) => {
      val l = element_at(loC, i + 1)
      val h = element_at(hiC, i + 1)
      l + v.cast("double") / 255d * (h - l)
    })
  }

  /** Shared search over any (vec_id, e, nrm) frame: score the
    * dequantized index against the broadcast queries, keep `margin`
    * candidates per query, exact-rescore those. */
  def sq8TopK(v: DataFrame, k: Int = 10, margin: Int = 40,
              dim: Int = VectorQueries.EmbeddingDim): DataFrame = {
    val unit = v.select(col("vec_id"),
      transform(col("e"), x => x / col("nrm")).as("e"))
    val (lo, hi) = dimRanges(unit, dim)
    val index = unit.select(col("vec_id"),
      quantize(col("e"), lo, hi).as("q"))
    val queries = index.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"),
        dequantize(col("q"), lo, hi).as("qd"))
    val approx = index.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        graft.functions.VectorDot(col("qd"),
          dequantize(col("q"), lo, hi)).as("adot"))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("adot").desc, col("vec_id"))
    val cand = approx.withColumn("crk", row_number().over(wA))
      .where(col("crk") <= margin)
      .select(col("query_id"), col("vec_id"))
    // exact rescore on the full-precision vectors, candidates only
    val full = unit.select(col("vec_id"), col("e"))
    val rescored = cand
      .join(full.select(col("vec_id").as("query_id"), col("e").as("qe")), "query_id")
      .join(full, "vec_id")
      .select(col("query_id"), col("vec_id"),
        round(graft.functions.VectorDot(col("qe"), col("e")), 4).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    rescored.withColumn("rnk", rank().over(w))
      .where(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy(col("query_id"), col("rnk"), col("vec_id"))
  }

  /** C51 query face over the embeddings table. Rows-only: the byte grid
    * is engine-specific; ScalarQuantSpec bounds reconstruction error
    * and recall@10 against the exact C6 face. */
  def simSearchSq8(s: SparkSession, dir: String): DataFrame =
    sq8TopK(Vectors.withNorm(Tables(s, dir, "embeddings"), "embedding")
      .select(col("vec_id"), col("e"), col("nrm")))
}
