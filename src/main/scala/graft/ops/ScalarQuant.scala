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
    // an EMPTY frame (a filtered-to-nothing partition) is a defined
    // input — no ranges, caller short-circuits; any NON-empty frame must
    // carry exactly the declared width
    require(stats.isEmpty || stats.length == dim,
      s"expected $dim dims, saw ${stats.length}")
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
    // materialize once + row-aware spread (round-15): the unit frame
    // feeds the range fit, the quantized index (twice — queries and the
    // scan side), and both rescore sides; each re-derived the scan+norm
    // serially before. min/max is order-independent, so the spread
    // cannot move a single output bit.
    val (unit, _) = Vectors.materializeSpread(v.select(col("vec_id"),
      transform(col("e"), x => x / col("nrm")).as("e")))
    val (lo, hi) = dimRanges(unit, dim)
    if (lo.isEmpty) // empty corpus: the documented empty result frame
      return unit.where(lit(false)).select(col("vec_id").as("query_id"),
        lit(1).as("rnk"), col("vec_id"), lit(0d).as("cosine"))
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

  /** C51 query face over the embeddings table. SQL-CHECKED since round
    * 11 — and unlike the k-means promotions, with NO learned-state
    * export: the SQ8 "training" is a per-dimension min/max, and min/max
    * of doubles is aggregation-ORDER-INDEPENDENT and exact, so the
    * whole face (range fit → byte quantize → dequantize → approximate
    * scan → margin cut → exact rescore → rank) replays in DuckDB from
    * the corpus alone. The one rounding site, `round(…, 0)` inside
    * quantize, is scale-0: both engines round the SAME double
    * half-away-from-zero on its exact value (the §4 trap is
    * scale>0 per-row rounding, where DuckDB's multiply-first
    * introduces fp error). ScalarQuantSpec still bounds reconstruction
    * error and recall@10 against the exact C6 face. Above-knee
    * posture: the ONE quantized-family rule (BASELINE round-15; see
    * [[IvfPq.simSearchIvfPq]]) — geometry-gated via the C87 audit, no
    * knee route (SQ8's margin-cut + exact rescore reads recall 1.00 on
    * every corpus measured, both geometries). */
  def simSearchSq8(s: SparkSession, dir: String): DataFrame =
    sq8TopK(Vectors.withNorm(Tables(s, dir, "embeddings"), "embedding")
      .select(col("vec_id"), col("e"), col("nrm")))

  /** C51 oracle: the full SQ8 pipeline replayed — per-dim ranges via
    * order-independent min/max, list_zip-threaded quantize/dequantize,
    * margin-40 approximate cut, exact rescore, rank. */
  val sq8Oracle: String =
    """WITH v0 AS (
      |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
      |  FROM embeddings),
      |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v0
      |      WHERE sqrt(list_dot_product(e, e)) > 0),
      |u AS (SELECT vec_id, list_transform(e, x -> x/nrm) AS e FROM n),
      |ex AS (SELECT vec_id, i, e[i] AS x
      |       FROM u, generate_series(1, 64) t(i)),
      |rngs AS (SELECT i, min(x) AS lo, max(x) AS hi FROM ex GROUP BY i),
      |rr AS (SELECT list(lo ORDER BY i) AS los, list(hi ORDER BY i) AS his
      |       FROM rngs),
      |qz AS (SELECT vec_id,
      |         list_transform(list_zip(e, los, his), s ->
      |           CASE WHEN s[3] = s[2] THEN 0
      |                ELSE greatest(0, least(255,
      |                  CAST(round((s[1] - s[2])
      |                    / (s[3] - s[2]) * 255) AS INT))) END) AS q
      |       FROM u, rr),
      |dq AS (SELECT vec_id,
      |         list_transform(list_zip(q, los, his), s ->
      |           s[2] + s[1]::DOUBLE / 255 * (s[3] - s[2])) AS d
      |       FROM qz, rr),
      |qs AS (SELECT vec_id AS query_id, d AS qd FROM dq WHERE vec_id < 5),
      |ap AS (SELECT qs.query_id, dq.vec_id,
      |              list_dot_product(qs.qd, dq.d) AS adot
      |       FROM dq, qs WHERE dq.vec_id <> qs.query_id),
      |cand AS (SELECT query_id, vec_id FROM (
      |           SELECT *, row_number() OVER (PARTITION BY query_id
      |             ORDER BY adot DESC, vec_id) AS crk FROM ap)
      |         WHERE crk <= 40),
      |rs AS (SELECT c.query_id, c.vec_id,
      |              round(list_dot_product(qu.e, cu.e), 4) AS cosine
      |       FROM cand c JOIN u qu ON qu.vec_id = c.query_id
      |                   JOIN u cu ON cu.vec_id = c.vec_id),
      |r AS (SELECT *, rank() OVER (PARTITION BY query_id
      |        ORDER BY cosine DESC, vec_id) AS rnk FROM rs)
      |SELECT query_id, rnk, vec_id, cosine FROM r WHERE rnk <= 10
      |ORDER BY query_id, rnk, vec_id""".stripMargin
}
