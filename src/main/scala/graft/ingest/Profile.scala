package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** One-pass table profiling — the data-quality summary an ingest
  * operator reads before trusting a day's load (row counts, null
  * counts, cardinalities per column).
  *
  * Scale shape: ONE scan computes every column's null count and exact
  * distinct count in a single aggregate (Spark plans multi-distinct via
  * one Expand — the q8 treatment: the exact face pays Expand by design;
  * swap `countDistinct` for `approx_count_distinct` when profiling a
  * 100 TB table and cardinality may be off by the sketch error). The
  * single result row then unpivots via `stack` into one row per column
  * — no second scan, no per-column jobs like a naive profiler loop.
  */
object Profile {

  /** (column_name, n_rows, n_nulls, n_distinct) for each of `cols`. */
  def profile(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        (if (approx) approx_count_distinct(col(c), 0.02) else countDistinct(col(c)))
          .as(s"__dist_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols.map(c => s"'$c', __nulls_$c, __dist_$c").mkString(", ")
    one.select(
        expr(s"stack(${cols.length}, $stackArgs) AS (column_name, n_nulls, n_distinct)"),
        col("__n").as("n_rows"))
      .select(col("column_name"), col("n_rows"), col("n_nulls"), col("n_distinct"))
      .orderBy(col("column_name"))
  }

  /** Query face (`meta_profile`): exact profile of the orders table. */
  val ProfileCols: Seq[String] = Seq(
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority")

  def metaProfile(s: SparkSession, dir: String): DataFrame =
    profile(Tables(s, dir, "orders"), ProfileCols)

  /** Oracle generated from the same column list. */
  val profileOracle: String =
    ProfileCols.sorted.map { c =>
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  cast(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  cast(count(DISTINCT $c) AS BIGINT) AS n_distinct
         |FROM orders""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY column_name"
}
