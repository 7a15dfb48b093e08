package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The lake's analytics query surface (reference: Athena/Presto over the
  * cataloged storing zone — README.md step 7). Re-expressed as Catalyst
  * plans: dims broadcast, facts shuffle on join keys, filters/projections
  * push to the parquet scan.
  *
  * Oracle-parity rules (SURVEY §4): rounded double aggregates, no raw
  * timestamps in output, ties broken on unique ids.
  */
object LakeQueries {
  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)
  private def ts(lit0: String) = java.sql.Timestamp.valueOf(lit0 + " 00:00:00")

  /** A1: TPC-H Q1-style pricing summary — scan→filter→agg→sort. */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_shipdate") <= lit(ts("2000-01-01")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** A2: TPC-H Q6-style revenue forecast — pure pushdown filter + agg. */
  def q2RevenueFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit(ts("1996-01-01")) && col("l_shipdate") < lit(ts("1997-01-01"))
        && col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("cnt"))

  /** A3: TPC-H Q3-style shipping priority — 3-way join, group, top-10. */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
    val ord = t(s, dir, "orders").where(col("o_orderdate") < lit(ts("1997-01-01")))
    val li = t(s, dir, "lineitem").where(col("l_shipdate") > lit(ts("1997-01-01")))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** A4: TPC-H Q4-style order priority check — EXISTS via left-semi join. */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .where(col("o_orderdate") >= lit(ts("1996-01-01")) && col("o_orderdate") < lit(ts("1996-07-01")))
    val bigLines = t(s, dir, "lineitem").where(col("l_quantity") > 45)
    ord.join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** A5: TPC-H Q5-style local-supplier volume — 6-way join. Only the
    * fixed-cardinality dims (region: 5 rows, nation: 25 rows) carry a
    * broadcast hint; customer/supplier grow with scale factor, so their
    * joins shuffle on the key (AQE converts them to broadcast at runtime
    * when the actual size allows — never forced). */
  def q5RegionVolume(s: SparkSession, dir: String): DataFrame = {
    val region = t(s, dir, "region").where(col("r_name") === "ASIA")
    val nation = t(s, dir, "nation")
    val cust = t(s, dir, "customer")
    val supp = t(s, dir, "supplier")
    val ord = t(s, dir, "orders")
      .where(col("o_orderdate") >= lit(ts("1996-01-01")) && col("o_orderdate") < lit(ts("1997-01-01")))
    val li = t(s, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey")
        && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("n_name"))
  }

  /** A6: top-5 customers by order revenue per market segment — window rank
    * over an aggregate (rank on the *rounded* revenue for oracle parity). */
  def q6TopCustomers(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("rev"), count(lit(1)).as("n_orders"))
    val joined = rev.join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("rev").desc, col("c_custkey"))
    joined.withColumn("rnk", rank().over(w))
      .where(col("rnk") <= 5)
      .select(col("c_mktsegment"), col("rnk"), col("c_custkey"), col("rev"), col("n_orders"))
      .orderBy(col("c_mktsegment"), col("rnk"), col("c_custkey"))
  }

  /** A7: ROLLUP sales cube over returnflag×linestatus. */
  def q7RollupSales(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_extendedprice")), 2).as("sales"), count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("sales"), col("n"))
      .orderBy(col("flag"), col("status"))

  /** A8: exact distinct cardinalities per supplier. */
  def q8DistinctStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_orderkey")).as("orders_n"),
        count(lit(1)).as("lines"))
      .orderBy(col("l_suppkey"))

  /** A8-approx: the q8 distinct cardinalities as HyperLogLog++ sketches —
    * the 100 TB path. Exact per-group distinct (q8) plans an Expand (one
    * shuffled copy of lineitem PER distinct column); the sketch version
    * is one partial-aggregated pass, no Expand, mergeable across
    * executors. Rows-only oracle: sketch estimates are engine-specific. */
  def q8DistinctApprox(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("parts_approx"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("orders_approx"),
        count(lit(1)).as("lines"))
      .orderBy(col("l_suppkey"))

  /** A9: customers with no premium (>450k) orders — NOT EXISTS via
    * left-anti join. */
  def q9CustNoOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").where(col("o_totalprice") > 450000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** A10: inter-event gaps per user (lag window), aggregated per type.
    * Epoch seconds (integer) because events.ts is ns-precision: Spark
    * truncates parquet ns→µs while DuckDB keeps ns — whole seconds agree. */
  def q10EventGaps(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("user_id"),
        unix_timestamp(col("ts")).as("sec"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    e.withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .where(col("gap").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        round(avg(col("gap")), 2).as("avg_gap_s"),
        max(col("gap")).as("max_gap_s"))
      .orderBy(col("event_type"))
  }

  /** A12: TPC-H Q14-style promotion revenue — lineitem⋈part on partkey
    * with a ship-date window, revenue share per part type. part grows
    * with scale factor, so no broadcast hint: the join shuffles on
    * partkey and AQE upgrades to broadcast only when actually small. */
  def q12PromoRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit(ts("1996-01-01")) && col("l_shipdate") < lit(ts("1996-04-01")))
    val joined = li.join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"),
        count(lit(1)).as("lines"))
    // the global total runs over the post-agg set (≤ distinct p_type, fixed
    // ~150 cardinality) — safe at any scale, but the unpartitioned-window
    // spelling trips WindowExec's single-partition warning on every run.
    // Agg-to-scalar + cross join says the same thing silently: the 1-row
    // total broadcasts via AQE (no hint — the plan guardrail forbids
    // forced broadcasts here) and the join's exchange is reused.
    val total = joined.agg(sum(col("rev")).as("__total"))
    joined
      .crossJoin(total)
      .withColumn("pct", lit(100.0) * col("rev") / col("__total"))
      .select(col("p_type"), round(col("rev"), 2).as("revenue"), col("lines"),
        round(col("pct"), 4).as("pct"))
      .orderBy(col("p_type"))
  }

  /** A14: TPC-H Q15-style top supplier — revenue view + SCALAR-subquery
    * max. The 1-row max broadcasts (agg-to-scalar, the q12 treatment);
    * equality on the rounded revenue is parity-safe because both
    * engines round to the same nearest double. */
  def q14TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit(ts("1996-01-01")) &&
        col("l_shipdate") < lit(ts("1996-04-01")))
      .groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("total_rev"))
    val maxRev = rev.agg(max(col("total_rev")).as("__max"))
    rev.crossJoin(maxRev)
      .where(col("total_rev") === col("__max"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  /** A15: TPC-H Q16-style supplier counts per part type with a NOT-IN
    * exclusion (blacklisted suppliers) — anti-join, then distinct
    * suppliers through the lineitem relation. */
  def q15PartSupplierCounts(s: SparkSession, dir: String): DataFrame = {
    val blacklist = t(s, dir, "supplier")
      .where(col("s_suppkey") % 13 === 0).select(col("s_suppkey"))
    val rel = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(blacklist), col("l_suppkey") === col("s_suppkey"), "left_anti")
    rel.join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"),
        countDistinct(col("l_partkey")).as("part_cnt"))
      .orderBy(col("p_type"))
  }

  /** A16: TPC-H Q18-style large orders — IN-subquery via the aggregated
    * quantity (HAVING), top-10 by quantity. */
  def q16LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"))
      .where(col("qty") > 250)
    big.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        round(col("o_totalprice"), 2).as("totalprice"), col("qty"))
      .orderBy(col("qty").desc, col("o_orderkey"))
      .limit(10)
  }

  /** A17: ordered conversion funnel — per user the first view, the
    * first click AFTER that view, the first purchase AFTER that click;
    * reported as per-stage user counts and median-free gap averages.
    * One pass: conditional aggregation per user (three min-over-filter
    * aggregates chained through conditional re-aggregation — no joins,
    * one shuffle on user_id). */
  def q17Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("sec"))
    // stage 1: first view per user
    val v = ev.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("sec")).as("v_sec"))
    // stage 2: first click after the first view. The per-user stage
    // marks GROW with the user population, so no broadcast hint — the
    // joins shuffle on user_id (reusing the aggregates' partitioning)
    // and AQE upgrades to broadcast when the actual size allows
    val c = ev.where(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .where(col("sec") > col("v_sec"))
      .groupBy(col("user_id")).agg(min(col("sec")).as("c_sec"), min(col("v_sec")).as("v_sec"))
    val p = ev.where(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .where(col("sec") > col("c_sec"))
      .groupBy(col("user_id")).agg(min(col("sec")).as("p_sec"),
        min(col("c_sec")).as("c_sec"), min(col("v_sec")).as("v_sec"))
    val viewed = v.agg(count(lit(1)).as("n")).select(lit("1_viewed").as("stage"), col("n"),
      lit(null).cast("double").as("avg_gap_s"))
    val clicked = c.agg(count(lit(1)).as("n"),
        round(avg(col("c_sec") - col("v_sec")), 2).as("avg_gap_s"))
      .select(lit("2_clicked").as("stage"), col("n"), col("avg_gap_s"))
    val purchased = p.agg(count(lit(1)).as("n"),
        round(avg(col("p_sec") - col("c_sec")), 2).as("avg_gap_s"))
      .select(lit("3_purchased").as("stage"), col("n"), col("avg_gap_s"))
    viewed.unionByName(clicked).unionByName(purchased).orderBy(col("stage"))
  }

  /** A18: revenue deciles — per-customer revenue bucketed by the nine
    * exact decile CUTPOINTS. `ntile` would demand one global-window
    * task over every customer (the single-partition smell this repo
    * bans). NOTE the exact face's own limit: Spark's exact `percentile`
    * is a global aggregate whose final task buffers EVERY per-customer
    * revenue — fine at per-customer cardinality here, but at extreme
    * scale the 100 TB spelling is [[q18RevenueDecilesApprox]] (GK
    * sketch, bounded memory, same downstream plan). Bucket assignment
    * is a narrow projection against the broadcast 1-row cut array.
    * Cuts round to 4dp so the comparisons are bit-identical across
    * engines. */
  def q18RevenueDeciles(s: SparkSession, dir: String): DataFrame =
    decilesFromCuts(custRevenue(s, dir),
      "transform(percentile(rev, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))," +
        " c -> round(c, 4))")

  /** A18a: the approx face of [[q18RevenueDeciles]] — cutpoints from
    * `percentile_approx` (Greenwald-Khanna sketch, accuracy 1/1e4):
    * mergeable partial sketches, bounded aggregate memory at any
    * cardinality. Same A8/A8a and C19/C19a exact/approx pattern:
    * rows-only CORRECTNESS entry; PercentileSpec bounds per-decile
    * population divergence vs the exact face. */
  def q18RevenueDecilesApprox(s: SparkSession, dir: String): DataFrame =
    decilesFromCuts(custRevenue(s, dir),
      "transform(percentile_approx(rev, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D), 10000)," +
        " c -> round(c, 4))")

  private def custRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("rev"))

  private def decilesFromCuts(rev: DataFrame, cutExpr: String): DataFrame = {
    val cuts = rev.agg(expr(cutExpr).as("cuts"))
    val decile = (1 to 9).map(i =>
      when(col("rev") > element_at(col("cuts"), i), 1).otherwise(0))
      .foldLeft(lit(1): org.apache.spark.sql.Column)(_ + _)
    rev.crossJoin(cuts)
      .withColumn("decile", decile)
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("customers"),
        round(sum(col("rev")), 2).as("revenue"),
        round(min(col("rev")), 2).as("floor_rev"))
      .orderBy(col("decile"))
  }

  /** A19: cohort retention — users grouped by first-seen week, counted
    * by how many distinct later weeks they return. Two aggregations,
    * both user-keyed (the cohort mark joins back on user_id — same
    * partitioning, no extra shuffle class); output is the small
    * cohort × weeks-retained matrix. */
  def q19Retention(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), weekofyear(col("ts")).as("wk"))
    val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    ev.join(first, Seq("user_id"))
      .groupBy(col("user_id"), col("cohort_wk"))
      .agg(countDistinct(when(col("wk") > col("cohort_wk"), col("wk"))).as("later_wks"))
      .groupBy(col("cohort_wk"), col("later_wks"))
      .agg(count(lit(1)).as("users"))
      .orderBy(col("cohort_wk"), col("later_wks"))
  }

  /** A21: TPC-H Q21-shape waiting suppliers — for finished orders with
    * multiple suppliers, the one supplier whose line shipped late while
    * every co-supplier shipped on time. The correlated EXISTS / NOT
    * EXISTS become a LEFT SEMI then LEFT ANTI self-join of the
    * late-annotated lineitem on l_orderkey: all three frames hash the
    * same key, so the self-joins reuse one shuffle class and nothing is
    * cartesian (PlanSpec pins both join types). Adapted to this lake's
    * schema: lineitem carries no receipt/commit dates, so "late" =
    * l_shipdate > o_orderdate + 60 days. */
  def q21WaitingSupplier(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders").where(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val l = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .withColumn("is_late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey"), col("is_late"))
    val others = l.select(col("l_orderkey").as("o2_orderkey"),
      col("l_suppkey").as("o2_suppkey"), col("is_late").as("o2_late"))
    val waiting = l.where(col("is_late"))
      .join(others, col("l_orderkey") === col("o2_orderkey") &&
        col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
      .join(others.where(col("o2_late")),
        col("l_orderkey") === col("o2_orderkey") &&
          col("l_suppkey") =!= col("o2_suppkey"), "left_anti")
    waiting
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("s_name"), col("n_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** A22: TPC-H Q20-shape dominant suppliers — suppliers who shipped
    * MORE THAN HALF of some ECONOMY part's 1996 volume (the reference
    * schema has no partsupp/availqty, so Q20's correlated "availability
    * vs 50% of shipped quantity" becomes share-of-part-volume — same
    * plan skeleton). Shape: dim-filtered semi-join prunes the fact scan
    * (part is broadcast), ONE (part, supplier) aggregate, the per-part
    * total as a WINDOW over that partial — the per-part frame is the
    * handful of suppliers on one part, and the single pipeline avoids
    * the re-aggregate+join spelling that duplicated the whole pruned
    * scan subtree (measured: 4 parquet scans vs 3, the exchange pair
    * never unified under AQE) — then the correlated comparison is a
    * narrow filter and the supplier rollup ends the plan. */
  def q22DominantSupplier(s: SparkSession, dir: String): DataFrame = {
    val parts = t(s, dir, "part").where(col("p_type") === "ECONOMY")
      .select(col("p_partkey"))
    val perSupp = t(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit(ts("1996-01-01")) &&
        col("l_shipdate") < lit(ts("1997-01-01")))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("q"))
    perSupp
      .withColumn("tq", sum(col("q")).over(Window.partitionBy(col("l_partkey"))))
      .where(col("q") > col("tq") * 0.5)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("parts_dominated"),
        round(sum(col("q")), 2).as("qty_dominated"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("parts_dominated"), col("qty_dominated"))
      .orderBy(col("s_suppkey"))
  }

  /** A23: TPC-H Q17-shape small-order revenue — lineitems whose quantity
    * falls below 20% of THEIR part's average (the correlated scalar
    * subquery shape), rolled up per brand. The correlated average is a
    * window over the part key on the already-joined frame — one
    * lineitem scan, one shuffle class; the subquery-as-join spelling
    * would duplicate the pruned scan subtree (the q22 lesson). Small
    * parts only (p_size <= 5, broadcast dim). */
  def q23SmallOrderRevenue(s: SparkSession, dir: String): DataFrame = {
    val parts = t(s, dir, "part").where(col("p_size") <= 5)
      .select(col("p_partkey"), col("p_brand"))
    t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .withColumn("avg_q",
        avg(col("l_quantity")).over(Window.partitionBy(col("l_partkey"))))
      .where(col("l_quantity") < col("avg_q") * 0.2)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("small_lines"),
        round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
      .orderBy(col("p_brand"))
  }

  /** A20: TPC-H Q22-style prospects — customers with above-average
    * balance (scalar subquery in the FILTER) and no RECENT orders
    * (anti-join against the date-filtered orders scan — Q22's lapsed-
    * customer semantics), rolled up per nation. The date filter lives
    * on the orders side of the anti-join, so it pushes to the scan;
    * every customer in this corpus has SOME order, which made the
    * no-orders-ever spelling structurally empty (a vacuous gate). */
  def q20Prospects(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val avgBal = cust.where(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("__avg"))
    cust.crossJoin(avgBal)
      .where(col("c_acctbal") > col("__avg"))
      .join(t(s, dir, "orders")
          .where(col("o_orderdate") >= lit("2000-01-01").cast("date"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  /** A13: PIVOT — daily event counts with one column per event type.
    * The value list is EXPLICIT, so Spark pivots in a single
    * partial-aggregating pass (an unlisted-values pivot first runs a
    * distinct job to discover columns — never do that at 100 TB; the
    * column set is a schema decision, not data). */
  def q13EventPivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    t(s, dir, "events")
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("value"))
      .groupBy(col("day"))
      .pivot("event_type", types)
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      // absent (day, type) cells pivot to NULL — zero-fill explicitly so
      // the oracle's conditional aggregates can say the same thing
      .select(col("day") +: types.flatMap(ty => Seq(
        coalesce(col(s"${ty}_n"), lit(0L)).as(s"${ty}_n"),
        round(coalesce(col(s"${ty}_v"), lit(0.0)), 2).as(s"${ty}_v"))): _*)
      .orderBy(col("day"))
  }

  /** A25: trailing-window revenue — daily totals with a 7-day RANGE
    * frame (sum + avg), the moving-average dashboard query. Scale note:
    * the window is global-ordered but runs over the PRE-AGGREGATED
    * daily frame, whose cardinality is calendar-bounded (a few thousand
    * rows at any corpus size) — the fact table never meets the window;
    * its only shuffle is the daily groupBy. RANGE (not ROWS) so missing
    * calendar days shorten the frame identically on both engines.
    * Money is integer CENTS end to end (floor(x*100+0.5) + BIGINT sums,
    * floor division for the average): per-row `round` of a divided
    * double flipped a cent at a .005 boundary between engines (caught
    * by the cross-SF gate at sf0.001 — SURVEY §4). */
  def q24TrailingRevenue(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("rev_c"),
        count(lit(1)).as("orders"))
    val w = Window.orderBy(datediff(col("day"), lit("1970-01-01")))
      .rangeBetween(-6, 0)
    daily
      .withColumn("rev7_c", sum(col("rev_c")).over(w))
      .withColumn("days_in_frame", count(lit(1)).over(w))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("orders"), col("rev_c").as("revenue_cents"),
        col("rev7_c").as("revenue_7d_cents"),
        expr("rev7_c div days_in_frame").as("avg_daily_7d_cents"))
      .orderBy(col("day"))
  }

  /** A26: CUBE revenue — every (nation, order-year) subtotal plus both
    * marginals and the grand total in ONE pass (Spark's Expand feeds
    * the same shuffle class as the plain aggregate; 4× the rows of the
    * base group-by, not 4 scans). Labels coalesce to 'ALL' instead of
    * exposing grouping bits — engine-portable and what a report reads.
    * Money in integer cents (§4). */
  def q25CubeRevenue(s: SparkSession, dir: String): DataFrame = {
    val joined = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), year(col("o_orderdate")).as("yr"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    joined
      .cube(col("n_name"), col("yr"))
      .agg(count(lit(1)).as("orders"), sum(col("cents")).as("revenue_cents"))
      .select(coalesce(col("n_name"), lit("ALL")).as("nation"),
        coalesce(col("yr").cast("string"), lit("ALL")).as("order_year"),
        col("orders"), col("revenue_cents"))
      .orderBy(col("nation"), col("order_year"))
  }

  /** A38: mixed-granularity GROUPING SETS — the one grouping shape
    * CUBE (A26) and ROLLUP (A7) can't express: two DIFFERENT report
    * granularities, (nation × year) and (region × year), computed in
    * ONE Expand pass over one scan of the joined frame — the
    * dashboard-refresh trick that halves the nightly report job. The
    * level tag comes from which dim column survived the set (the
    * GROUPING() idiom spelled as nullability — names never collide
    * across levels because the tag disambiguates). Integer cents. */
  def q37GroupingSets(s: SparkSession, dir: String): DataFrame = {
    val joined = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name"), col("r_name"), year(col("o_orderdate")).as("yr"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    joined
      .groupingSets(
        Seq(Seq(col("n_name"), col("yr")), Seq(col("r_name"), col("yr"))),
        col("n_name"), col("r_name"), col("yr"))
      .agg(count(lit(1)).as("orders"), sum(col("cents")).as("revenue_cents"))
      .select(
        when(col("n_name").isNotNull, lit("nation")).otherwise(lit("region"))
          .as("level"),
        coalesce(col("n_name"), col("r_name")).as("name"),
        col("yr"), col("orders"), col("revenue_cents"))
      .orderBy(col("level"), col("name"), col("yr"))
  }

  /** A27: TPC-H Q19 shape — revenue through a DISJUNCTION of
    * (brand, size-range, quantity-range) predicate groups over the
    * part⋈lineitem join, reported per branch. The optimizer test this
    * query exists for: Catalyst must extract each side's common
    * disjunct (`p_brand IN … ∨ size bounds` to the part scan,
    * the union of quantity ranges to the lineitem scan) so both
    * parquet scans carry PushedFilters and the join sees only
    * candidate rows — a plan where either scan reads its full table
    * fails the A27 plan spec. Branches are brand-disjoint by
    * construction, so the bucket CASE is total and unambiguous.
    * Money in integer cents (§4). */
  def q26DisjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    val b1 = col("p_brand") === "Brand#1" &&
      col("p_size").between(1, 15) && col("l_quantity").between(1, 11)
    val b2 = col("p_brand") === "Brand#2" &&
      col("p_size").between(10, 30) && col("l_quantity").between(10, 20)
    val b3 = col("p_brand") === "Brand#3" &&
      col("p_size").between(20, 50) && col("l_quantity").between(20, 30)
    t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("p_partkey") === col("l_partkey"))
      .where(b1 || b2 || b3)
      .select(when(b1, "B1").when(b2, "B2").otherwise("B3").as("bucket"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long").as("cents"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("line_items"), sum(col("cents")).as("revenue_cents"))
      .orderBy(col("bucket"))
  }

  /** A28: TPC-H Q7 shape — cross-border trade volume per directed
    * (supplier nation → customer nation) pair and year. The shape this
    * row exists for: ONE dimension (nation, fixed 25 rows) joins the
    * fact chain in TWO ROLES — once through the supplier side, once
    * through the customer side — so it broadcasts twice under
    * different aliases and the cross-border predicate compares the two
    * roles (`sn.name <> cn.name`). No nation-name literals: at tiny SF
    * a named pair is empty (10 suppliers span 10 arbitrary nations),
    * and the full directed-pair matrix is what a trade report reads
    * anyway. Money in integer cents (§4). */
  def q27TradeVolume(s: SparkSession, dir: String): DataFrame = {
    val sn = t(s, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val cn = t(s, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
      .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
      .where(col("supp_nation") =!= col("cust_nation"))
      .select(col("supp_nation"), col("cust_nation"),
        year(col("o_orderdate")).as("yr"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long").as("cents"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("yr"))
      .agg(count(lit(1)).as("line_items"), sum(col("cents")).as("revenue_cents"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("yr"))
  }

  /** A29: TPC-H Q8 shape — market share per (customer region, year,
    * supplier nation) for one part type. The Q8 skeleton: the part
    * filter prunes the fact scan FIRST (broadcast semi-join, the q22
    * lesson), the fact chain runs through customer→nation→region on
    * the demand side and supplier→nation on the supply side (nation in
    * two roles again, both broadcast), ONE aggregate builds the
    * (region, yr, nation) volume frame, and the share-of-market is a
    * window over that already-tiny frame — never a re-aggregate+join
    * that would duplicate the fact subtree. No nation/region literals
    * (the q27 lesson: named slices are empty at tiny SF); the full
    * share matrix is the report a trade desk reads anyway. Money in
    * integer cents, share in integer basis points via integer
    * division (§4: both engines truncate identically on positive
    * longs). */
  def q28MarketShare(s: SparkSession, dir: String): DataFrame = {
    val parts = t(s, dir, "part").where(col("p_type") === "ECONOMY")
      .select(col("p_partkey"))
    val cn = t(s, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
    val sn = t(s, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val region = t(s, dir, "region")
      .select(col("r_regionkey"), col("r_name").as("region"))
    val vol = t(s, dir, "lineitem")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"), "left_semi")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
      .select(col("region"), year(col("o_orderdate")).as("yr"), col("supp_nation"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long").as("cents"))
      .groupBy(col("region"), col("yr"), col("supp_nation"))
      .agg(sum(col("cents")).as("volume_cents"),
        count(lit(1)).as("line_items"))
    vol
      .withColumn("mkt",
        sum(col("volume_cents")).over(Window.partitionBy(col("region"), col("yr"))))
      .select(col("region"), col("yr"), col("supp_nation"), col("volume_cents"),
        expr("(volume_cents * 10000) div mkt").as("share_bp"),
        col("line_items"))
      .orderBy(col("region"), col("yr"), col("supp_nation"))
  }

  /** A30: TPC-H Q9 shape — product profit per (supplier nation, year)
    * for a part-name family. Q9's profit arithmetic combines TWO
    * money terms per lineitem (revenue minus cost); the reference
    * schema has no partsupp/supplycost, so the cost basis is
    * `p_retailprice * l_quantity` — same multi-fact arithmetic, same
    * plan skeleton. The LIKE filter can't push as an equality, but it
    * prunes part BEFORE the fact join (the filtered (key, retailprice)
    * projection broadcasts — q22's prune, but inner because the cost
    * term needs the price), so the fact chain only carries matching
    * lineitems. Both money terms round to integer cents
    * SEPARATELY before the subtraction (§4: identical double→cents
    * rounding in both engines, then pure long arithmetic). */
  def q29ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val parts = t(s, dir, "part").where(col("p_name").like("%widget%"))
      .select(col("p_partkey"), col("p_retailprice"))
    t(s, dir, "lineitem")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), year(col("o_orderdate")).as("yr"),
        (floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long") -
         floor(col("p_retailprice") * col("l_quantity") * 100 + 0.5)
          .cast("long")).as("profit"))
      .groupBy(col("nation"), col("yr"))
      .agg(count(lit(1)).as("line_items"), sum(col("profit")).as("profit_cents"))
      .orderBy(col("nation"), col("yr"))
  }

  /** A31: TPC-H Q10 shape — returned-item revenue report: the top-20
    * customers by revenue lost to returns in one half-year window. The
    * Q10 skeleton: BOTH fact-side filters push to their parquet scans
    * (l_returnflag to lineitem, the date range to orders) so the join
    * carries only the return slice; customer joins on the shuffled key
    * (grows with SF — never forced broadcast, the A5 rule), nation
    * broadcasts (fixed dim). Top-20 is orderBy+limit over the
    * aggregated (customer-sized) frame — Spark plans it as
    * TakeOrderedAndProject, never a global sort of the fact table.
    * Money in integer cents; revenue-desc ties break by custkey (§4
    * determinism rule for top-N). */
  def q30ReturnedRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").where(col("l_returnflag") === "R")
    val ord = t(s, dir, "orders")
      .where(col("o_orderdate") >= lit(ts("1996-01-01")) &&
        col("o_orderdate") < lit(ts("1996-07-01")))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name").as("nation"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long").as("cents"))
      .groupBy(col("c_custkey"), col("c_name"), col("nation"))
      .agg(sum(col("cents")).as("revenue_cents"),
        count(lit(1)).as("line_items"))
      .orderBy(col("revenue_cents").desc, col("c_custkey"))
      .limit(20)
  }

  /** A32: TPC-H Q13 shape — customer order-count distribution with an
    * exclusion predicate (how many customers placed 0, 1, 2, … orders,
    * not counting URGENT ones). The Q13 point is the LEFT join that
    * keeps zero-order customers; the scale-smart spelling aggregates
    * orders per custkey FIRST (partial-agg absorbs the fact rows;
    * only one row per active customer shuffles) and left-joins that
    * tiny frame to the customer key list — never the raw fact table.
    * Missing matches coalesce to the 0 bucket. The final histogram
    * groupBy is on the (order-count)-sized key space. */
  def q31CustDistribution(s: SparkSession, dir: String): DataFrame = {
    val perCust = t(s, dir, "orders")
      .where(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    t(s, dir, "customer").select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n"), lit(0L)).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** A33: TPC-H Q11 shape — value concentration: parts whose revenue
    * exceeds 1.3× the MEAN per-part share of the global total
    * (measured: per-part revenue in this corpus is near-uniform — the
    * max share is ~1.8× the mean at every SF — so 1.3× keeps the top
    * ~1–8% and the row set is non-empty at sf0.001/0.01/0.1). Q11's
    * skeleton is an aggregate gated by a HAVING against a scalar
    * subquery over the SAME aggregate; spelled scale-free (threshold
    * relative to the mean share, not Q11's SF-tuned FRACTION
    * constant) so the row set is non-empty at every SF. Two
    * aggregates over ONE fact scan: the per-part rollup shuffles on
    * l_partkey; the global total is a second agg over the already
    * part-sized frame and comes back as a single broadcast row — the
    * fact table is never re-scanned for the denominator. The
    * threshold compare stays in pure long multiplication
    * (value×np×10 > 13×total — §4: no double division on a comparison
    * path), and the reported share is integer basis points. */
  def q32ValueShare(s: SparkSession, dir: String): DataFrame = {
    val value = t(s, dir, "lineitem")
      .select(col("l_partkey"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
          .cast("long").as("cents"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("cents")).as("value_cents"), count(lit(1)).as("line_items"))
    val total = value.agg(sum(col("value_cents")).as("__total"),
      count(lit(1)).as("__np"))
    value.crossJoin(broadcast(total))
      .where(col("value_cents") * col("__np") * 10 > col("__total") * 13)
      .select(col("l_partkey").as("partkey"), col("value_cents"),
        col("line_items"),
        expr("(value_cents * 10000) div __total").as("share_bp"))
      .orderBy(col("value_cents").desc, col("partkey"))
  }

  /** A34: TPC-H Q2 shape — the cheapest supplier per part. The
    * reference schema has no partsupp, so the part×supplier offer
    * book is derived from lineitem itself: min unit price
    * (extendedprice/quantity, rounded to integer cents BEFORE the
    * min — §4) per (l_partkey, l_suppkey). Q2's correlated MIN
    * subquery becomes a min-window over the offer frame — the
    * scale-smart spelling: the fact scan collapses to a
    * part×supplier-sized frame in its partial agg, the window
    * re-shuffles only that small frame on l_partkey, and no second
    * scan or self-join of lineitem ever runs. Supplier joins on the
    * shuffled key; nation broadcasts; part carries the brand label.
    * Top-100 by cost is TakeOrderedAndProject over the offer-sized
    * frame with a total tie-break (cost, partkey, s_name). */
  def q33MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val offers = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        floor(col("l_extendedprice") / col("l_quantity") * 100 + 0.5)
          .cast("long").as("unit_cents"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("unit_cents")).as("cost_cents"))
    offers
      .withColumn("best",
        min(col("cost_cents")).over(Window.partitionBy(col("l_partkey"))))
      .where(col("cost_cents") === col("best"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey").as("partkey"), col("p_brand"),
        col("s_name"), col("n_name").as("nation"), col("cost_cents"))
      .orderBy(col("cost_cents").desc, col("partkey"), col("s_name"))
      .limit(100)
  }

  /** A35: user-acquisition curve — per day, the count of users seen for
    * the FIRST time and the running total (the growth chart every
    * product dashboard opens with). Two tiny aggregates: first-seen day
    * per user (shuffles one row per user), then per-day counts with a
    * cumulative window over the days-sized frame — the unpartitioned
    * window is safe BY CONSTRUCTION (≤ a few thousand day rows
    * regardless of corpus size; the q12 precedent). Integer epoch-day
    * per the §4 ns-precision rule. */
  def q34NewUsers(s: SparkSession, dir: String): DataFrame = {
    val firstDay = t(s, dir, "events")
      .select(col("user_id"),
        expr("unix_timestamp(ts) div 86400").as("day"))
      .groupBy(col("user_id")).agg(min(col("day")).as("day"))
    val daily = firstDay.groupBy(col("day"))
      .agg(count(lit(1)).as("new_users"))
    daily.withColumn("cum_users",
        sum(col("new_users")).over(Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("day"))
  }

  /** A36: batch sessionization — the 30-minute-gap session model every
    * product-analytics stack runs (the batch face of the streaming
    * sessionizer, [[graft.streaming.Sessionize]]). Plan: ONE shuffle on
    * user_id feeds both windows (the new-session flag and the running
    * session ordinal over the same frame) AND the per-session rollup —
    * (user_id, sess) is a refinement of the window's partitioning, so
    * the fact never exchanges twice; the day-level card then aggregates
    * the session-sized frame. All-integer arithmetic (epoch seconds /
    * epoch days), ties broken on event_id per §4. */
  def q35Sessions(s: SparkSession, dir: String): DataFrame = {
    val gapS = 1800L
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    val flagged = e
      .withColumn("new_sess",
        when(coalesce(col("sec") - lag(col("sec"), 1).over(w) > gapS,
          lit(true)), 1L).otherwise(0L))
      .withColumn("sess", sum(col("new_sess")).over(w))
    val sessions = flagged.groupBy(col("user_id"), col("sess"))
      .agg(min(col("sec")).as("start_sec"), max(col("sec")).as("end_sec"),
        count(lit(1)).as("n_events"))
    sessions.groupBy(expr("start_sec div 86400").as("day"))
      .agg(count(lit(1)).as("sessions"),
        sum(col("n_events")).as("events"),
        sum(col("end_sec") - col("start_sec")).as("total_duration_s"),
        max(col("n_events")).as("max_events"))
      .orderBy(col("day"))
  }

  /** A37: TPC-H Q12 shape — late shipments split by order priority: the
    * lineitem⋈orders equi-join (the canonical orderkey co-partition;
    * both scans project only their join/filter columns), a cross-table
    * lateness predicate (ship more than a year after order — it needs
    * both sides, so it runs AT the join, everything else pushes below),
    * and Q12's CASE-sum split of urgent-class vs other-class line
    * counts per ship year. All-integer output. */
  def q36LateShipments(s: SparkSession, dir: String): DataFrame = {
    val urgent = Seq("1-URGENT", "2-HIGH")
    val l = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"),
        unix_timestamp(col("l_shipdate")).as("ship_sec"))
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        unix_timestamp(col("o_orderdate")).as("ord_sec"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .where(col("ship_sec") - col("ord_sec") > lit(365L * 86400L))
      .groupBy(year(col("l_shipdate")).as("ship_year"))
      .agg(
        sum(when(col("o_orderpriority").isin(urgent: _*), 1L).otherwise(0L))
          .as("urgent_lines"),
        sum(when(col("o_orderpriority").isin(urgent: _*), 0L).otherwise(1L))
          .as("other_lines"))
      .orderBy(col("ship_year"))
  }

  /** A24: mergeable distinct sketches — the incremental uniques rollup a
    * lake keeps so "uniques over any window" never rescans history. The
    * nightly job builds ONE DataSketches HLL sketch per (day, type)
    * (`hll_sketch_agg`, a mergeable binary aggregate); any coarser
    * window — here weekly per type, and the grand total — is
    * `hll_union_agg` over the stored daily sketches: merging reads
    * sketch bytes, not events, so a year-to-date uniques query costs
    * 365 sketch rows per type instead of a year of fact scan. Rows-only
    * (sketch binaries and estimates are engine-specific); SketchSpec
    * bounds the estimates against exact distincts. */
  def sketchUniquesRollup(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        count(lit(1)).as("events"))
    daily
      .groupBy(weekofyear(col("day")).as("wk"), col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_uniques"),
        sum(col("events")).as("events"),
        count(lit(1)).as("days_merged"))
      .orderBy(col("wk"), col("event_type"))
  }

  /** A11 engine-native face: the same extraction via `from_json` with an
    * explicit schema — the spelling a Spark-first user writes (one
    * codegen'd JsonToStructs projection, schema pushed instead of a
    * regex). The regexp face below stays the oracle-checked entry only
    * because the DuckDB oracle carries no JSON extension;
    * LakeQueriesSpec proves the two faces row-equal on testdata. */
  def q11JsonPropsNative(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"), col("value"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
        round(avg(col("k")), 4).as("k_avg"),
        round(sum(col("value")), 2).as("value_sum"))
      .orderBy(col("event_type"))

  /** A39: value-anomaly card per event type — the reference's IRREGULAR
    * classification (DATALAKE_TRANSFORMATION_S3_DAILY_JOB.PY:102–107)
    * generalized from "row shape is wrong" to "row VALUE is wrong": an
    * event is anomalous when its value clears the Tukey outer fence
    * q75 + 3·IQR of its own type's distribution. The monitoring card a
    * lake emits per ingest day so a mis-scaled feed (cents-vs-dollars,
    * a stuck sensor) is caught at the zone boundary, not by a consumer.
    *
    * Parity (SURVEY §4): exact `percentile` at 0.25/0.75 — quarter
    * fractions interpolate between order statistics with exact dyadic
    * weights, so Spark and DuckDB's quantile_cont produce identical
    * doubles (the C66 precedent), and the fence compare is ulp-safe.
    * Plan: one per-type exact-percentile aggregate (type-count-sized),
    * broadcast back over one events scan for the flag count. At 100 TB
    * the same card swaps in the mergeable `percentile_approx` sketch
    * (the A18/A18a pattern — exact face kept as the oracle gate). */
  def q38EventAnomaly(s: SparkSession, dir: String): DataFrame = {
    val q = t(s, dir, "events").groupBy(col("event_type"))
      .agg(count(lit(1)).as("events"),
        percentile(col("value"), lit(0.25)).as("q25"),
        percentile(col("value"), lit(0.75)).as("q75"))
      .withColumn("fence", col("q75") + (col("q75") - col("q25")) * 3)
    t(s, dir, "events").select(col("event_type"), col("value"))
      .join(broadcast(q), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(first(col("events")).as("events"),
        round(first(col("q25")), 4).as("q25"),
        round(first(col("q75")), 4).as("q75"),
        round(first(col("fence")), 4).as("fence"),
        sum(when(col("value") > col("fence"), 1L).otherwise(0L)).as("anomalies"))
      .select(col("event_type"), col("events"), col("q25"), col("q75"),
        col("fence"), col("anomalies"),
        expr("anomalies * 10000 div events").as("anomaly_bp"))
      .orderBy(col("event_type"))
  }

  /** A39a: the 100 TB face of [[q38EventAnomaly]] — identical card
    * shape with the quartiles from the mergeable GK sketch
    * (`percentile_approx`, map-side combined, bounded aggregate memory
    * per type regardless of group size) instead of the exact sort-based
    * `percentile` that buffers every value of a type in one task. The
    * A8/A8a treatment applied to the anomaly fence: exact face = the
    * oracle gate, approx face = what actually runs at scale. Rows-only;
    * AnomalyApproxSpec bounds the fence divergence and the flagged-count
    * drift against the exact face. */
  def q38EventAnomalyApprox(s: SparkSession, dir: String): DataFrame = {
    val q = t(s, dir, "events").groupBy(col("event_type"))
      .agg(count(lit(1)).as("events"),
        percentile_approx(col("value"), lit(0.25), lit(10000)).as("q25"),
        percentile_approx(col("value"), lit(0.75), lit(10000)).as("q75"))
      .withColumn("fence", col("q75") + (col("q75") - col("q25")) * 3)
    t(s, dir, "events").select(col("event_type"), col("value"))
      .join(broadcast(q), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(first(col("events")).as("events"),
        round(first(col("q25")), 4).as("q25"),
        round(first(col("q75")), 4).as("q75"),
        round(first(col("fence")), 4).as("fence"),
        sum(when(col("value") > col("fence"), 1L).otherwise(0L)).as("anomalies"))
      .select(col("event_type"), col("events"), col("q25"), col("q75"),
        col("fence"), col("anomalies"),
        expr("anomalies * 10000 div events").as("anomaly_bp"))
      .orderBy(col("event_type"))
  }

  /** A40 core over any (event_type, day, n) daily-count frame: each
    * day's volume against its own type's TRAILING-7-day median. The
    * trailing median comes from a bounded self-join of the DAY frame
    * (days × types rows — metadata-scale however large the corpus; the
    * fact table aggregates first, the A32 lesson), needs ≥4 trailing
    * days (early days drop), and the ratio is pure integer arithmetic:
    * 2×median of integer counts is always an integer, so
    * ratio_bp = n·20000 div (2·median) is engine-exact. */
  def volumeSpikeCard(daily: DataFrame, spikeBp: Long = 20000): DataFrame = {
    val a = daily.select(col("event_type"), col("day").as("d"), col("n"))
    val b = daily.select(col("event_type"), col("day").as("pd"), col("n").as("pn"))
    a.join(b, Seq("event_type"))
      .where(datediff(col("d"), col("pd")).between(1, 7))
      .groupBy(col("event_type"), col("d"), col("n"))
      .agg(count(lit(1)).as("trail_days"),
        percentile(col("pn"), lit(0.5)).as("med"))
      .where(col("trail_days") >= 4)
      .select(col("event_type"), col("d").as("day"), col("n").as("events"),
        col("trail_days"),
        (col("med") * 2).cast("long").as("trail_med_x2"),
        expr("n * 20000 div cast(med * 2 as bigint)").as("ratio_bp"))
      .withColumn("is_spike", (col("ratio_bp") >= spikeBp).cast("int"))
      .orderBy(col("event_type"), col("day"))
  }

  /** A40: day-over-trailing-median volume monitor per event type — the
    * VOLUME companion to A39's value fence (a stalled producer or a
    * replayed feed moves row COUNTS before it moves values). Reports
    * every (type, day)'s ratio to its trailing-7-day median in integer
    * bp plus the 2× spike flag; this synthetic feed is Poisson-flat
    * at the gate SF (ratios ~0.8–1.3× at sf0.01; tiny-SF small-count
    * days can legitimately cross 2× on noise), and LakeQueriesSpec
    * plants a spike to prove the flag fires. */
  def q39VolumeSpike(s: SparkSession, dir: String): DataFrame =
    volumeSpikeCard(t(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")))

  /** A11: JSON property extraction from events.props + agg (regexp-based
    * so the oracle needs no JSON extension). */
  def q11JsonProps(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"), col("value"),
        regexp_extract(col("props"), "([0-9]+)", 1).cast("bigint").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
        round(avg(col("k")), 4).as("k_avg"),
        round(sum(col("value")), 2).as("value_sum"))
      .orderBy(col("event_type"))
}
