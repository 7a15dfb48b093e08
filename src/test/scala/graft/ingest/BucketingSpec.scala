package graft.ingest

import graft.SparkSpec

/** The co-location contract: a join of two tables bucketed on the join
  * key must execute WITHOUT shuffling either side. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-bucketed equi-join runs with no Exchange") {
    val orders = (1L to 500L).map(k => (k, s"o$k")).toDF("k", "o")
    val custs = (1L to 500L).map(k => (k, s"c$k")).toDF("k", "c")
    LakeWriter.writeBucketed(orders, "b_orders", "k", 8, sortCols = Seq("k"))
    LakeWriter.writeBucketed(custs, "b_custs", "k", 8, sortCols = Seq("k"))
    try {
      // disable auto-broadcast so the join would OTHERWISE shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_custs"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 500)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_custs")
    }
  }

  test("CDC upsert over a bucketed base never shuffles the base side") {
    // the 100 TB merge story: the big base table is bucketed on the
    // merge key, so only the (small) changeset shuffles — the base
    // reads co-located buckets straight into the full-outer join
    val base = (1L to 400L).map(k => (k, s"v$k")).toDF("k", "v")
    LakeWriter.writeBucketed(base, "b_state", "k", 8, sortCols = Seq("k"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val changes = Seq((1L, "v1b", "U", 1L), (2L, "", "D", 1L), (401L, "new", "U", 1L))
        .toDF("k", "v", "op", "seq")
      val merged = Merge.upsert(spark.table("b_state"), changes, "k")
      val plan = merged.queryExecution.executedPlan.toString
      // only the CHANGES side may exchange (its window + bucket-count
      // alignment); an unbucketed base would add a third exchange
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges <= 2, s"base side must not add a shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"base must be read as a bucketed scan:\n$plan")
      val got = merged.as[(Long, String)].collect().toMap
      assert(got.size == 400 && got(1L) == "v1b" && got(401L) == "new" && !got.contains(2L))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_state")
    }
  }

  test("groupBy on the bucket key skips its shuffle too") {
    val ev = (1L to 300L).map(k => (k % 50, k)).toDF("k", "v")
    LakeWriter.writeBucketed(ev, "b_events", "k", 4)
    try {
      val agg = spark.table("b_events").groupBy("k").count()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed aggregation must not shuffle:\n$plan")
      assert(agg.count() == 50)
    } finally spark.sql("DROP TABLE IF EXISTS b_events")
  }

  test("the TPC-H Q10 shape over orderkey-bucketed facts never exchanges on orderkey") {
    // A31's plan on plain parquet shuffles lineitem AND orders on
    // orderkey for the fact-fact join. With both facts bucketed on
    // the orderkey (the canonical co-partition this pair should be
    // written in at 100 TB — the same layout serves Q4/Q12/Q18/Q21),
    // that join reads co-located buckets and the only exchanges left
    // are the custkey join + per-customer aggregate, whose input is
    // already filtered to the date window.
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
    val ord = graft.sources.Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate")
    LakeWriter.writeBucketed(li, "b_q10_li", "l_orderkey", 8,
      sortCols = Seq("l_orderkey"))
    LakeWriter.writeBucketed(ord, "b_q10_ord", "o_orderkey", 8,
      sortCols = Seq("o_orderkey"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val cust = graft.sources.Tables(spark, sfDir, "customer")
        .select("c_custkey", "c_name")
      def shape(l: org.apache.spark.sql.DataFrame,
                o: org.apache.spark.sql.DataFrame) =
        l.where(col("l_returnflag") === "R")
          .join(o.where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp_ntz")),
            col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"),
            floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)
              .cast("long").as("cents"))
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(sum(col("cents")).as("revenue_cents"), count(lit(1)).as("line_items"))
          .orderBy(col("revenue_cents").desc, col("c_custkey"))
          .limit(20)
      val bucketed = shape(spark.table("b_q10_li"), spark.table("b_q10_ord"))
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"the fact-fact join must be bucket-aligned, not shuffled:\n$plan")
      assert("Bucketed: true".r.findAllIn(plan).size == 2,
        s"both fact scans must read as bucketed:\n$plan")
      val got = bucketed.collect().map(_.toString).toSeq
      val want = shape(li, ord).collect().map(_.toString).toSeq
      assert(got == want && got.nonEmpty,
        "bucketed face must return the exact parquet-face rows")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_q10_li")
      spark.sql("DROP TABLE IF EXISTS b_q10_ord")
    }
  }

  test("the TPC-H Q13 shape over bucketed base tables shuffles only the histogram") {
    // A32's plan on plain parquet shuffles twice on custkey (orders
    // partial-agg + the join). With customer AND orders bucketed on
    // the key, both collapse: the groupBy reads co-located buckets,
    // the left join is bucket-aligned, and the only Exchange left is
    // the final histogram regroup on the tiny (order-count) key space
    // — the 100 TB layout this fact/dim pair should be written in.
    import org.apache.spark.sql.functions._
    val customer = graft.sources.Tables(spark, sfDir, "customer").select("c_custkey")
    val orders = graft.sources.Tables(spark, sfDir, "orders")
      .select("o_custkey", "o_orderpriority")
    LakeWriter.writeBucketed(customer, "b_q13_cust", "c_custkey", 8,
      sortCols = Seq("c_custkey"))
    LakeWriter.writeBucketed(orders, "b_q13_orders", "o_custkey", 8,
      sortCols = Seq("o_custkey"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def shape(cust: org.apache.spark.sql.DataFrame,
                ord: org.apache.spark.sql.DataFrame) = {
        val perCust = ord.where(col("o_orderpriority") =!= "1-URGENT")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        cust.select(col("c_custkey"))
          .join(perCust, col("c_custkey") === col("o_custkey"), "left")
          .select(coalesce(col("n"), lit(0L)).as("c_count"))
          .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      }
      val bucketed = shape(spark.table("b_q13_cust"), spark.table("b_q13_orders"))
      val plan = bucketed.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1, s"only the histogram may shuffle:\n$plan")
      assert("Bucketed: true".r.findAllIn(plan).size == 2,
        s"both sides must read as bucketed scans:\n$plan")
      val got = bucketed.collect().map(_.toString).toSeq
      val want = shape(customer, orders).collect().map(_.toString).toSeq
      assert(got == want, "bucketed face must return the exact A32 rows")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_q13_cust")
      spark.sql("DROP TABLE IF EXISTS b_q13_orders")
    }
  }
}
