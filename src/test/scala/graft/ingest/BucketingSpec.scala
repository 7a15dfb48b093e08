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
}
