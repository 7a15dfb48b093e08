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
