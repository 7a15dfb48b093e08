package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE's native skew-join split — the engine-side counterpart of the
  * explicit salting in [[Skew]] (SURVEY §5): for plain sort-merge joins,
  * Spark detects reduce partitions far above the median and splits them
  * into parallel sub-reads at runtime, no plan rewrite needed. This spec
  * pins that the lever actually engages on a skewed join under
  * production-shaped configs (thresholds forced low so the tiny test
  * frame qualifies). */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the skewed sort-merge join partition (skew=true)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // one giant key (80% of rows) among many small ones
      val large = spark.range(200000)
        .select(when(col("id") % 5 =!= 0, lit(7L)).otherwise(col("id") % 97).as("k"),
          col("id").as("v"))
      val small = spark.range(97).select(col("id").as("k"), lit("d").as("tag"))
      // no keyed operator above the join: a downstream groupBy(k) would
      // demand hash distribution and AQE then declines to split (the
      // split breaks the partitioning guarantee)
      val joined = large.join(small, "k").select("k", "v", "tag")
      joined.queryExecution.toRdd.count() // finalize the adaptive plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the skewed join for splitting:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
