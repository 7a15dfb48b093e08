package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchSpec extends SparkSpec {

  test("merged daily sketches estimate weekly uniques within HLL error") {
    val rows = LakeQueries.sketchUniquesRollup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val exact = graft.sources.Tables(spark, sfDir, "events")
      .groupBy(weekofyear(col("ts")).as("wk"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("uniques"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows.map(r => (r.getAs[Int]("wk"), r.getAs[String]("event_type"))).toSet
      == exact.keySet)
    rows.foreach { r =>
      val k = (r.getAs[Int]("wk"), r.getAs[String]("event_type"))
      val est = r.getAs[Long]("approx_uniques")
      val ex = exact(k)
      // default lgConfigK=12 keeps relative error ~1.6%; allow 5%
      assert(math.abs(est - ex) <= math.max(2L, (ex * 0.05).toLong),
        s"week/type $k: estimate $est vs exact $ex")
      assert(r.getAs[Long]("days_merged") >= 1)
    }
  }

  test("union of per-day sketches equals sketching the whole column at once") {
    val ev = graft.sources.Tables(spark, sfDir, "events")
    val viaDays = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n"))
      .head.getLong(0)
    val direct = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("n"))
      .head.getLong(0)
    assert(viaDays == direct,
      "sketch merging must be exact over partitioned builds (mergeability)")
  }
}
