package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int, s: Int = 0) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:$s%02d")

  private lazy val anchors = Seq((1L, 10L, ts(10)), (1L, 11L, ts(20)), (2L, 20L, ts(10)))
    .toDF("k", "aid", "ts")

  private def run(events: Seq[(Long, Timestamp, Long)]) =
    RangeJoin.withinWindow(anchors,
        events.toDF("k", "ets", "eid"), Seq("k"), "ts", "ets", 300L)
      .select($"aid", $"eid").as[(Long, Long)].collect().toSet

  test("matches only rows strictly after, up to and including +window") {
    val got = run(Seq(
      (1L, ts(10), 100L),        // == anchor: excluded (strictly after)
      (1L, ts(10, 1), 101L),     // in window
      (1L, ts(15), 102L),        // == anchor+300s: included (inclusive upper)
      (1L, ts(15, 1), 103L)))    // past the window of a1, inside a2's? 20:00-15:01 no — before a2
    assert(got == Set((10L, 101L), (10L, 102L)))
  }

  test("bucket boundary straddle: a hit in the NEXT bucket is still found") {
    // anchor at 00:14:30 (bucket 2 of width 300); hit at 00:16:00 (bucket 3)
    val a = Seq((1L, 10L, ts(14, 30))).toDF("k", "aid", "ts")
    val got = RangeJoin.withinWindow(a,
        Seq((1L, ts(16), 200L)).toDF("k", "ets", "eid"), Seq("k"), "ts", "ets", 300L)
      .select($"aid", $"eid").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 200L)))
  }

  test("no duplicate pairs from the two right-side bucket copies") {
    val events = Seq((1L, ts(12), 100L), (1L, ts(14), 101L))
    val pairs = RangeJoin.withinWindow(anchors,
        events.toDF("k", "ets", "eid"), Seq("k"), "ts", "ets", 300L)
      .select($"aid", $"eid").as[(Long, Long)].collect()
    assert(pairs.length == pairs.distinct.length, s"duplicated pairs: ${pairs.toSeq}")
  }

  test("keys never cross") {
    assert(run(Seq((2L, ts(11), 100L))) == Set((20L, 100L)))
  }

  test("plan is an equi-join on (key, bucket), not a product with post-filter") {
    val df = RangeJoin.withinWindow(anchors,
      Seq((1L, ts(12), 100L)).toDF("k", "ets", "eid"), Seq("k"), "ts", "ets", 300L)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"range join must stay an equi-join:\n$plan")
    assert(plan.contains("__bucket"), s"bucket key missing from the join:\n$plan")
  }

  test("range_join query matches a driver-side recomputation at sf0.001") {
    val got = RangeJoin.rangeJoinErrors(spark, sfDir)
      .select($"event_id", $"n_errors").as[(Long, Long)].collect().toMap
    val ev = graft.sources.Tables(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"ts", $"event_type")
      .as[(Long, Long, Timestamp, String)].collect()
    val errs = ev.filter(_._4 == "error").groupBy(_._2)
    val purchases = ev.filter(_._4 == "purchase")
    assert(got.keySet == purchases.map(_._1).toSet, "every purchase must appear")
    purchases.foreach { case (pid, uid, pts, _) =>
      val psec = pts.getTime / 1000
      val expect = errs.getOrElse(uid, Array.empty).count { e =>
        val es = e._3.getTime / 1000; es > psec && es <= psec + 300
      }
      assert(got(pid) == expect, s"purchase $pid: $expect errors expected")
    }
  }
}
