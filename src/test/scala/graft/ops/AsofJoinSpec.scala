package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private lazy val quotes = Seq(
    (1L, ts(0), 10.0), (1L, ts(10), 11.0), (1L, ts(20), 12.0),
    (2L, ts(5), 99.0)
  ).toDF("k", "qts", "price")

  private def trades(rows: (Long, Timestamp, Long)*) =
    rows.toDF("k", "ts", "trade_id")

  private def run(t: org.apache.spark.sql.DataFrame) =
    AsofJoin.asofJoin(t, quotes, Seq("k"), "ts", "qts")
      .select($"trade_id", $"price").as[(Long, Option[Double])].collect().toMap

  test("picks the latest right row at or before each left time") {
    val got = run(trades((1L, ts(15), 100L), (1L, ts(25), 101L)))
    assert(got == Map(100L -> Some(11.0), 101L -> Some(12.0)))
  }

  test("equal timestamps match inclusively") {
    val got = run(trades((1L, ts(10), 100L)))
    assert(got(100L) == Some(11.0))
  }

  test("left rows before any right row get nulls") {
    val got = run(trades((2L, ts(1), 100L), (2L, ts(6), 101L)))
    assert(got == Map(100L -> None, 101L -> Some(99.0)))
  }

  test("keys never cross: user 3 sees nothing from user 1") {
    val got = run(trades((3L, ts(30), 100L)))
    assert(got(100L).isEmpty)
  }

  test("plan: one shuffle on the key, no range-join blowup") {
    val t = trades((1L, ts(15), 100L))
    val df = AsofJoin.asofJoin(t, quotes, Seq("k"), "ts", "qts")
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"as-of must never plan a product join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected the single union shuffle (plus AQE reads), got:\n$plan")
  }

  test("asof_join query matches a per-row reference computation at sf0.001") {
    val rows = AsofJoin.asofClickAttribution(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"ts", $"event_type")
      .as[(Long, Long, Timestamp, String)].collect()
    val clicksByUser = ev.filter(_._4 == "click").groupBy(_._2)
    rows.foreach { r =>
      val uid = r.getAs[Long]("user_id")
      val pid = r.getAs[Long]("event_id")
      val pts = ev.find(_._1 == pid).get._3
      val expect = clicksByUser.getOrElse(uid, Array.empty)
        .filter(c => !c._3.after(pts))
        .sortBy(c => (c._3.getTime, c._1)).lastOption
      assert(Option(r.getAs[Any]("click_id")).map(_.asInstanceOf[Long]) == expect.map(_._1),
        s"purchase $pid: wrong attributed click")
    }
  }
}
