package graft.ingest

import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "v")

  private def run(changes: Seq[(Long, Option[String], Option[Double], String, Long)]) =
    Merge.upsert(base,
        changes.toDF("k", "name", "v", "op", "seq"), "k")
      .as[(Long, Option[String], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("update overwrites, delete removes, unseen key inserts") {
    val got = run(Seq(
      (2L, Some("B2"), Some(22.0), "U", 1L),
      (3L, None, None, "D", 1L),
      (9L, Some("new"), Some(90.0), "U", 1L)))
    assert(got == Map(
      1L -> (Some("a"), Some(10.0)),
      2L -> (Some("B2"), Some(22.0)),
      9L -> (Some("new"), Some(90.0))))
  }

  test("latest change per key wins by sequence") {
    val got = run(Seq(
      (2L, Some("first"), Some(21.0), "U", 1L),
      (2L, Some("last"), Some(29.0), "U", 5L),
      (1L, Some("gone"), None, "D", 1L),
      (1L, Some("back"), Some(11.0), "U", 2L)))   // revived after delete
    assert(got(2L) == (Some("last"), Some(29.0)))
    assert(got(1L) == (Some("back"), Some(11.0)), "a later U must undo an earlier D")
  }

  test("null change values are column patches, not row wipes") {
    val got = run(Seq((2L, None, Some(25.0), "U", 1L)))
    assert(got(2L) == (Some("b"), Some(25.0)), "null name must fall back to base")
  }

  test("plan: keyed window + one full-outer equi-join, no product") {
    val df = Merge.upsert(base,
      Seq((2L, Some("x"), Some(1.0), "U", 1L)).toDF("k", "name", "v", "op", "seq"), "k")
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"must be a full-outer merge:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"merge must stay an equi-join:\n$plan")
  }

  test("ingest_upsert query matches a driver-side recomputation at sf0.001") {
    val got = IngestQueries.ingestUpsert(spark, sfDir)
      .select($"o_orderstatus", $"n").as[(String, Long)].collect().toMap
    val ord = graft.sources.Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_orderstatus").as[(Long, String)].collect()
    val expect = ord.filter { case (k, _) =>
      if (k % 3 == 0) k % 9 != 0          // changed keys survive unless deleted
      else k % 10 != 0                    // unchanged keys only if in base
    }.groupBy(_._2).map { case (st, rows) => st -> rows.length.toLong }
    assert(got == expect)
  }
}
