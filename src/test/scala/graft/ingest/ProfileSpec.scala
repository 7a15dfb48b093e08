package graft.ingest

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("nulls and distincts count correctly in one pass") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, null), (2L, "a"), (null, "b"))
      .toDF("k", "v")
    val rows = Profile.profile(df, Seq("k", "v"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(rows("k") == (4L, 1L, 2L))
    assert(rows("v") == (4L, 1L, 2L))
  }

  test("approx mode stays within 5% of exact cardinalities") {
    val exact = Profile.metaProfile(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    val approx = Profile.profile(
        graft.sources.Tables(spark, sfDir, "orders"), Profile.ProfileCols, approx = true)
      .as[(String, Long, Long, Long)].collect()
    approx.foreach { r =>
      val e = exact(r._1)
      assert(math.abs(r._4 - e) <= math.max(1L, (e * 0.05).toLong),
        s"${r._1}: approx ${r._4} vs exact $e")
    }
  }
}
