package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec
import graft.ops.{GraphAnn, Vectors}

/** The bounded top-k aggregate and the distributive-top-R graph build
  * it enables: exactness against the window spelling, tie order,
  * null skipping, cross-partition merge. */
class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  test("agg equals window row_number <= k under the same (score desc, id) order") {
    val rows = (1L to 1000L).map(i => (i % 7, i, ((i * 37) % 100).toDouble))
      .toDF("g", "id", "score").repartition(5)  // force cross-partition merges
    val viaAgg = rows.groupBy(col("g"))
      .agg(TopKByScore(col("id"), col("score"), 4).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.id").as("id"), col("t.score").as("score"))
      .as[(Long, Long, Double)].collect().toSet
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    val viaWin = rows.withColumn("r", row_number().over(w)).where(col("r") <= 4)
      .select(col("g"), col("id"), col("score"))
      .as[(Long, Long, Double)].collect().toSet
    assert(viaAgg == viaWin)
  }

  test("rank order inside the array, ties break by ascending id, nulls skipped") {
    val rows = Seq(
      (1L, java.lang.Double.valueOf(5.0)), (2L, java.lang.Double.valueOf(5.0)),
      (3L, java.lang.Double.valueOf(9.0)), (4L, null.asInstanceOf[java.lang.Double]),
      (5L, java.lang.Double.valueOf(1.0)))
      .toDF("id", "score")
    val got = rows.agg(TopKByScore(col("id"), col("score"), 3).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.id"), col("t.score")).as[(Long, Double)].collect().toSeq
    assert(got == Seq((3L, 9.0), (1L, 5.0), (2L, 5.0)))
  }

  test("groups smaller than k return what exists; empty input returns an empty frame") {
    val rows = Seq((1L, 1L, 2.0)).toDF("g", "id", "score")
    val got = rows.groupBy(col("g"))
      .agg(TopKByScore(col("id"), col("score"), 8).as("top"))
      .select(size(col("top"))).as[Int].collect().toSeq
    assert(got == Seq(1))
  }

  test("distributive graph build equals the old global-window spelling on the real corpus") {
    val v = Vectors.withNorm(
      graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
    val (adj, _) = GraphAnn.buildGraph(v)
    val got = adj.select(col("src"), col("dst"))
      .as[(Long, Long)].collect().toSet

    // the pre-round-12 spelling: full pair stream -> groupBy(src,dst)
    // dedup -> one global window
    val fit = graft.ops.KMeans.fit(v, k = graft.ops.KMeans.adaptiveK(v.count()), iters = 3)
    val centsArr = fit.centroids.select(col("cluster"), col("ce"), col("cn"))
      .agg(array_sort(collect_list(
        struct(col("cluster"), col("ce"), col("cn")))).as("cents"))
    val assigned = v.crossJoin(broadcast(centsArr))
      .select(col("vec_id"), col("e"), col("nrm"),
        explode(NearestCentroids(col("e"), col("cents"), 3)).as("cluster"))
    val a = assigned.select(col("cluster"), col("vec_id").as("src"),
      col("e").as("se"), col("nrm").as("sn"))
    val b = assigned.select(col("cluster"), col("vec_id").as("dst"),
      col("e").as("de"), col("nrm").as("dn"))
    val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
    val old = a.join(b, Seq("cluster")).where(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        (Vectors.dot(col("se"), col("de")) / (col("sn") * col("dn"))).as("cos"))
      .groupBy(col("src"), col("dst")).agg(max(col("cos")).as("cos"))
      .withColumn("rnk", row_number().over(w)).where(col("rnk") <= GraphAnn.Degree)
      .select(col("src"), col("dst")).as[(Long, Long)].collect().toSet
    assert(got == old, "distributive top-R must be exact, not approximate")
  }
}
