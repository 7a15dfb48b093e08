package graft.ops

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 1000 rows of one hot key + a long tail
  private lazy val large = ((1 to 1000).map(_ => (1L, "hot")) ++
    (2 to 50).map(i => (i.toLong, s"cold$i"))).toDF("k", "v")
  private lazy val small = Seq((1L, "dim1"), (2L, "dim2"), (7L, "dim7"))
    .toDF("k", "name")

  test("saltedJoin returns exactly what the plain join returns") {
    val plain = large.join(small, Seq("k"), "inner")
      .select("k", "v", "name").as[(Long, String, String)].collect().sorted
    val salted = Skew.saltedJoin(large, small, "k", saltFactor = 8)
      .select("k", "v", "name").as[(Long, String, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
    assert(salted.count(_._1 == 1L) == 1000)
  }

  test("left joins preserve unmatched rows exactly once") {
    val plain = large.join(small, Seq("k"), "left")
      .select("k", "v", "name").collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(large, small, "k", 4, "left")
      .select("k", "v", "name").collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("an unbounded custom salt is normalized, never drops rows") {
    import org.apache.spark.sql.functions.xxhash64
    // the "obvious mistake": a raw hash, far outside [0, saltFactor)
    val salted = Skew.saltedJoin(large, small, "k", 8,
        salt = Some(xxhash64(org.apache.spark.sql.functions.col("k"))))
      .select("k", "v", "name").as[(Long, String, String)].collect().sorted
    val plain = large.join(small, Seq("k"), "inner")
      .select("k", "v", "name").as[(Long, String, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("a null-producing custom salt still joins every row") {
    import org.apache.spark.sql.functions.{lit, when}
    // salt is null for the hot key — must coalesce, not drop
    val nullish = when($"k" =!= 1L, lit(3L))
    val salted = Skew.saltedJoin(large, small, "k", 8, salt = Some(nullish))
      .select("k", "v", "name").as[(Long, String, String)].collect().sorted
    val plain = large.join(small, Seq("k"), "inner")
      .select("k", "v", "name").as[(Long, String, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("the hot key actually spreads across salts") {
    val salts = large.where($"k" === 1L)
      .select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(large.columns.map(org.apache.spark.sql.functions.col): _*),
        org.apache.spark.sql.functions.lit(8)))
      .distinct().count()
    assert(salts >= 1, "identical rows share a salt; distinct rows spread")
    // distinct (k,v) rows of the hot key are identical here, so spreading
    // requires distinct row content — check with varied rows instead:
    val varied = (1 to 1000).map(i => (1L, s"hot$i")).toDF("k", "v")
    val spread = Skew.saltedJoin(varied, small, "k", 8)
    assert(spread.count() == 1000)
    val saltCount = varied.select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.col("k"),
          org.apache.spark.sql.functions.col("v")),
        org.apache.spark.sql.functions.lit(8)))
      .distinct().count()
    assert(saltCount == 8, "1000 distinct hot-key rows must hit all 8 salts")
  }

  test("skew_salted_join query: salt is in the join keys and invisible in results") {
    import org.apache.spark.sql.functions._
    val df = Skew.skewSaltedJoin(spark, sfDir)
    // integration: the physical join must key on (hot_key, __salt)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"query must route through the salted join:\n$plan")
    // the hot key really spreads: >1 distinct salt among hot_key-0 rows
    val large = graft.sources.Tables(spark, sfDir, "lineitem").select(
      when(col("l_orderkey") % 4 =!= 0, lit(0L))
        .otherwise(col("l_partkey") % 50).as("hot_key"),
      col("l_extendedprice"))
    val hotSalts = large.where(col("hot_key") === 0L)
      .select(pmod(xxhash64(col("hot_key"), col("l_extendedprice")), lit(8L)))
      .distinct().count()
    assert(hotSalts == 8, s"hot key must spread over all 8 salts, got $hotSalts")
    // correctness: identical to the plain unsalted spelling
    val plain = large.join(
        graft.sources.Tables(spark, sfDir, "part")
          .groupBy((col("p_partkey") % 50).as("hot_key"))
          .agg(min(col("p_type")).as("grp_type")),
        Seq("hot_key"))
      .groupBy(col("grp_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy(col("grp_type"))
      .collect().toSeq
    assert(df.collect().toSeq == plain)
  }
}
