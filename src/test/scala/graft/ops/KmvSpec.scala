package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.KmvSketch

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.sources.Tables(spark, sfDir, "documents")

  test("below k the sketch IS the value set and every estimate is exact") {
    val k = 64
    val df = Seq("a", "b", "c", "a", "b", "d").toDF("v")
      .select(xxhash64(col("v")).as("h"))
    val sk = df.agg(KmvSketch(col("h"), k).as("kmv"))
    val arr = sk.select(col("kmv")).as[Seq[Long]].head()
    val want = Seq("a", "b", "c", "d")
      .map(v => Seq(v).toDF("v").select(xxhash64(col("v"))).as[Long].head())
      .sorted
    assert(arr == want, "sub-k sketch must hold exactly the distinct hash set, sorted")
    val est = sk.select(KmvSketch.distinctEstimate(col("kmv"), k)).as[Double].head()
    assert(est == 4.0)
  }

  test("distinct and Jaccard estimates are within sketch error at 100k scale") {
    val k = 512
    // two overlapping integer ranges: |A|=60k, |B|=60k, |A∩B|=20k,
    // |A∪B|=100k, true Jaccard = 0.2
    val a = spark.range(0, 60000).select(xxhash64(col("id")).as("h"))
      .agg(KmvSketch(col("h"), k).as("kmv")).as[Seq[Long]].head()
    val b = spark.range(40000, 100000).select(xxhash64(col("id")).as("h"))
      .agg(KmvSketch(col("h"), k).as("kmv")).as[Seq[Long]].head()
    val df = Seq((a, b)).toDF("ka", "kb")
    val estA = df.select(KmvSketch.distinctEstimate(col("ka"), k)).as[Double].head()
    assert(math.abs(estA - 60000) / 60000 < 0.15,
      s"distinct estimate $estA for true 60000 (k=$k: rse ~ 1/sqrt(k-2) ~ 4.4%)")
    val estJ = df.select(KmvSketch.jaccardEstimate(col("ka"), col("kb"), k))
      .as[Double].head()
    assert(math.abs(estJ - 0.2) < 0.08,
      s"jaccard estimate $estJ for true 0.2 (3 sigma ~ 0.053 at k=$k)")
    val estU = df.select(KmvSketch.distinctEstimate(
      KmvSketch.unionSketch(col("ka"), col("kb"), k), k)).as[Double].head()
    assert(math.abs(estU - 100000) / 100000 < 0.15, s"union estimate $estU for true 100000")
  }

  test("the 60-bit unit map (md5 parity hashes) estimates within sketch error") {
    val k = 512
    // the C64 face's hash: first 15 hex chars of md5 as a 60-bit long
    val h60 = conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val sk = spark.range(0, 60000).select(h60.as("h"))
      .agg(KmvSketch(col("h"), k).as("kmv"))
    val est = sk.select(KmvSketch.distinctEstimate(col("kmv"), k, hashBits = 60))
      .as[Double].head()
    assert(math.abs(est - 60000) / 60000 < 0.15,
      s"60-bit-unit distinct estimate $est for true 60000")
    // the SIGNED unit map over these non-negative values would read the
    // k-th value as ~0.5 and estimate ~2(k-1) — pin that the width-aware
    // map is load-bearing, not cosmetic
    val wrong = sk.select(KmvSketch.distinctEstimate(col("kmv"), k))
      .as[Double].head()
    assert(wrong < 1100, s"sanity: the 64-bit map on 60-bit values reads ~2(k-1), got $wrong")
  }

  test("sketches are merge-order independent: bit-equal across repartitionings") {
    val k = 128
    val base = spark.range(0, 50000).select(xxhash64(col("id")).as("h"))
    val one = base.repartition(1).agg(KmvSketch(col("h"), k)).as[Seq[Long]].head()
    val many = base.repartition(32).agg(KmvSketch(col("h"), k)).as[Seq[Long]].head()
    val skewed = base.repartition(7, col("h")).agg(KmvSketch(col("h"), k))
      .as[Seq[Long]].head()
    assert(one == many && one == skewed,
      "k smallest of a multiset cannot depend on partitioning")
    assert(one.length == k && one == one.sorted && one.distinct == one)
  }

  test("corpus_overlap_kmv: full matrix, bounded error vs exact Jaccard, deterministic") {
    val rep = DedupQueries.corpusOverlapKmv(spark, sfDir).collect()
    val sources = docs.select(col("source")).distinct().count().toInt
    assert(rep.length == sources * (sources - 1) / 2, "one row per unordered source pair")
    // exact shingle-set Jaccard per pair, driver-side
    val sets = docs
      .select(col("source"), explode(Dedup.shingles(col("text"), 3)).as("sh"))
      .as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rep.foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      assert(sa < sb)
      val (xa, xb) = (sets(sa), sets(sb))
      val exact = (xa intersect xb).size.toDouble / (xa union xb).size
      val est = r.getAs[Double]("est_jaccard")
      assert(est >= 0.0 && est <= 1.0)
      assert(math.abs(est - exact) <= 0.12,
        s"($sa,$sb): est $est vs exact $exact beyond the k=256 sketch band")
      // rse at k=256 is ~1/sqrt(k-2) ~ 6.3%; the worst pair in this
      // deterministic corpus sits at 3.4 sigma, so bound at ~4 sigma
      val exactUnion = (xa union xb).size
      val estU = r.getAs[Long]("est_union")
      assert(math.abs(estU - exactUnion).toDouble / exactUnion <= 0.25,
        s"($sa,$sb): union est $estU vs exact $exactUnion")
    }
    val again = DedupQueries.corpusOverlapKmv(spark, sfDir).collect()
    assert(rep.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("kmv_sketch is SQL-registered and equals the Column face") {
    graft.GraftExtensions.register(spark)
    docs.select(xxhash64(col("text")).as("h")).createOrReplaceTempView("kmv_in")
    val sqlArr = spark.sql("SELECT kmv_sketch(h, 32) FROM kmv_in").as[Seq[Long]].head()
    val colArr = docs.select(xxhash64(col("text")).as("h"))
      .agg(KmvSketch(col("h"), 32)).as[Seq[Long]].head()
    assert(sqlArr == colArr)
  }
}
