package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The sample-train / encode-all cadence (round-13 verdict items 3/5):
  * iterative model fits cost Θ(rows × k) per round, so past
  * [[Vectors.TrainSampleCap]] the k-means / PQ trainers fit on a
  * deterministic content-keyed sample while assignment + encoding
  * still touch every row. Pins:
  *
  *  - below the cap the sample IS the corpus frame (reference
  *    equality — the bit-identity guarantee for every gate SF);
  *  - above the cap: deterministic, ~cap-sized, a subset;
  *  - a sampled [[SemanticPq.buildModel]] still assigns and encodes
  *    EVERY healthy vector, keeps the caller's k (cell size drives the
  *    SDC pair stage), and is deterministic run over run;
  *  - a sampled [[IvfPq.buildIndex]] still posts every vector and its
  *    search face still serves.
  */
class TrainSampleSpec extends SparkSpec {

  private def emb: DataFrame =
    Vectors.withNorm(graft.sources.Tables(spark, sfDir, "embeddings"),
      "embedding").select(col("vec_id"), col("e"), col("nrm"))

  test("below the cap the sample IS the corpus frame") {
    val v = emb
    val (tv, tn) = Vectors.trainSample(v, 500L)
    assert(tv eq v, "below-cap sampling must not touch the plan")
    assert(tn == 500L)
    val (tu, tm) = Vectors.trainSample(v, -1L)
    assert((tu eq v) && tm == -1L, "unknown count keeps the corpus")
  }

  test("above the cap: deterministic, ~cap-sized, a subset") {
    val v = emb
    val (tv, tn) = Vectors.trainSample(v, 500L, cap = 100L)
    val ids = tv.select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    assert(tn == 100L, s"expected-rows estimate: $tn")
    // hash-kept fraction: ~1/5 of 500; binomial spread tolerated
    assert(ids.size >= 60 && ids.size <= 140, s"sample size ${ids.size}")
    val again = Vectors.trainSample(v, 500L, cap = 100L)._1
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    assert(ids == again, "the sample must be content-keyed, not random")
    val all = v.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(ids.forall(all.contains))
  }

  test("sampled buildModel: every vector assigned + coded, k bounded, deterministic") {
    val v = emb
    val n = v.count()
    def model() = SemanticPq.buildModel(v, k = KMeans.adaptiveK(n), iters = 3,
      numSub = 16, subDim = 4, pqK = 64, rows = n, trainCap = 100L)
    val m = model()
    assert(m.coded.count() == n, "encode-all: every healthy vector coded")
    assert(m.assigned.count() == n)
    // the caller's k is KEPT for the dedup model (cell size drives the
    // SDC pair stage); only the FIT runs on the sample
    val kUsed = m.cents.count()
    assert(kUsed == KMeans.adaptiveK(n).toLong,
      s"buildModel must keep the caller's k, got $kUsed")
    val codes = m.coded.select(col("vec_id"), col("cluster"),
      col("codes").cast("string")).collect().map(_.toString).sorted.toSeq
    val codesAgain = model().coded.select(col("vec_id"), col("cluster"),
      col("codes").cast("string")).collect().map(_.toString).sorted.toSeq
    assert(codes == codesAgain, "sampled build must be deterministic")
  }

  test("above the cap the sample is deterministic UNDER REPARTITIONING") {
    // round-14 verdict item 4: the whole oracle-replay posture of the
    // trained faces rests on trainSample being a pure per-row content
    // predicate — a sample that depended on partitioning (sample(),
    // monotonically_increasing_id, zipWithIndex) would silently train a
    // different model per layout
    val v = emb
    val base = Vectors.trainSample(v, 500L, cap = 100L)._1
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted.toSeq
    for (p <- Seq(1, 7, 32)) {
      val ids = Vectors.trainSample(v.repartition(p), 500L, cap = 100L)._1
        .select(col("vec_id")).collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == base, s"sample must not depend on partitioning (p=$p)")
    }
    val shuffledOrder = Vectors.trainSample(
      v.orderBy(col("vec_id").desc), 500L, cap = 100L)._1
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(shuffledOrder == base, "sample must not depend on row order")
  }

  test("Verify guards the cap seam for every sample-trained oracle-checked face") {
    // the faces whose fits run through trainSample — their oracles were
    // adjudicated in the below-cap (bit-identical) regime, so Verify
    // must refuse an above-cap corpus with an explicit seam message
    val guarded = Seq("sim_search_ivfpq", "sim_search_ivfpq_cached",
      "sim_search_graph", "sim_search_graph_cached",
      "dedup_semantic_pq", "dedup_semantic_pq_cached",
      "dedup_semantic_incremental", "dedup_semantic_incremental_cached")
    guarded.foreach { f =>
      assert(graft.SparkEntry.oracleRouteChecks.contains(f),
        s"$f must carry a Verify route/seam check")
      // below the cap (every gate SF): silent
      graft.SparkEntry.oracleRouteChecks(f)(spark, sfDir)
    }
    // the above-cap refusal: a minimal cap+1 corpus (tiny vectors — the
    // guard only counts healthy rows) must fail with the seam message
    val dir = tmpDir("traincap")
    spark.range(Vectors.TrainSampleCap + 1)
      .select(col("id").as("vec_id"),
        array(lit(1.0f), lit(0.0f), lit(0.0f), lit(0.0f)).as("embedding"),
        lit(0).as("label"))
      .write.parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      VectorQueries.requireBelowTrainCap(spark, dir, "sim_search_ivfpq")
    }
    assert(e.getMessage.contains("bit-identical") &&
      e.getMessage.contains("sim_search_ivfpq"), e.getMessage)
  }

  test("sampled IvfPq build: every vector posted, search serves") {
    val v = emb
    val unit = v.select(col("vec_id"),
      transform(col("e"), x => x / col("nrm")).as("e"), lit(1.0).as("nrm"))
    val (coarse, cb, postings) =
      IvfPq.buildIndex(spark, unit, numSub = 8, subDim = 8, k = 16,
        trainCap = 100L)
    assert(postings.count() == v.count())
    assert(coarse.count() >= 1 && cb.count() > 0)
  }
}
