package graft.ops

import graft.SparkSpec

/** The C7 adaptive LSH operating point (round-13 queue item a): the
  * signature width scales with corpus size at constant expected bucket
  * occupancy, Hamming-1 multi-probe engages with it, and below the
  * threshold the point is bit-identical to the previously shipped
  * (6 bits, radius 0) constant — the same gate-preserving posture as
  * ProductQuant.adaptiveCand. */
class AdaptiveLshSpec extends SparkSpec {

  test("adaptive bits: exact integer threshold, base below 8192, +1 past it") {
    assert(Vectors.adaptiveLshBits(0) == 6)
    assert(Vectors.adaptiveLshBits(500) == 6)
    assert(Vectors.adaptiveLshBits(2000) == 6)
    assert(Vectors.adaptiveLshBits(8192) == 6)   // boundary stays base
    assert(Vectors.adaptiveLshBits(8193) == 7)   // the measured knee
    assert(Vectors.adaptiveLshBits(64000) == 7)
    assert(Vectors.adaptiveLshBits(512000) == 7) // never past the codegen cliff
    assert(Vectors.MaxLshBits == 12)             // oracle plane-inline cap
  }

  test("probe radius engages exactly when the width adapts") {
    assert(Vectors.adaptiveLshRadius(8192) == 0)
    assert(Vectors.adaptiveLshRadius(8193) == 1)
    assert(Vectors.adaptiveLshRadius(500) == 0)
  }

  test("plane prefix property: the b-plane set IS the first b rows of the 12-plane set") {
    // The oracle inlines all MaxLshBits planes and masks j >= b; the
    // engine hashes with hyperplanes(b, ...). These agree iff Array.fill
    // consumes the seeded RNG row-major — pin it per table seed.
    for (l <- 0 until 4) {
      val full = Vectors.hyperplanes(Vectors.MaxLshBits, VectorQueries.EmbeddingDim, 42L + l)
      val pre = Vectors.hyperplanes(9, VectorQueries.EmbeddingDim, 42L + l)
      assert(full.take(9).map(_.toSeq).toSeq == pre.map(_.toSeq).toSeq)
    }
  }

  test("below the threshold the adaptive face is row-identical to the fixed (6, 0) face") {
    val v = Vectors.withNorm(graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
    val adaptive = VectorQueries.simSearchLsh(spark, sfDir).collect().toSeq
    val fixed = VectorQueries.simSearchLshAt(v, 4, 6, 0).collect().toSeq
    assert(adaptive == fixed)
  }

  test("cached serve face: cold build == warm load == inline face, artifacts present after first call") {
    val fresh = tmpDir("lsh_artifacts")
    ArtifactStore.rootOverride = Some(fresh)
    try {
      val inline = VectorQueries.simSearchLsh(spark, sfDir).collect().toSeq
      assert(!ArtifactStore.has(spark, sfDir, "lsh_banded", "lsh_meta"))
      val cold = VectorQueries.simSearchLshCached(spark, sfDir).collect().toSeq
      assert(ArtifactStore.has(spark, sfDir, "lsh_banded", "lsh_meta"),
        "first call must persist the banded corpus and operating point")
      val warm = VectorQueries.simSearchLshCached(spark, sfDir).collect().toSeq
      assert(cold == inline, "cold build must serve the inline results")
      assert(warm == inline, "warm load must serve the inline results")
      // the stored operating point is the build-time rule output
      val meta = ArtifactStore.load(spark, sfDir, "lsh_meta").head()
      assert(meta.getAs[Int]("bits") == 6 && meta.getAs[Int]("radius") == 0)
    } finally ArtifactStore.rootOverride = None
  }

  test("Hamming-1 probing never loses recall at the same width") {
    import spark.implicits._
    val v = Vectors.withNorm(graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
    val exact = VectorQueries.simSearchTopk(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def recall(radius: Int): Double = {
      val got = VectorQueries.simSearchLshAt(v, 4, 6, radius)
        .select("query_id", "vec_id").as[(Long, Long)].collect()
      got.count(exact.contains).toDouble / exact.size
    }
    val r0 = recall(0); val r1 = recall(1)
    // radius 1 probes a strict superset of buckets, so the candidate set
    // is a superset and top-10-vs-truth recall cannot drop
    assert(r1 >= r0, s"probed recall $r1 below unprobed $r0")
  }
}
