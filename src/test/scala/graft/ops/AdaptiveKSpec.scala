package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the SURVEY §5 scale lever as code: every k-means-backed face
  * derives its cluster/cell count from corpus size via
  * [[KMeans.adaptiveK]], so the within-cell quadratic stages stay
  * bounded at any corpus size while results at the test SFs are
  * unchanged (k resolves to the historical 8 there). */
class AdaptiveKSpec extends SparkSpec {
  import spark.implicits._

  test("adaptiveK resolves to minK=8 across the whole test-SF regime") {
    // embeddings: 500 rows at sf0.001/sf0.01, 2000 at sf0.1 — all
    // under minK·targetCellSize = 4096, so every face trains k=8
    // exactly as the pinned round-9 results did
    for (n <- Seq(0L, 1L, 500L, 1600L, 2000L, 4096L))
      assert(KMeans.adaptiveK(n) == 8, s"n=$n")
    // and it starts growing right past the floor — the sf1 regime
    // (8k vectors → 16 cells) that the 4096-cell target left floored
    assert(KMeans.adaptiveK(4097L) == 9)
    assert(KMeans.adaptiveK(8000L) == 16)
  }

  test("expected cell size never exceeds the target below the cell ceiling") {
    // n / k ≤ targetCellSize by construction (k = ceil(n / cell) once
    // past the minK floor, up to the MaxCells broadcast bound) — the
    // bound that keeps the per-cell quadratic candidate stage flat as
    // the corpus grows
    val sizes = Seq(1L, 4095L, 4097L, 40960L, 1000000L, 100000000L)
    for (n <- sizes; cell <- Seq(256L, 512L, 4096L)
         if n <= KMeans.MaxCells.toLong * cell) {
      val k = KMeans.adaptiveK(n, targetCellSize = cell)
      assert(n.toDouble / k <= cell.toDouble + 1e-9,
        s"n=$n cell=$cell k=$k mean=${n.toDouble / k}")
    }
    // monotone in n: more corpus never means fewer cells
    val ks = (sizes :+ 100000000000L).map(KMeans.adaptiveK(_))
    assert(ks == ks.sorted, s"non-monotone: $ks")
    // past MaxCells·cell ≈ 134M the count pins at the broadcast
    // ceiling and expected cell size grows linearly — the documented
    // memory trade
    assert(KMeans.adaptiveK(1000000000L) == KMeans.MaxCells)
    assert(KMeans.adaptiveK(100000000000L) == KMeans.MaxCells)
  }

  test("derived k matches the explicit k=8 semantic-dedup card at test SF") {
    // the faces' default (adaptive) path must reproduce the pinned
    // round-9 results at the test scale bit-for-bit
    val adaptive = VectorQueries.dedupSemantic(spark, sfDir).collect().toSeq
    val explicit = VectorQueries.dedupSemantic(spark, sfDir, k = 8).collect().toSeq
    assert(adaptive == explicit)
  }

  test("a forced small cell cap grows k and keeps mean assigned cell under it") {
    val v = Vectors.withNorm(
        graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
      .select($"vec_id", $"e", $"nrm")
    val n = v.count()
    val cap = 32L
    val k = KMeans.adaptiveK(n, targetCellSize = cap)
    assert(k == math.ceil(n.toDouble / cap).toInt && k > 8,
      s"n=$n cap=$cap k=$k")
    val fit = KMeans.fit(v, k = k, iters = 3)
    val sizes = fit.assignments.groupBy($"cluster")
      .agg(count(lit(1)).as("n")).select($"n").as[Long].collect()
    assert(sizes.sum == n)
    // Lloyd's drops empty cells but the surviving mean stays near the
    // designed expectation; the grid split owns per-cell outliers. The
    // designed bound n/k ≤ cap is exact:
    assert(n.toDouble / k <= cap)
    // and the realized partition is genuinely fine-grained — far more
    // cells than the old fixed 8, so no cell owns the corpus
    assert(sizes.length > 8, s"only ${sizes.length} nonempty cells")
    assert(sizes.max < n / 2, s"a single cell holds ${sizes.max} of $n")
  }
}
