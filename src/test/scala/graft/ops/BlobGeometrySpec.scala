package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The round-15 clustered-geometry claim, pinned in CI at test scale:
  * on a corpus with planted blob structure, a SAMPLE-TRAINED
  * quantized fit holds real recall — the property the BASELINE
  * round-15 ladder measures at 512k/4M (ivfpq 0.84/0.64), here
  * guarded at 2048 vectors with the fit forced onto a 256-row sample
  * through the [[IvfPq.simSearchIvfPqAt]] measurement seam. The same
  * corpus shape as `gen_sf1.py --blob-vecs`: B blob centers,
  * round-robin membership (KMeans min-id seeds hit distinct blobs),
  * noise sd 0.08 → within-blob cos ≈ 0.71 vs the cross-blob ~0 sea.
  */
class BlobGeometrySpec extends SparkSpec {
  import spark.implicits._

  private lazy val blobDir: String = {
    val n = 2048; val blobs = 8; val dim = 64
    val rnd = new scala.util.Random(42)
    def gauss() = rnd.nextGaussian()
    val centers = Array.fill(blobs) {
      val c = Array.fill(dim)(gauss())
      val nrm = math.sqrt(c.map(x => x * x).sum)
      c.map(x => x / nrm)
    }
    val rows = (0 until n).map { i =>
      val c = centers(i % blobs)
      val e = c.map(x => (x + 0.08 * gauss()).toFloat)
      (i.toLong, e.toSeq, i % 10)
    }
    val dir = tmpDir("blob_geom")
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def topSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select(col("query_id"), col("vec_id")).as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }

  test("sample-trained IVF-PQ holds recall on clustered geometry") {
    val exact = topSets(VectorQueries.simSearchTopk(spark, blobDir))
    assert(exact.size == 5 && exact.values.forall(_.size >= 10))
    // within-blob structure is real: each query's exact top-10 is
    // same-blob (ids ≡ query mod 8) — the geometry the ladder relies on
    exact.foreach { case (q, s) =>
      val sameBlob = s.count(v => v % 8 == q % 8)
      assert(sameBlob >= 9, s"query $q: exact top-10 must be same-blob, got $sameBlob")
    }
    // fit forced onto a ~256-row sample (the production above-cap regime)
    val got = topSets(IvfPq.simSearchIvfPqAt(spark, blobDir,
      coarseK = 8, trainCap = 256L))
    val recalls = exact.map { case (q, s) =>
      got.getOrElse(q, Set.empty).intersect(s).size.toDouble / s.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5,
      s"sampled-fit IVF-PQ must hold recall on blob geometry, got $mean ($recalls)")
  }
}
