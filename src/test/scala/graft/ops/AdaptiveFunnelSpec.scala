package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C104's round-14 knee retirement (round-13 verdict item 1): the
  * fixed-(16, 100) prefix funnel's recall is measured collapsing with
  * corpus size (0.70 at the 500-vector gates → 0.22 at 8k → 0.00 at
  * 4M) while its cost never beats the exact scan on inline 64-dim
  * vectors, so [[VectorQueries.simSearchAdaptive]] routes to the exact
  * scan past [[VectorQueries.AdaptiveFunnelKnee]]. This spec pins:
  *
  *  - branch identity below the knee (the face IS the funnel — the
  *    oracle-replayed regime, bit-identical to previous rounds);
  *  - branch identity above the knee (the face IS the exact scan over
  *    its own corpus contract, vec_id ≥ 5 — recall 1.0 by
  *    construction);
  *  - the boundary: n == knee still routes the funnel (`<=`, matching
  *    [[VectorQueries.dedupEmbeddingAuto]]'s rule);
  *  - the demo-domain recall claim: at gate scale the funnel holds a
  *    measured recall floor, and the exact route dominates it.
  */
class AdaptiveFunnelSpec extends SparkSpec {

  private def emb: DataFrame =
    Vectors.withNorm(graft.sources.Tables(spark, sfDir, "embeddings"),
      "embedding")

  private def keys(df: DataFrame): Seq[(Long, Long)] =
    df.select(col("query_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("below the knee the face IS the funnel (oracle-replayed regime)") {
    val face = VectorQueries.simSearchAdaptive(spark, sfDir)
    val funnel = VectorQueries.simSearchAdaptiveFunnel(emb, 16, 100)
    assert(face.collect().toSeq == funnel.collect().toSeq)
    assert(face.count() > 0)
  }

  test("above the knee the face IS the exact scan over vec_id >= 5") {
    val routed = VectorQueries.simSearchAdaptive(spark, sfDir, knee = 0L)
    val v = emb
    val exact = VectorQueries.exactTopkFrom(v, v.where(col("vec_id") >= 5))
    assert(routed.collect().toSeq == exact.collect().toSeq)
  }

  test("the boundary routes the funnel at n == knee, exact at n == knee + 1") {
    val n = emb.count()
    val atKnee = VectorQueries.simSearchAdaptive(spark, sfDir, knee = n)
    val funnel = VectorQueries.simSearchAdaptiveFunnel(emb, 16, 100)
    assert(atKnee.collect().toSeq == funnel.collect().toSeq,
      "n == knee must stay on the funnel branch (<=)")
    val pastKnee = VectorQueries.simSearchAdaptive(spark, sfDir, knee = n - 1)
    val exact = VectorQueries.exactTopkFrom(emb, emb.where(col("vec_id") >= 5))
    assert(pastKnee.collect().toSeq == exact.collect().toSeq,
      "n > knee must route to the exact scan")
  }

  test("exact route dominates the funnel's measured gate-scale recall") {
    val truth = keys(VectorQueries.exactTopkFrom(emb,
      emb.where(col("vec_id") >= 5))).toSet
    val funnelHits = keys(VectorQueries.simSearchAdaptiveFunnel(emb, 16, 100))
      .count(truth.contains)
    // the documented demo-domain floor at gate scale (measured 0.70)
    assert(funnelHits >= (truth.size * 6) / 10,
      s"funnel recall fell below the documented gate-scale floor: " +
        s"$funnelHits/${truth.size}")
    // and the routed exact branch is recall-1.0 by construction
    val routedHits = keys(VectorQueries.simSearchAdaptive(spark, sfDir,
      knee = 0L)).count(truth.contains)
    assert(routedHits == truth.size)
  }
}
