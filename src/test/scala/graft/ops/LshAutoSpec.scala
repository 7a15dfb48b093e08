package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C7b `sim_search_lsh_auto` (round-13 verdict item 2): the LSH serve's
  * measured envelope closes past ~1M vectors — the C7 operating point
  * holds a constant ~25% candidate fraction, pricing the serve linear
  * in n at a heavy constant (29.5 s at 4M vs the exact scan's 4.0 s) —
  * so the auto face serves the artifact-backed LSH path below
  * [[VectorQueries.LshServeKnee]] and the exact scan past it. Pins:
  *
  *  - branch identity below the knee (the face IS simSearchLshCached —
  *    the oracle-replayed regime, artifact-backed);
  *  - branch identity above the knee (the face IS the exact scan with
  *    C7's output contract: whole corpus, self excluded);
  *  - the boundary: n == knee stays on the LSH branch (`<=`).
  */
class LshAutoSpec extends SparkSpec {

  private def emb: DataFrame =
    Vectors.withNorm(graft.sources.Tables(spark, sfDir, "embeddings"),
      "embedding")

  test("below the knee the face IS the artifact-backed LSH serve") {
    val saved = ArtifactStore.rootOverride
    ArtifactStore.rootOverride = Some(tmpDir("lsh_auto_store"))
    try {
      val auto = VectorQueries.simSearchLshAuto(spark, sfDir).collect().toSeq
      val cached = VectorQueries.simSearchLshCached(spark, sfDir).collect().toSeq
      assert(auto.nonEmpty && auto == cached)
    } finally ArtifactStore.rootOverride = saved
  }

  test("above the knee the face IS the exact scan (C7 output contract)") {
    val routed = VectorQueries.simSearchLshAuto(spark, sfDir, knee = 0L)
      .collect().toSeq
    val exact = VectorQueries.simSearchTopk(spark, sfDir).collect().toSeq
    assert(routed == exact)
  }

  test("the boundary routes LSH at n == knee, exact at n == knee - 1") {
    val saved = ArtifactStore.rootOverride
    ArtifactStore.rootOverride = Some(tmpDir("lsh_auto_edge"))
    try {
      val n = emb.count()
      val atKnee = VectorQueries.simSearchLshAuto(spark, sfDir, knee = n)
        .collect().toSeq
      val cached = VectorQueries.simSearchLshCached(spark, sfDir).collect().toSeq
      assert(atKnee == cached, "n == knee must stay on the LSH branch (<=)")
      val past = VectorQueries.simSearchLshAuto(spark, sfDir, knee = n - 1)
        .collect().toSeq
      val exact = VectorQueries.simSearchTopk(spark, sfDir).collect().toSeq
      assert(past == exact, "n > knee must route to the exact scan")
    } finally ArtifactStore.rootOverride = saved
  }
}
