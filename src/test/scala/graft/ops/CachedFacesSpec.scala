package graft.ops

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** The persisted-artifact (`*_cached`) faces must produce EXACTLY the
  * inline trainers' results, both cold (train + persist + score via the
  * stored copy) and warm (load + score) — training is deterministic and
  * the scoring path is identical in both states. */
class CachedFacesSpec extends SparkSpec {

  private def withFreshStore[T](f: => T): T = {
    ArtifactStore.rootOverride = Some(tmpDir("artifacts"))
    try f finally ArtifactStore.rootOverride = None
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case s: scala.collection.Seq[_] => s.toList
      case x => x
    }).toSeq

  private def checkPair(inline: => DataFrame, cached: => DataFrame): Unit =
    withFreshStore {
      val want = rows(inline)
      assert(want.nonEmpty)
      val cold = rows(cached)
      assert(cold == want, s"COLD cached face diverged:\n$cold\nvs\n$want")
      val warm = rows(cached)
      assert(warm == want, s"WARM cached face diverged:\n$warm\nvs\n$want")
    }

  test("sim_search_opq_cached == sim_search_opq_rot (cold and warm)") {
    checkPair(Opq.simSearchOpqRot(spark, sfDir), Opq.simSearchOpqCached(spark, sfDir))
  }

  test("sim_search_ivfpq_cached == sim_search_ivfpq (cold and warm)") {
    checkPair(IvfPq.simSearchIvfPq(spark, sfDir), IvfPq.simSearchIvfPqCached(spark, sfDir))
  }

  test("text_perplexity_quantized_cached == inline (cold and warm)") {
    checkPair(TextQueries.textPerplexityQuantized(spark, sfDir),
      TextQueries.textPerplexityQuantizedCached(spark, sfDir))
  }

  test("quality_ccnet_cached == quality_ccnet (cold and warm)") {
    checkPair(TextQueries.qualityCcnet(spark, sfDir),
      TextQueries.qualityCcnetCached(spark, sfDir))
  }

  test("text_bpe_encode_cached == text_bpe_encode (cold and warm)") {
    checkPair(graft.ops.Bpe.textBpeEncode(spark, sfDir),
      graft.ops.Bpe.textBpeEncodeCached(spark, sfDir))
  }

  test("dedup_semantic_pq_cached == dedup_semantic_pq (cold and warm)") {
    checkPair(SemanticPq.dedupSemanticPq(spark, sfDir),
      SemanticPq.dedupSemanticPqCached(spark, sfDir))
  }

  test("sim_search_graph_cached == sim_search_graph (cold and warm)") {
    checkPair(GraphAnn.simSearchGraph(spark, sfDir),
      GraphAnn.simSearchGraphCached(spark, sfDir))
  }

  test("dedup_semantic_incremental_cached == inline (cold and warm)") {
    checkPair(SemanticPq.dedupSemanticIncremental(spark, sfDir),
      SemanticPq.dedupSemanticIncrementalCached(spark, sfDir))
  }

  test("search_bm25_cached == search_bm25 (cold and warm)") {
    checkPair(Retrieval.searchBm25(spark, sfDir),
      Retrieval.searchBm25Cached(spark, sfDir))
  }
}
