package graft.ops

import graft.SparkSpec

class CacheScopeSpec extends SparkSpec {

  private def awaitNoCache(): Boolean = {
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (!spark.sharedState.cacheManager.isEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    spark.sharedState.cacheManager.isEmpty
  }

  test("textTfidf postings cache is dropped after the query's own action") {
    spark.sharedState.cacheManager.clearCache()
    val df = TextQueries.textTfidf(spark, sfDir)
    assert(!spark.sharedState.cacheManager.isEmpty,
      "the postings frame must be registered for caching at build time")
    assert(df.count() > 0)
    assert(awaitNoCache(),
      "the postings cache must not outlive the query materialization")
  }

  test("opt-in shingle cache is dropped after the caller's action") {
    spark.sharedState.cacheManager.clearCache()
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", persistShingles = true)
    assert(!spark.sharedState.cacheManager.isEmpty)
    pairs.count()
    assert(awaitNoCache(),
      "the shingle cache must not outlive the caller's materialization")
  }
}
