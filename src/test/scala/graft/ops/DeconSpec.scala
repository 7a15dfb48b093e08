package graft.ops

import graft.SparkSpec

class DeconSpec extends SparkSpec {

  test("bloom-gated decontamination equals the exact C23 gate frame-for-frame") {
    val exact = TextQueries.textContamination(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val gated = Decontaminate.contaminationBloom(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(exact.nonEmpty, "the contamination gate found nothing — vacuous test")
    assert(gated == exact, s"sketch path diverged:\n$gated\nvs\n$exact")
  }

  test("the bloom prefilter actually prunes: candidates << corpus grams, >= true hits") {
    val corpusGrams = Dedup.shingleFrame(
      graft.sources.Tables(spark, sfDir, "documents")
        .where(org.apache.spark.sql.functions.col("doc_id") >= 5),
      "doc_id", "text", 2).count()
    val cands = Decontaminate.contaminationBloomCandidates(spark, sfDir).count()
    // bloom-negatives never reach the confirm join; on this corpus the
    // benchmark is 5 docs, so the overwhelming majority must be pruned
    assert(cands < corpusGrams / 2,
      s"prefilter pruned nothing: $cands candidates of $corpusGrams grams")
    // no false negatives: every exact hit survives the prefilter
    val exactHits = TextQueries.textContamination(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n_hits")).collect()(0).getLong(0)
    assert(cands >= exactHits,
      s"prefilter lost true hits: $cands candidates < $exactHits exact hits")
  }
}
