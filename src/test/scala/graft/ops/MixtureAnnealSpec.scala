package graft.ops

import graft.SparkSpec

class MixtureAnnealSpec extends SparkSpec {

  test("anneal phase is exactly C56's head tercile; shares and masses reconcile") {
    val plan = TextQueries.mixtureAnneal(spark, sfDir).collect()
    val (main, anneal) = plan.partition(_.getString(0) == "main")
    assert(main.nonEmpty && anneal.nonEmpty)
    // cross-check against the C56 card built by an independent plan:
    // anneal docs per source == the head bucket's docs
    val head = TextQueries.qualityCcnet(spark, sfDir).collect()
      .filter(_.getString(1) == "head")
      .map(r => r.getString(0) -> r.getAs[Long]("docs")).toMap
    val annealDocs = anneal.map(r => r.getString(1) -> r.getAs[Long]("docs")).toMap
    assert(annealDocs == head, s"anneal phase must equal the head tercile: " +
      s"$annealDocs vs $head")
    // main phase covers the whole corpus at natural share
    val corpus = graft.sources.Tables(spark, sfDir, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(main.map(r => r.getString(1) -> r.getAs[Long]("docs")).toMap == corpus)
    // per-phase integer-bp shares: each in range, sum within rounding slack
    Seq(main, anneal).foreach { phase =>
      val shares = phase.map(_.getAs[Long]("share_bp"))
      assert(shares.forall(s => s >= 0 && s <= 10000))
      val sum = shares.sum
      assert(sum <= 10000 && sum >= 10000 - phase.length,
        s"floor-div shares must sum to 10000 minus at most one bp per row, got $sum")
      // token accounting: share_bp = tokens * 10000 div phase_tokens exactly
      val phaseTokens = phase.map(_.getAs[Long]("tokens")).sum
      phase.foreach { r =>
        assert(r.getAs[Long]("share_bp") == r.getAs[Long]("tokens") * 10000 / phaseTokens)
      }
    }
    // the anneal phase must genuinely narrow the corpus
    val (mainDocs, aDocs) = (main.map(_.getAs[Long]("docs")).sum,
      anneal.map(_.getAs[Long]("docs")).sum)
    assert(aDocs > 0 && aDocs < mainDocs / 2,
      s"anneal keeps roughly a tercile: $aDocs of $mainDocs")
    val again = TextQueries.mixtureAnneal(spark, sfDir).collect()
    assert(plan.map(_.toString).toSeq == again.map(_.toString).toSeq, "deterministic")
  }
}
