package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C77 text_contamination_triage — KMV-ranked (source × benchmark)
  * triage ahead of the C72 exact pass. Rows-only CORRECTNESS entry;
  * this spec is its oracle: planted dirty/clean sources with EXACT
  * expected estimates (k exceeds the planted set sizes, so the KMV
  * algebra degenerates to exact set arithmetic), triage-invariance of
  * the exact stage (the triage only chooses WHERE the exact pass runs,
  * never what it computes), agreement with the SQL-checked C23 face,
  * and determinism. */
class TriageSpec extends SparkSpec {
  import spark.implicits._

  test("planted dirty source triages in with exact counts; disjoint source stays out") {
    val docs = Seq(
      (0L, "bench", "alpha beta gamma delta epsilon zeta"),
      (1L, "bench", "eta theta iota kappa lambda mu"),
      (2L, "bench", "nu xi omicron pi rho sigma"),
      (10L, "dirty", "alpha beta gamma delta epsilon zeta extra words here"),
      (11L, "dirty", "eta theta iota kappa lambda mu and some tail"),
      (12L, "dirty", "fresh content without overlap one two three"),
      (20L, "clean", "cat dog bird fish horse cow sheep goat"),
      (21L, "clean", "red green blue yellow purple orange pink"))
      .toDF("doc_id", "source", "text")
    val card = Decontaminate.triageCard(spark, docs,
      benchMaxId = 5L, minShared = 3L).collect()
    assert(card.map(_.getAs[String]("source")).toSeq == Seq("clean", "dirty"))
    val clean = card(0); val dirty = card(1)
    // sketches hold the full planted sets → estimates are exact
    assert(dirty.getAs[Long]("est_shared") == 10L,
      "docs 10+11 each copy 5 benchmark bigrams")
    assert(dirty.getAs[Boolean]("triaged"))
    assert(dirty.getAs[Long]("n_flagged_docs") == 2L)
    assert(dirty.getAs[Long]("n_hits") == 10L)
    assert(clean.getAs[Long]("est_shared") == 0L)
    assert(!clean.getAs[Boolean]("triaged"))
    assert(clean.isNullAt(clean.fieldIndex("n_flagged_docs")),
      "skipped sources report NULL — 'not checked', not 'clean'")
  }

  test("triage never changes what the exact stage computes, only where it runs") {
    val docsDf = graft.sources.Tables(spark, sfDir, "documents")
    val all = Decontaminate.triageCard(spark, docsDf,
        benchMaxId = 5L, minShared = 0L).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_flagged_docs"), r.getAs[Long]("n_hits"))).toMap
    val cut = Decontaminate.contaminationTriage(spark, sfDir).collect()
    assert(cut.exists(_.getAs[Boolean]("triaged")), "threshold non-vacuous: some in")
    cut.filter(_.getAs[Boolean]("triaged")).foreach { r =>
      val src = r.getAs[String]("source")
      assert((r.getAs[Long]("n_flagged_docs"), r.getAs[Long]("n_hits")) == all(src),
        s"source $src: triaged exact counts must equal the un-triaged pass")
    }
  }

  test("un-triaged exact stage agrees with the SQL-checked C23 face") {
    val bySource = TextQueries.textContamination(spark, sfDir)
      .join(graft.sources.Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_flagged_docs"), sum(col("n_hits")).as("n_hits"))
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_flagged_docs"), r.getAs[Long]("n_hits"))).toMap
    val all = Decontaminate.triageCard(spark,
      graft.sources.Tables(spark, sfDir, "documents"),
      benchMaxId = 5L, minShared = 0L).collect()
    all.foreach { r =>
      val src = r.getAs[String]("source")
      val got = (r.getAs[Long]("n_flagged_docs"), r.getAs[Long]("n_hits"))
      assert(got == bySource.getOrElse(src, (0L, 0L)), s"source $src")
    }
  }

  test("deterministic run over run") {
    val a = Decontaminate.contaminationTriage(spark, sfDir).collect().toSeq
    val b = Decontaminate.contaminationTriage(spark, sfDir).collect().toSeq
    assert(a == b)
  }
}
