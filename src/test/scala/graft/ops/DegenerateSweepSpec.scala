package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-9 continuation degenerate-input sweep (the technique keeps
  * finding real bugs — this round's targets): zero-token sources
  * through the span-family bp divisions, an EMPTY benchmark side
  * through the contamination gates, an all-identical corpus through
  * the PQ-coded semantic dedup, and a single-source corpus through the
  * provenance matrix. Defined answers everywhere — no ANSI divide
  * errors, no NaN, no phantom rows. */
class DegenerateSweepSpec extends SparkSpec {
  import spark.implicits._

  private def zone(tables: (String, DataFrame)*): String = {
    val dir = tmpDir("degzone")
    tables.foreach { case (n, df) => df.write.parquet(s"$dir/$n.parquet") }
    dir
  }

  test("span cards: zero-token and shorter-than-L sources get defined rows, not divide errors") {
    val docs = Seq(
      (1L, "", "empty", 0L),                               // zero tokens
      (2L, "   ", "empty", 3L),                            // whitespace only
      (3L, "tiny doc here", "short", 13L),                 // < L tokens
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu", "dup", 60L),
      (14L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu", "dup", 60L))
      .map { case (i, t, s, n) => (i, t, "en", s, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      // a source whose only doc has NULL text: token sums go null, the
      // card row must still come out (null share, not an error)
      .union(Seq((20L, "en", "nulls", 0L)).toDF("doc_id", "lang", "source", "n_chars")
        .select(col("doc_id"), lit(null).cast("string").as("text"),
          col("lang"), col("source"), col("n_chars")))
    val dir = zone("documents" -> docs)

    val c71 = ExactSubstr.exactSubstrCard(spark, dir).collect()
    val bySrc = c71.map(r => r.getAs[String]("source") -> r).toMap
    // empty/whitespace docs carry the documented [""] one-token
    // convention (Text.tokens matches DuckDB string_split), so the
    // denominator is 2 and the share is a clean 0
    assert(bySrc("empty").getAs[Long]("share_bp") == 0L,
      "a zero-token source's coverage share is 0, not a divide error")
    val nulls = bySrc("nulls")
    assert(nulls.isNullAt(nulls.fieldIndex("share_bp")),
      "an all-null-text source reports a null share, not an error")
    assert(bySrc("short").getAs[Long]("dup_spans") == 0L)
    assert(bySrc("dup").getAs[Long]("share_bp") == 10000L,
      "two identical 12-token docs are fully covered")

    val c73 = ExactSubstr.removeDupSpansCard(spark, dir).collect()
    val r73 = c73.map(r => r.getAs[String]("source") -> r).toMap
    assert(r73("empty").getAs[Long]("removed_bp") == 0L)
    assert(r73("dup").getAs[Long]("docs_cut") == 1L,
      "keep-one removal cuts exactly the second copy")

    // C74: doc_id % 5 == 4 is the batch → doc 14 (a full dup of standing
    // doc 9) plus nothing else; the all-empty standing source is fine
    val c74 = ExactSubstr.incrementalSpansCard(spark, dir).collect()
    val r74 = c74.map(r => r.getAs[String]("source") -> r).toMap
    assert(r74("dup").getAs[Long]("recycled_bp") == 10000L,
      "the batch doc is entirely recycled from history")
  }

  test("span cards: a batch source with only zero-token docs reports 0, not a divide error") {
    val docs = Seq(
      (4L, "", "ghost", 0L),                               // batch (4 % 5 == 4), empty
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "base", 44L),
      (9L, "alpha beta gamma delta epsilon zeta eta theta", "base", 44L),
      (14L, "alpha beta gamma delta epsilon zeta eta theta", "base", 44L))
      .map { case (i, t, s, n) => (i, t, "en", s, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = zone("documents" -> docs)
    val card = ExactSubstr.incrementalSpansCard(spark, dir).collect()
    val ghost = card.find(_.getAs[String]("source") == "ghost").get
    // the [""] convention: an empty doc counts one phantom token on
    // BOTH engines, which also keeps the bp denominator non-zero
    assert(ghost.getAs[Long]("new_tokens") == 1L)
    assert(ghost.getAs[Long]("recycled_bp") == 0L,
      "an all-empty batch source recycles 0 bp, not a divide error")
  }

  test("contamination gates: an empty benchmark side flags nothing and never errors") {
    val docs = Seq(   // NO doc_id < 5 → the benchmark set is empty
      (10L, "alpha beta gamma delta epsilon", "s0", 30L),
      (11L, "zeta eta theta iota kappa", "s1", 25L))
      .map { case (i, t, s, n) => (i, t, "en", s, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = zone("documents" -> docs)
    assert(TextQueries.textContamination(spark, dir).count() == 0L)
    assert(Decontaminate.contaminationBloom(spark, dir).count() == 0L)
    val triage = Decontaminate.contaminationTriage(spark, dir).collect()
    assert(triage.length == 2)
    triage.foreach { r =>
      assert(r.getAs[Long]("est_shared") == 0L)
      assert(!r.getAs[Boolean]("triaged"))
      assert(r.isNullAt(r.fieldIndex("n_flagged_docs")))
    }
  }

  test("triage card: a source whose docs yield no shingles keeps its row at zero") {
    val docs = Seq(
      (0L, "alpha beta gamma delta", "bench", 22L),
      (10L, "alpha beta gamma delta echo fox", "loud", 31L),
      (20L, "", "mute", 0L),                  // no bigrams at all
      (21L, "one", "mute", 3L))               // single token: no bigram
      .map { case (i, t, s, n) => (i, t, "en", s, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val card = Decontaminate.triageCard(spark, docs,
      benchMaxId = 5L, minShared = 1L).collect()
    assert(card.map(_.getAs[String]("source")).toSeq == Seq("loud", "mute"),
      "the shingle-less source must keep its row")
    val mute = card.find(_.getAs[String]("source") == "mute").get
    assert(mute.getAs[Long]("est_shared") == 0L)
    assert(!mute.getAs[Boolean]("triaged"))
  }

  test("per-item leakage report: an unleaked item keeps its row with nulls, not absence") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon", "bench", 30L),     // leaks below
      (1L, "unique arcane vocabulary nobody reuses", "bench", 38L), // never leaks
      (10L, "alpha beta gamma delta epsilon and more text", "s0", 44L),
      (11L, "totally different corpus content here", "s0", 37L))
      .map { case (i, t, s, n) => (i, t, "en", s, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = zone("documents" -> docs)
    val card = TextQueries.contaminationItems(spark, dir).collect()
    assert(card.map(_.getAs[Long]("item_id")).toSeq == Seq(0L, 1L),
      "every benchmark item keeps a row")
    val leaked = card(0); val clean = card(1)
    assert(leaked.getAs[Long]("n_docs_hit") == 1L)
    assert(leaked.getAs[Long]("worst_doc") == 10L)
    assert(clean.getAs[Long]("n_docs_hit") == 0L)
    assert(clean.isNullAt(clean.fieldIndex("max_containment_bp")),
      "an unleaked item reports null maxima, not phantom zeros")
  }

  test("all-identical embeddings: PQ semantic dedup keeps exactly one") {
    val n = 12
    val emb = (1L to n.toLong).map(i => (i, Seq.fill(8)(0.5f), 0))
      .toDF("vec_id", "embedding", "label")
    val v = Vectors.withNorm(emb, "embedding")
      .select(col("vec_id"), col("e"), col("nrm"))
    val rep = SemanticPq.card(v, k = 2, iters = 2, grid = 2,
      numSub = 4, subDim = 2, pqK = 4).collect()
    assert(rep.map(_.getAs[Long]("n_vecs")).sum == n.toLong)
    assert(rep.map(_.getAs[Long]("n_kept")).sum == 1L,
      "identical vectors collapse to one keeper")
    assert(rep.map(_.getAs[Long]("n_pairs")).sum == (n * (n - 1) / 2).toLong)
  }

  test("single-source corpus: provenance matrix is diagonal-only") {
    val boiler = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (10L, s"$boiler padding words end", "solo", 60L),
      (11L, s"different lead then $boiler", "solo", 60L),
      (12L, "entirely unrelated content with no shared windows at all apart", "solo", 62L))
      .map { case (i, t, s, n) => (i, t, "en", s, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = zone("documents" -> docs)
    val cells = ExactSubstr.spanProvenanceCard(spark, dir).collect()
    assert(cells.nonEmpty, "within-source boilerplate must appear")
    cells.foreach { r =>
      assert(r.getAs[String]("src_a") == "solo" && r.getAs[String]("src_b") == "solo")
    }
  }

  test("semantic decontamination: an all-degenerate eval side yields an empty card, not an error") {
    import spark.implicits._
    val dir = zone("embeddings" ->
      Seq(
        // every eval item (vec_id < 5) is a failed-encoder output
        (0L, Seq.fill(4)(0.0f), 0),
        (1L, null.asInstanceOf[Seq[Float]], 0),
        (10L, Seq(1.0f, 0f, 0f, 0f), 1),
        (11L, Seq(0f, 1.0f, 0f, 0f), 1))
        .toDF("vec_id", "embedding", "label"))
    val got = VectorQueries.contaminationSemantic(spark, dir).collect()
    assert(got.isEmpty,
      "no valid eval items -> no rows; degenerate vectors never reach a cosine")
  }

  test("batch drift: an all-null-text source keeps a defined row (q means are the 0.0 convention)") {
    import spark.implicits._
    val good = Seq.fill(30)("the quick brown fox of and to in").mkString(" ")
    val docs = Seq((0L, good, "en", "ok", good.length.toLong),
        (4L, good, "en", "ok", good.length.toLong),
        (5L, good, "en", "ok", good.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      // source `nulls`: standing doc 1 and batch doc 9, both NULL text
      .union(Seq((1L, "en", "nulls", 0L), (9L, "en", "nulls", 0L))
        .toDF("doc_id", "lang", "source", "n_chars")
        .select(col("doc_id"), lit(null).cast("string").as("text"),
          col("lang"), col("source"), col("n_chars")))
    val dir = zone("documents" -> docs)
    val got = TextQueries.corpusBatchDrift(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val n = got("nulls")
    // null text scores 0.0 (the documented guard), so both means exist
    assert(n.getAs[Double]("q_batch") == 0.0 && n.getAs[Double]("q_drift") == 0.0, s"$n")
    // the vocab leg drops null-text docs entirely: zero batch terms,
    // and the novelty share is NULL ("nothing to measure"), not 0/0
    assert(n.getAs[Long]("batch_terms") == 0L)
    assert(n.isNullAt(n.fieldIndex("novel_bp")), s"$n")
  }
}
