package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-9 degenerate-input sweep (the round-8 technique, next targets):
  * empty/null embedding arrays through the stats card, single-row and
  * zero-token sources through the percentile/tercile faces, an
  * all-identical corpus through MinHash banding, and zero-token docs
  * through the bigram-backoff scorer. Each face must give a DEFINED
  * answer (guarded null, absent row, bounded candidate set) — never an
  * ANSI arithmetic error, NaN, or quadratic blowup. */
class DegenerateInputsSpec extends SparkSpec {
  import spark.implicits._

  /** A tmp zone dir holding the given frames as lake tables. */
  private def zone(tables: (String, DataFrame)*): String = {
    val dir = tmpDir("degzone")
    tables.foreach { case (n, df) => df.write.parquet(s"$dir/$n.parquet") }
    dir
  }

  test("embed_stats: empty, null, and zero vectors are counted, not crashed on") {
    val emb = Seq(
      (1L, Seq(3.0f, 4.0f), 0),
      (2L, Seq(0.6f, 0.8f), 0),
      (3L, Seq.empty[Float], 0),            // empty array: size 0
      (5L, Seq(0.0f, 0.0f), 1),             // zero norm
      (6L, Seq(1.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .union(Seq((4L, null.asInstanceOf[Seq[Float]], 0))
        .toDF("vec_id", "embedding", "label")) // null embedding
    val got = VectorQueries.embedStats(spark, zone("embeddings" -> emb))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // label 0: 4 rows, 2 degenerate (empty + null); label 1: 2 rows, 1 degenerate
    assert(got == Seq((0, 4L, 2L), (1, 2L, 1L)), s"got $got")
  }

  test("percentile + ccnet faces: single-doc and zero-token sources get defined rows") {
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta", "en", "solo", 35L),
      (20L, "", "en", "empty", 0L),
      (30L, "one two three four five six seven", "en", "multi", 33L),
      (31L, "eight nine ten eleven twelve thirteen", "en", "multi", 37L),
      (32L, "fourteen fifteen sixteen seventeen eighteen", "en", "multi", 43L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = zone("documents" -> docs)

    val pct = TextQueries.qualityPercentile(spark, dir).collect()
    val solo = pct.find(_.getString(0) == "solo").get
    // a single doc IS every percentile of its source
    assert(solo.getLong(1) == 1L)
    assert(solo.getDouble(2) == solo.getDouble(3) && solo.getDouble(3) == solo.getDouble(4))
    pct.foreach { r =>
      Seq(2, 3, 4).foreach(i => assert(!r.getDouble(i).isNaN, s"NaN percentile: $r"))
    }

    val ccnet = TextQueries.qualityCcnet(spark, dir).collect()
    // the zero-token doc scores nothing: its source is absent, not NaN
    assert(!ccnet.exists(_.getString(0) == "empty"))
    val soloRows = ccnet.filter(_.getString(0) == "solo")
    assert(soloRows.map(_.getString(1)).toSeq == Seq("head"),
      s"single-doc source must be its own head tercile: ${soloRows.toSeq}")
    assert(soloRows.head.getLong(3) == 10000L)
    ccnet.foreach(r => assert(!r.getDouble(4).isNaN, s"NaN xent: $r"))
  }

  test("all-identical corpus: MinHash banding buckets everything without blowup, exact dedup one group") {
    val same = "the very same document text repeated across the corpus body"
    val docs = ((1L to 30L).map(i => (i, same, "en", "dup", same.length.toLong)) ++
      Seq((100L, "a genuinely different document about other things entirely", "en", "uniq", 58L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = zone("documents" -> docs)

    val pairs = DedupQueries.dedupMinhash(spark, dir)
    val n = pairs.count()
    // all 30 identical docs share every band bucket: the candidate set is
    // exactly the 30-choose-2 within-group pairs and nothing touching the
    // unique doc — bounded by the duplicate-group size, not the corpus
    assert(n == 435L, s"expected C(30,2)=435 candidate pairs, got $n")
    assert(pairs.where(col("doc_a") === 100L || col("doc_b") === 100L).count() == 0)

    val card = TextQueries.dedupExact(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(card == Seq(("dup", 30L, 1L, 29L), ("uniq", 1L, 1L, 0L)),
      s"exact-dedup card off: $card")
  }

  test("bigram backoff: zero- and one-token docs are absent, never NaN") {
    val docs = Seq(
      (1L, "", "en", "s0", 0L),                       // zero tokens
      (2L, "lonely", "en", "s0", 6L),                 // one token: no bigram
      (3L, "a proper little sentence here", "en", "s0", 29L),
      (4L, "another proper little sentence here", "en", "s1", 35L),
      (5L, "yet another proper little sentence", "en", "s1", 34L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = zone("documents" -> docs)
    val out = TextQueries.textPerplexityBigram(spark, dir).collect()
    assert(out.nonEmpty)
    // docs 1 and 2 produce no bigrams: s0 aggregates only doc 3
    val s0 = out.find(_.getString(0) == "s0").get
    assert(s0.getLong(1) == 1L, s"zero/one-token docs must drop out: $s0")
    out.foreach { r =>
      (2 until r.length).foreach { i =>
        if (!r.isNullAt(i)) r.get(i) match {
          case d: Double => assert(!d.isNaN, s"NaN in $r")
          case _ =>
        }
      }
    }
  }
}
