package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Regression pins for the six ADVICE findings closed in round 11 (the
  * round-11 verdict asked for a spec per closed finding so none can
  * silently regress in a refactor):
  *
  *  1. CacheScope multi-action scope — a cache registered with
  *     `releaseAfterActions(n)` must survive the first n-1 actions and
  *     release after the nth (the original bug released the unigram
  *     histogram / BM25 postings caches after action #1 while consumers
  *     #2 and #3 recomputed from scratch).
  *  2. LSH oracles' zero-norm guard — a degenerate (zero-norm / null)
  *     embedding must be invisible to the LSH faces, and the generated
  *     oracle SQL must carry the matching `nrm > 0` guard so engine and
  *     oracle drop the SAME rows.
  *  3. `mixtureApply` saturating floor — degenerate corpora (all-null
  *     text) must produce defined rows, never an ANSI divide-by-zero on
  *     the achieved-total denominator.
  *  4. `textBlocklist` row-keeping denominator — a token-less
  *     (empty/whitespace) document has nothing to flag but still IS a
  *     document of its source: the `docs` denominator must count it.
  *  5. UnigramLm `maxLen` threading — train/seed/viterbi honor a
  *     non-default maxLen end to end (the original bug hard-coded 6 in
  *     the seed pass, so a caller's maxLen silently did nothing).
  */
class ClosedFindingsSpec extends SparkSpec {
  import spark.implicits._

  private def zone(tables: (String, DataFrame)*): String = {
    val dir = tmpDir("closed")
    tables.foreach { case (n, df) => df.write.parquet(s"$dir/$n.parquet") }
    dir
  }

  test("CacheScope.releaseAfterActions(2): cache survives action 1, releases after action 2") {
    val df = spark.range(100).toDF("x").persist()
    df.count() // materialize the cache
    assert(df.storageLevel.useMemory, "precondition: frame is cached")
    CacheScope.releaseAfterActions(spark, 2, df)

    def awaitStorage(expectCached: Boolean): Boolean = {
      // the QueryExecutionListener fires on the async listener bus —
      // poll briefly instead of racing it
      val deadline = System.nanoTime() + 10e9.toLong
      while (df.storageLevel.useMemory != expectCached && System.nanoTime() < deadline)
        Thread.sleep(50)
      df.storageLevel.useMemory == expectCached
    }

    spark.range(10).count() // action 1 of 2
    Thread.sleep(300)       // give a wrong early release time to manifest
    assert(df.storageLevel.useMemory,
      "releaseAfterActions(2) must NOT release after the first action")
    spark.range(10).count() // action 2 of 2
    assert(awaitStorage(expectCached = false),
      "cache must be released after the registered action count completes")
  }

  test("LSH faces: zero-norm and null embeddings are invisible; oracles carry the same guard") {
    val emb = Seq(
      (0L, Seq.fill(64)(0.0f), 0),                      // query id with zero norm
      (1L, (1 to 64).map(i => i.toFloat / 64f), 0),
      (2L, (1 to 64).map(i => (65 - i).toFloat / 64f), 0),
      (3L, (1 to 64).map(i => (if (i % 2 == 0) 1f else -1f)), 1),
      (10L, (1 to 64).map(i => i.toFloat / 64f), 0),    // near id 1
      (11L, (1 to 64).map(i => (65 - i).toFloat / 64f), 0))
      .toDF("vec_id", "embedding", "label")
      .union(Seq((12L, null.asInstanceOf[Seq[Float]], 1))
        .toDF("vec_id", "embedding", "label"))
    val dir = zone("embeddings" -> emb)

    val topk = VectorQueries.simSearchLsh(spark, dir).collect()
    assert(!topk.exists(r => r.getAs[Long]("query_id") == 0L ||
      r.getAs[Long]("vec_id") == 0L || r.getAs[Long]("vec_id") == 12L),
      s"degenerate vectors must never reach a cosine: ${topk.toSeq}")
    assert(topk.nonEmpty, "the healthy vectors must still match")

    val pairs = VectorQueries.dedupEmbeddingLsh(spark, dir).collect()
    assert(!pairs.exists(r => Seq(r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))
      .exists(v => v == 0L || v == 12L)),
      s"degenerate vectors must never pair: ${pairs.toSeq}")

    // the oracle half of the fix: both generated SQL strings filter on a
    // positive norm BEFORE any cosine, mirroring withNorm(dropDegenerate)
    Seq(VectorQueries.simSearchLshOracle, VectorQueries.dedupEmbeddingLshOracle)
      .foreach { sql =>
        assert(sql.contains("WHERE sqrt(list_dot_product(e, e)) > 0"),
          "oracle lost its zero-norm guard")
      }
  }

  test("mixtureApply: an all-null-text corpus gets defined rows, not a divide error") {
    val docs = Seq((1L, "en", "s0", 0L), (2L, "en", "s0", 0L), (3L, "en", "s1", 0L))
      .toDF("doc_id", "lang", "source", "n_chars")
      .select(col("doc_id"), lit(null).cast("string").as("text"),
        col("lang"), col("source"), col("n_chars"))
    val dir = zone("documents" -> docs)
    val rows = Sample.mixtureApply(spark, dir).collect()
    assert(rows.map(_.getAs[String]("source")).toSeq == Seq("s0", "s1"),
      "every source keeps its row")
    // null token sums flow through as nulls (defined), never an ANSI error
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("achieved_bp")) ||
        r.getAs[Long]("achieved_bp") >= 0L)
    }
  }

  test("mixtureApply: all-fractional factors (every factor_bp < 10000) still compose cleanly") {
    // three sources engineered so each target share is a hair under its
    // natural share (integer-division truncation): every factor is
    // fractional and every copy rides the coin — the shape closest to
    // the guarded zero-achieved corner that real data can reach
    val mk = (src: String, n: Int) => (1 to n).map(i =>
      (src.hashCode.toLong * 1000 + i, s"alpha beta gamma delta epsilon word$i", "en", src, 40L))
    val docs = (mk("a", 7) ++ mk("b", 7) ++ mk("c", 7))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Sample.mixtureApply(spark, zone("documents" -> docs)).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val bp = r.getAs[Long]("achieved_bp")
      assert(bp >= 0L && bp <= 10000L, s"achieved_bp out of range: $r")
    }
  }

  test("textBlocklist: token-less docs stay in the docs denominator, unflagged") {
    val docs = Seq(
      (1L, "the the the the the the the the the the", "en", "s0", 39L), // 100% hits
      (2L, "", "en", "s0", 0L),                                          // empty
      (3L, "   ", "en", "s0", 3L),                                       // whitespace
      (4L, "clean words only here without stopword hits", "en", "s0", 44L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextQueries.textBlocklist(spark, zone("documents" -> docs),
      blocklist = Seq("the"), cutBp = 600).collect().head
    assert(r.getAs[Long]("docs") == 4L,
      s"empty/whitespace docs must count in the denominator: $r")
    assert(r.getAs[Long]("flagged_docs") == 1L,
      s"only the stopword-saturated doc flags: $r")
    assert(r.getAs[Long]("flagged_bp") == 2500L,
      s"flagged share uses the full 4-doc denominator: $r")
  }

  test("UnigramLm: a caller's maxLen bounds every learned multi-char piece") {
    val words = Seq(("international", 50L), ("internet", 40L), ("interval", 30L),
      ("nation", 20L), ("net", 10L)).toDF("w", "n")
    val trained = UnigramLm.train(words, vocabTarget = 20, emRounds = 2, maxLen = 2)
    val tooLong = trained.model.logp.keys.filter(_.length > 2)
    assert(tooLong.isEmpty,
      s"maxLen=2 must bound the vocabulary, got: ${tooLong.toSeq.sorted}")
    // and the threaded viterbi respects the same bound: segmenting with
    // the trained model can only emit pieces the model contains
    val seg = UnigramLm.driverViterbi("internet", trained.model.logp, 2)
    assert(seg.nonEmpty && seg.forall(_.length <= 2), s"viterbi pieces: $seg")
  }

  // ---- round-12 ADVICE findings, closed in round 13 ------------------

  test("TopKByScore: NaN scores rank GREATEST, like the window spelling") {
    // Inf/Inf cosines on overflowing vectors produce NaN scores; Spark's
    // double ordering (row_number over score DESC) sorts NaN FIRST. The
    // original primitive > comparator silently ranked NaN LAST.
    val df = Seq((1L, 1.0), (2L, Double.NaN), (3L, 2.0), (4L, 0.5))
      .toDF("id", "score")
    val agg = df.agg(graft.functions.TopKByScore(col("id"), col("score"), 2)
        .as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.id")).as[Long].collect().toSeq
    val win = df.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("id"))))
      .where(col("rn") <= 2).orderBy(col("rn"))
      .select(col("id")).as[Long].collect().toSeq
    assert(win.head == 2L, s"precondition: Spark ranks NaN first, got $win")
    assert(agg == win, s"aggregate $agg must equal window spelling $win")
  }

  test("simSearchLshCached: a stale stored operating point rebuilds in place") {
    val saved = ArtifactStore.rootOverride
    ArtifactStore.rootOverride = Some(tmpDir("lsh_stale_store"))
    try {
      val fresh = VectorQueries.simSearchLshCached(spark, sfDir).collect().toSeq
      // corrupt the stored point to one the adaptive rule would never
      // pick for this corpus size (as if the corpus had shrunk across
      // the threshold since the artifact was banded)
      import spark.implicits._
      ArtifactStore.save(Seq((7, 1)).toDF("bits", "radius"), sfDir, "lsh_meta")
      val served = VectorQueries.simSearchLshCached(spark, sfDir).collect().toSeq
      assert(served == fresh,
        "stale meta must trigger a rebuild, not a band-mismatched serve")
      val m = ArtifactStore.load(spark, sfDir, "lsh_meta").head()
      assert(m.getAs[Int]("bits") == Vectors.adaptiveLshBits(500L))
    } finally ArtifactStore.rootOverride = saved
  }

  // ---- round-13 ADVICE findings, closed in round 14 ------------------

  test("appendLshIndex: a RETRIED append cannot drift the staleness counter") {
    val emb = Vectors.withNorm(
      graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
    val standing = emb.where(col("vec_id") < 300)
    val batch = emb.where(col("vec_id") >= 300)

    val root = tmpDir("lshidx_retry")
    IncrementalIndex.writeLshIndex(root, standing)
    assert(IncrementalIndex.appendLshIndex(spark, root, batch))
    // the at-least-once retry: the SAME batch appends again (a crash
    // after the banded write, before meta, replays the whole call)
    assert(IncrementalIndex.appendLshIndex(spark, root, batch))
    val meta = spark.read.parquet(s"$root/lmeta").head()
    assert(meta.getAs[Long]("n") == emb.count(),
      s"n must be recounted from the table (distinct vec_ids), got $meta")
    // and the duplicate banded rows are invisible to a serve
    val rootClean = tmpDir("lshidx_clean")
    IncrementalIndex.writeLshIndex(rootClean, emb)
    val served = IncrementalIndex.serveLsh(spark, root, emb).collect().toSeq
    val clean = IncrementalIndex.serveLsh(spark, rootClean, emb).collect().toSeq
    assert(served.nonEmpty && served == clean,
      "retried append's duplicate rows must not change serve results")
  }

  test("simSearchLshCached: a TORN save (banded width != meta) rebuilds in place") {
    val saved = ArtifactStore.rootOverride
    ArtifactStore.rootOverride = Some(tmpDir("lsh_torn_store"))
    try {
      val fresh = VectorQueries.simSearchLshCached(spark, sfDir).collect().toSeq
      // simulate the torn save the round-13 ADVICE describes: the
      // banded artifact rewritten at a different width while meta still
      // matches the adaptive rule for this corpus (bits=6, radius=0)
      val emb = Vectors.withNorm(
        graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
      ArtifactStore.save(VectorQueries.lshBand(emb, 4, 7)
        .withColumn("bits", lit(7)), sfDir, "lsh_banded")
      val served = VectorQueries.simSearchLshCached(spark, sfDir).collect().toSeq
      assert(served == fresh,
        "width disagreement between banded and meta must rebuild, not serve")
      // and a pre-width-column artifact (no `bits` column) also rebuilds
      ArtifactStore.save(VectorQueries.lshBand(emb, 4, 6), sfDir, "lsh_banded")
      val served2 = VectorQueries.simSearchLshCached(spark, sfDir).collect().toSeq
      assert(served2 == fresh, "legacy banded artifact must trigger a rebuild")
    } finally ArtifactStore.rootOverride = saved
  }

  test("knee-routed faces: Verify asserts the route with a routing message") {
    // below the knee: the check is silent (the gate regime)
    VectorQueries.requireBelowKnee(spark, sfDir,
      VectorQueries.DedupLshKnee, "dedup_embedding_auto", "exact LSH-blocked")
    // above the knee: an explicit routing message, never a row-diff
    val e = intercept[IllegalArgumentException] {
      VectorQueries.requireBelowKnee(spark, sfDir, 1L,
        "dedup_embedding_auto", "exact LSH-blocked")
    }
    assert(e.getMessage.contains("routes to its above-knee branch") &&
      e.getMessage.contains("dedup_embedding_auto"), e.getMessage)
    // and the map Verify consults actually carries the knee-routed faces
    assert(graft.SparkEntry.oracleRouteChecks.contains("dedup_embedding_auto"))
  }

  test("spanRecycleStream: empty-index guard matches the indexed path on null text") {
    import graft.streaming.StreamingDocs
    val docs = Seq((1L, "a b c d e f g h i j"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    def rows(standing: DataFrame) =
      StreamingDocs.spanRecycleStream(docs, standing)
        .select(col("doc_id"), col("total_tokens"), col("recycled_tokens"),
          col("recycled_bp"))
        .orderBy(col("doc_id")).collect().toSeq
    val guard = rows(Seq.empty[String].toDF("h"))          // null bloom
    val indexed = rows(Seq("no-such-window-hash").toDF("h")) // real bloom, 0 hits
    assert(guard == indexed,
      s"guard $guard must agree with indexed path $indexed on degenerate arrivals")
    // and the null-text arrival propagates nulls, never a fake 0 bp
    val nullDoc = guard.find(_.getLong(0) == 2L).get
    assert(nullDoc.isNullAt(1) && nullDoc.isNullAt(3),
      s"null text must read null total_tokens/recycled_bp: $nullDoc")
  }

  // ------------------------------------------------------------------
  // round-14 ADVICE pins
  // ------------------------------------------------------------------

  test("graph build: the wide agg-fallback threshold is scoped, never leaked") {
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val before = spark.conf.get(key) // SQL conf with a default — always readable
    // inside the scope the build sees the widened value...
    GraphAnn.withWideAggFallback(spark) {
      assert(spark.conf.get(key) == (1 << 20).toString)
    }
    // ...and outside it the session's prior value is restored exactly
    assert(spark.conf.get(key) == before,
      "withWideAggFallback must restore the prior threshold")
    // the production faces route their materialization through the
    // scope: a sentinel set before the COLD build survives it
    val saved = ArtifactStore.rootOverride
    ArtifactStore.rootOverride = Some(tmpDir("graph_conf_store"))
    spark.conf.set(key, "97")
    try {
      GraphAnn.simSearchGraphCached(spark, sfDir).collect()
      assert(spark.conf.get(key) == "97",
        "simSearchGraphCached's cold build must not leak the widened threshold")
      GraphAnn.simSearchGraph(spark, sfDir).collect()
      assert(spark.conf.get(key) == "97",
        "simSearchGraph must not leak the widened threshold")
    } finally {
      spark.conf.set(key, before)
      ArtifactStore.rootOverride = saved
    }
  }

  test("corpusFingerprint: even-multiplicity changes and null-field aliasing both move it") {
    def docs(rows: Seq[(java.lang.Long, String, String)]) =
      rows.toDF("doc_id", "source", "text")
    val others = Seq[(java.lang.Long, String, String)](
      (2L, "web", "alpha"), (3L, "pdf", "beta"))
    // the same raw row appearing TWICE vs ABSENT: a pure-XOR identity
    // cancels it (even multiplicity); the count/sum components must not
    val twice = Pipeline.corpusFingerprint(
      docs(others :+ ((1L: java.lang.Long), "web", "dup") :+ ((1L: java.lang.Long), "web", "dup")))
    val absent = Pipeline.corpusFingerprint(docs(others))
    assert(twice != absent,
      "a row present twice must fingerprint differently from the row absent")
    // null-field aliasing: null source vs empty source (concat_ws's
    // null-skip made these identical)
    val nullSrc = Pipeline.corpusFingerprint(
      docs(Seq(((1L: java.lang.Long), null, "t"))))
    val emptySrc = Pipeline.corpusFingerprint(
      docs(Seq(((1L: java.lang.Long), "", "t"))))
    assert(nullSrc != emptySrc, "null and '' sources must never alias")
    val nullText = Pipeline.corpusFingerprint(
      docs(Seq(((1L: java.lang.Long), "web", null))))
    val emptyText = Pipeline.corpusFingerprint(
      docs(Seq(((1L: java.lang.Long), "web", ""))))
    assert(nullText != emptyText, "null and '' text must never alias")
    // and it is still order/partitioning-independent
    val shuffled = Pipeline.corpusFingerprint(
      docs(others.reverse).repartition(7))
    assert(shuffled == absent, "fingerprint must be order-independent")
  }

  test("export_manifest_delta: a torn prev-card (fp disagrees with meta) rebuilds, never serves") {
    val saved = ArtifactStore.rootOverride
    ArtifactStore.rootOverride = Some(tmpDir("manifest_torn_store"))
    try {
      val cold = Pipeline.exportManifestDelta(spark, sfDir)
        .collect().map(_.toString).toSeq
      // simulate the round-14 ADVICE crash: the card overwritten (from
      // some OTHER corpus state — its self-describing __fp differs)
      // while meta still matches the live corpus. The old pair
      // validated on meta alone and served the mismatched card.
      val torn = ArtifactStore.load(spark, sfDir, "manifest_prev")
        .withColumn("docs", col("docs") + 1000000L)
        .withColumn("__fp", lit("some-other-corpus-state"))
        .localCheckpoint(true)
      ArtifactStore.save(torn, sfDir, "manifest_prev")
      val served = Pipeline.exportManifestDelta(spark, sfDir)
        .collect().map(_.toString).toSeq
      assert(served == cold,
        "a card whose own fp disagrees with the live corpus must rebuild in place")
    } finally ArtifactStore.rootOverride = saved
  }

  test("appendLshIndex: a fresh watermark-ordered batch appends without the history recount") {
    val emb = Vectors.withNorm(
      graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
    val standing = emb.where(col("vec_id") < 300)
    val fresh = emb.where(col("vec_id") >= 300)

    val root = tmpDir("lshidx_fast")
    IncrementalIndex.writeLshIndex(root, standing)
    IncrementalIndex.appendLshIndex(spark, root, fresh)
    assert(!IncrementalIndex.lastAppendRecounted,
      "a batch strictly above the id watermark must take the ∝-batch path")
    val meta = spark.read.parquet(s"$root/lmeta").head()
    assert(meta.getAs[Long]("n") == emb.count(),
      s"the arithmetic path must still land the exact distinct count: $meta")
    // and the re-SENT batch (at/below the watermark) pays the recount
    // exactly once, converging to the same exact n
    IncrementalIndex.appendLshIndex(spark, root, fresh)
    assert(IncrementalIndex.lastAppendRecounted,
      "a re-sent batch must be caught by the watermark and recounted")
    val meta2 = spark.read.parquet(s"$root/lmeta").head()
    assert(meta2.getAs[Long]("n") == emb.count(), s"recount must heal n: $meta2")
  }
}
