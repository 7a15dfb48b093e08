package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  private val L = 8

  /** Globally-unique filler tokens: any window touching filler is unique. */
  private def filler(tag: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$tag$i")

  test("a planted T-token duplicate comes back as ONE span of exactly T tokens") {
    val plant = (0 until 30).map(i => s"plant$i")
    val a = (filler("ua", 12) ++ plant ++ filler("ub", 15)).mkString(" ")
    val b = (filler("vc", 7) ++ plant ++ filler("vd", 20)).mkString(" ")
    val c = filler("we", 40).mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val got = ExactSubstr.spans(docs, "doc_id", "text", L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // one maximal span per planted doc, nothing in the unique doc
    assert(got.toSeq == Seq(
      (1L, 13, 42, 30),   // plant occupies tokens 13..42 of doc 1
      (2L, 8, 37, 30)),   // and 8..37 of doc 2
      s"unexpected spans: ${got.toSeq}")
    // the recovered span IS the planted substring, token for token
    val toksA = a.split(" ")
    assert(toksA.slice(12, 42).toSeq == plant)
  }

  test("duplicates shorter than L are below the detection threshold") {
    val small = (0 until L - 1).map(i => s"sp$i")
    val a = (filler("xa", 10) ++ small ++ filler("xb", 10)).mkString(" ")
    val b = (filler("yc", 10) ++ small ++ filler("yd", 10)).mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    assert(ExactSubstr.spans(docs, "doc_id", "text", L).count() == 0)
  }

  test("nearby duplicated sites merge into one span with exact union coverage") {
    // two L-token plants separated by a gap smaller than L: their window
    // coverages overlap, so they merge into one disjoint span and the
    // token mass counts the overlap region once
    val p1 = (0 until L).map(i => s"pa$i")
    val p2 = (0 until L).map(i => s"pb$i")
    val gap = 3
    val a = (filler("fa", 10) ++ p1 ++ filler("fg", gap) ++ p2 ++ filler("fb", 10)).mkString(" ")
    val b = (filler("hc", 20) ++ p1 ++ filler("hg", gap) ++ p2 ++ filler("hd", 5)).mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val got = ExactSubstr.spans(docs, "doc_id", "text", L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(3)))
    // span covers p1 + gap windows? the gap tokens themselves are unique,
    // but positions differ by L+gap... whether the two sites merge depends
    // on the position gap vs L; with gap=3 < L the dup window positions
    // are 11 and 11+L+gap=22, difference 11 > L → two separate spans of
    // exactly L tokens each, and coverage counts each site once
    assert(got.toSeq == Seq((1L, L), (1L, L), (2L, L), (2L, L)),
      s"unexpected spans: ${got.toSeq}")
  }

  test("adjacent plants (gap <= L in window positions) merge into one maximal span") {
    // back-to-back plants: windows straddling the junction are ALSO
    // duplicated (both docs carry the junction), so the whole region is
    // one maximal duplicated substring of 2L tokens
    val p1 = (0 until L).map(i => s"qa$i")
    val p2 = (0 until L).map(i => s"qb$i")
    val a = (filler("ja", 10) ++ p1 ++ p2 ++ filler("jb", 10)).mkString(" ")
    val b = (filler("kc", 4) ++ p1 ++ p2 ++ filler("kd", 12)).mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val got = ExactSubstr.spans(docs, "doc_id", "text", L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(3)))
    assert(got.toSeq == Seq((1L, 2 * L), (2L, 2 * L)),
      s"expected one merged 2L span per doc: ${got.toSeq}")
  }

  test("removal keeps exactly one copy: first doc intact, second doc cut to its fillers") {
    val plant = (0 until 30).map(i => s"rplant$i")
    val fa = filler("rua", 12); val fb = filler("rub", 15)
    val fc = filler("rvc", 7); val fd = filler("rvd", 20)
    val docs = Seq(
      (1L, (fa ++ plant ++ fb).mkString(" ")),
      (2L, (fc ++ plant ++ fd).mkString(" ")),
      (3L, filler("rwe", 40).mkString(" "))).toDF("doc_id", "text")
    val got = ExactSubstr.removeDupSpans(docs, "doc_id", "text", L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](2).toList))
    // doc 1 is the (doc_id, start)-first copy: untouched
    assert(got(0)._2 == (fa ++ plant ++ fb).toList)
    // doc 2's copy is cut: only its unique fillers remain
    assert(got(1)._2 == (fc ++ fd).toList, s"doc 2 not cleaned: ${got(1)._2}")
    // the unique doc is untouched
    assert(got(2)._2 == filler("rwe", 40).toList)
  }

  test("removal card reconciles with the cleaned streams") {
    val card = ExactSubstr.removeDupSpansCard(spark, sfDir).collect()
    assert(card.nonEmpty)
    card.foreach { r =>
      val (docs, cut, before, after, bp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(after <= before && cut <= docs, s"inconsistent card: $r")
      assert(bp == (before - after) * 10000 / before, s"removed_bp off: $r")
    }
    // something was actually removed somewhere at this SF (the corpus
    // carries recurring boilerplate — C45/C71 both find it)
    assert(card.exists(r => r.getLong(3) > r.getLong(4)), "removal was vacuous")
  }

  test("incremental spans: recycled batch text is found against the standing set only") {
    val boiler = (0 until 20).map(i => s"boil$i")
    val standing = Seq(
      (1L, (filler("sa", 10) ++ boiler ++ filler("sb", 10)).mkString(" ")),
      (2L, filler("sc", 30).mkString(" "))).toDF("doc_id", "text")
    // batch doc 10 recycles the standing boilerplate; doc 11 is fresh;
    // docs 10 and 11 also SHARE a 12-token chunk that history has never
    // seen — batch-internal duplication must NOT flag against history
    val shared = (0 until 12).map(i => s"share$i")
    val batch = Seq(
      (10L, (filler("ba", 5) ++ boiler ++ filler("bb", 4) ++ shared).mkString(" ")),
      (11L, (filler("bc", 15) ++ shared ++ filler("bd", 6)).mkString(" ")))
      .toDF("doc_id", "text")
    val got = ExactSubstr.incrementalSpans(batch,
        ExactSubstr.windowHashes(standing, "doc_id", "text", L), "doc_id", "text", L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(3))).toSeq
    // exactly one span: doc 10's boilerplate (starts after 5 filler
    // tokens), full 20 tokens; the shared-but-new chunk is silent
    assert(got == Seq((10L, 6, 20)), s"unexpected incremental spans: $got")
  }

  test("span index round-trip: write, probe, append, idempotent re-probe") {
    val boiler = (0 until 20).map(i => s"ixboil$i")
    val standing = Seq(
      (1L, (filler("ixa", 10) ++ boiler ++ filler("ixb", 10)).mkString(" ")))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, (filler("ixc", 5) ++ boiler ++ filler("ixd", 9)).mkString(" ")),
      (11L, filler("ixe", 30).mkString(" "))).toDF("doc_id", "text")
    val root = tmpDir("spanix") + "/index"
    IncrementalIndex.writeSpanIndex(root, standing, "doc_id", "text")
    val hit = IncrementalIndex.probeSpans(spark, root, batch, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(3))).toSeq
    assert(hit == Seq((10L, 20)), s"probe off: $hit")
    // append the fresh doc; its text is now history — re-probing it
    // flags it whole, the recycler is unchanged
    IncrementalIndex.appendSpanIndex(root,
      batch.where(org.apache.spark.sql.functions.col("doc_id") === 11L),
      "doc_id", "text")
    val again = IncrementalIndex.probeSpans(spark, root, batch, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(3))).toSeq.sorted
    assert(again == Seq((10L, 20), (11L, 30)), s"post-append probe off: $again")
  }

  test("span provenance: the planted boilerplate attributes to exactly its source pairs") {
    val boiler = (0 until 16).map(i => s"pvboil$i")
    val other = (0 until 10).map(i => s"pvoth$i")
    val docs = Seq(
      // boiler shared across sources A and B; 'other' twice WITHIN A
      (1L, "A", (filler("pva", 8) ++ boiler ++ filler("pvb", 5)).mkString(" ")),
      (2L, "B", (filler("pvc", 11) ++ boiler ++ filler("pvd", 9)).mkString(" ")),
      (3L, "A", (filler("pve", 6) ++ other ++ filler("pvf", 7)).mkString(" ")),
      (4L, "A", (filler("pvg", 9) ++ other ++ filler("pvh", 4)).mkString(" ")),
      (5L, "C", filler("pvi", 40).mkString(" ")))
      .toDF("doc_id", "source", "text")
    val dir = tmpDir("provzone")
    docs.withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = ExactSubstr.spanProvenanceCard(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    // (A,B): one 16-token content shared cross-source;
    // (A,A): one 10-token content recurring within A; C appears nowhere
    assert(got == Seq(("A", "A", 1L, 10L), ("A", "B", 1L, 16L)),
      s"provenance matrix off: $got")
  }

  test("span origin: direction follows the C73 keeper rule, diagonal is within-source recycling") {
    val boiler = (0 until 16).map(i => s"soboil$i")
    val intra = (0 until 12).map(i => s"sointr$i")
    val docs = Seq(
      // boiler ORIGINATES in A (doc 1, the first copy by doc_id) and is
      // adopted once by B and once more WITHIN A; intra recurs twice in C
      (1L, "A", (filler("soa", 8) ++ boiler ++ filler("sob", 5)).mkString(" ")),
      (2L, "B", (filler("soc", 11) ++ boiler ++ filler("sod", 9)).mkString(" ")),
      (3L, "A", (filler("soe", 6) ++ boiler ++ filler("sof", 7)).mkString(" ")),
      (4L, "C", (filler("sog", 9) ++ intra ++ filler("soh", 4)).mkString(" ")),
      (5L, "C", (filler("soi", 5) ++ intra ++ filler("soj", 8)).mkString(" ")),
      (6L, "D", filler("sok", 40).mkString(" ")))
      .toDF("doc_id", "source", "text")
    val dir = tmpDir("originzone")
    docs.withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = ExactSubstr.spanOriginCard(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // A→A (doc 3 re-adopts A's own boilerplate), A→B (cross-source
    // adoption), C→C (within-source recycling); never B→A — direction
    // comes from the first copy, and D adopts nothing
    assert(got == Seq(
      ("A", "A", 1L, 1L, 16L),
      ("A", "B", 1L, 1L, 16L),
      ("C", "C", 1L, 1L, 12L)),
      s"origin matrix off: $got")
  }

  test("effective mixture mass discounts cross-source adoption only") {
    val boiler = (0 until 16).map(i => s"meboil$i")
    val intra = (0 until 12).map(i => s"meintr$i")
    val docs = Seq(
      (1L, "A", (filler("mea", 8) ++ boiler ++ filler("meb", 5)).mkString(" ")),
      (2L, "B", (filler("mec", 11) ++ boiler ++ filler("med", 9)).mkString(" ")),
      (3L, "A", (filler("mee", 6) ++ boiler ++ filler("mef", 7)).mkString(" ")),
      (4L, "C", (filler("meg", 9) ++ intra ++ filler("meh", 4)).mkString(" ")),
      (5L, "C", (filler("mei", 5) ++ intra ++ filler("mej", 8)).mkString(" ")),
      (6L, "D", filler("mek", 40).mkString(" ")))
      .toDF("doc_id", "source", "text")
    val dir = tmpDir("mixeffzone")
    docs.withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = ExactSubstr.mixtureEffectiveCard(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // only B adopted cross-source (A's boilerplate); A's own re-use and
    // C's within-source recycling transfer no credit
    assert(got == Seq(
      ("A", 58L, 0L, 58L),
      ("B", 36L, 16L, 20L),
      ("C", 50L, 0L, 50L),
      ("D", 40L, 0L, 40L)),
      s"effective-mass card off: $got")
  }

  test("the per-source card reconciles with the span frame") {
    val card = ExactSubstr.exactSubstrCard(spark, sfDir).collect()
    assert(card.nonEmpty)
    card.foreach { r =>
      val (total, dup, bp) = (r.getLong(2), r.getLong(5), r.getLong(7))
      assert(dup <= total, s"coverage exceeds corpus: $r")
      assert(bp == dup * 10000 / total, s"share_bp mismatch: $r")
      assert(r.getLong(6) <= dup, s"max span exceeds total coverage: $r")
      assert(r.getLong(3) <= r.getLong(1), s"docs_with_dups > docs: $r")
    }
  }

  test("dedup curve: driver recount per L, and dup share falls as L grows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val texts = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("text")).as[String].collect()
    val toksAll = texts.map(t =>
      t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1).toSeq)
    val got = ExactSubstr.dedupCurve(spark, sfDir).collect()
      .map(r => r.getAs[Int]("win_len") -> r).toMap
    assert(got.keySet == Set(4, 8, 16, 32))
    got.foreach { case (l, r) =>
      val wins = toksAll.filter(_.size >= l)
        .flatMap(ts => ts.sliding(l).map(_.mkString(" ")))
      val byContent = wins.groupBy(identity).map { case (_, g) => g.size.toLong }
      assert(r.getAs[Long]("total_windows") == wins.length.toLong, s"L=$l total")
      assert(r.getAs[Long]("distinct_contents") == byContent.size.toLong, s"L=$l uniq")
      assert(r.getAs[Long]("dup_contents") == byContent.count(_ > 1).toLong, s"L=$l dupc")
      assert(r.getAs[Long]("dup_windows") ==
        wins.length.toLong - byContent.size.toLong, s"L=$l dupw")
    }
    // two equal (L+k)-windows imply equal L-windows at the same
    // positions, so the non-first-copy COUNT is non-increasing in L on
    // any corpus (the share is not — short docs leave the denominator)
    Seq(4, 8, 16, 32).sliding(2).foreach { case Seq(a, b) =>
      assert(got(b).getAs[Long]("dup_windows") <= got(a).getAs[Long]("dup_windows"),
        s"dup window count rose from L=$a to L=$b")
    }
  }

  test("dedup curve: an all-short corpus drops the impossible L rows, both engines agree") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = tmpDir("shortcurve")
    Seq((1L, "five tokens only in here"), (2L, "five tokens only in here"),
        (3L, "another tiny document right here"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = ExactSubstr.dedupCurve(spark, dir).collect()
    // 5-token docs carry L=4 windows (2 each) and a single L=5 window —
    // nothing at 8/16/32: those rows must be ABSENT, not null
    assert(got.map(_.getAs[Int]("win_len")).toSeq == Seq(4))
    assert(got.head.getAs[Long]("total_windows") == 6L)
    assert(got.head.getAs[Long]("dup_windows") == 2L,
      "the duplicated doc's two windows are non-first copies")
  }

  test("span curve: reconciles with the per-source card at L=8 and stays defined when empty") {
    // at L=8 the global span curve must recount exactly what the
    // per-source C71 card sums — same machinery, one more granularity
    val card = ExactSubstr.exactSubstrCard(spark, sfDir).collect()
    val row8 = ExactSubstr.dedupCurveSpans(spark, sfDir).collect()
      .find(_.getAs[Int]("win_len") == 8).get
    assert(row8.getAs[Long]("docs") == card.map(_.getAs[Long]("docs")).sum)
    assert(row8.getAs[Long]("total_tokens") == card.map(_.getAs[Long]("total_tokens")).sum)
    assert(row8.getAs[Long]("docs_with_dups") == card.map(_.getAs[Long]("docs_with_dups")).sum)
    assert(row8.getAs[Long]("dup_spans") == card.map(_.getAs[Long]("dup_spans")).sum)
    assert(row8.getAs[Long]("dup_tokens") == card.map(_.getAs[Long]("dup_tokens")).sum)
    // a no-duplication corpus keeps all three L rows at zero (defined)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = tmpDir("spancurve")
    Seq((1L, (0 until 40).map(i => s"alpha$i").mkString(" ")),
        (2L, (0 until 40).map(i => s"beta$i").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val empty = ExactSubstr.dedupCurveSpans(spark, dir).collect()
    assert(empty.map(_.getAs[Int]("win_len")).toSeq == Seq(4, 8, 16))
    empty.foreach { r =>
      assert(r.getAs[Long]("dup_spans") == 0L && r.getAs[Long]("share_bp") == 0L, s"$r")
    }
  }
}
