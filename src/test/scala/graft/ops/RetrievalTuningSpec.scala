package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C99 — LSH banding-parameter tuning card. */
class RetrievalTuningSpec extends SparkSpec {
  import spark.implicits._

  /** The capped construction mirrored driver-side; maxBand=MaxValue is
    * the pure (uncapped) construction the nesting theorem governs. */
  private def candidatesFor(bands: Int, rows: Int, dir: String,
      maxBand: Int = 64): Set[(Long, Long)] = {
    val sig = Dedup.minhashSignature(
      Dedup.shingleFrame(graft.sources.Tables(spark, dir, "documents"),
        "doc_id", "text", 3), "doc_id", 16)
    val bnd = Dedup.lshBands(sig, "doc_id", bands, rows)
    val hot = bnd.groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("m")).where(col("m") > maxBand)
      .select(col("band_idx"), col("band_key"))
    val kept = bnd.join(hot, Seq("band_idx", "band_key"), "left_anti")
    val a = kept.select(col("doc_id").as("doc_a"), col("band_idx"), col("band_key"))
    val b = kept.select(col("doc_id").as("doc_b"), col("band_idx"), col("band_key"))
    a.join(b, Seq("band_idx", "band_key")).where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
      .as[(Long, Long)].collect().toSet
  }

  test("card recounts from first principles at sf0.001") {
    val truth = Dedup.jaccardPairs(
        graft.sources.Tables(spark, sfDir, "documents"), "doc_id", "text")
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val got = DedupQueries.dedupMinhashTuning(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band")) -> r).toMap
    assert(got.keySet == DedupQueries.TuningConfigs.toSet)
    DedupQueries.TuningConfigs.foreach { case (b, r) =>
      val cand = candidatesFor(b, r, sfDir)
      val row = got((b, r))
      val hits = (cand intersect truth).size.toLong
      assert(row.getAs[Long]("candidates") == cand.size.toLong, s"config ${(b, r)}")
      assert(row.getAs[Long]("hits") == hits, s"config ${(b, r)}")
      assert(row.getAs[Long]("true_pairs") == truth.size.toLong)
      if (cand.nonEmpty)
        assert(row.getAs[Long]("precision_bp") == hits * 10000 / cand.size)
      if (truth.nonEmpty)
        assert(row.getAs[Long]("recall_bp") == hits * 10000 / truth.size)
    }
  }

  test("stricter banding gives nested candidate sets (the S-curve chain theorem)") {
    // a shared 2r-row band implies both r-row halves are shared, so each
    // config's candidate set contains the next stricter one's — for ANY
    // corpus, not just this one (the UNCAPPED construction; the hot-band
    // cap is an orthogonal reported exclusion)
    val chain = DedupQueries.TuningConfigs.map { case (b, r) =>
      candidatesFor(b, r, sfDir, maxBand = Int.MaxValue) }
    chain.zip(chain.tail).foreach { case (looser, stricter) =>
      assert(stricter.subsetOf(looser), "candidate sets must be nested down the ladder")
    }
    assert(chain.head.nonEmpty, "the loosest banding must surface candidates at sf0.001")
  }

  test("recall is monotone non-increasing and hits are bounded on the published card") {
    val rows = DedupQueries.dedupMinhashTuning(spark, sfDir).collect()
    assert(rows.length == DedupQueries.TuningConfigs.length)
    // card is ordered loosest (16x1) -> strictest (2x8)
    assert(rows.map(_.getAs[Int]("bands")).toSeq == Seq(16, 8, 4, 2))
    val recalls = rows.map(_.getAs[Long]("recall_bp"))
    assert(recalls.zip(recalls.tail).forall { case (x, y) => x >= y },
      "nested candidates imply non-increasing recall down the ladder")
    rows.foreach { r =>
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("candidates"))
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("true_pairs"))
    }
  }

  test("hot-band cap: a planted mega-cluster is excluded and REPORTED, not enumerated") {
    val dir = tmpDir("lshhot")
    val dupText = (1 to 40).map(i => s"dup$i").mkString(" ")
    // 100 identical docs: every band of every config groups them (m=100
    // > 64) — uncapped, each config would enumerate 4950 pairs
    val rows = (0L until 100L).map(i => (i, dupText)) :+
      (200L, (1 to 40).map(i => s"solo$i").mkString(" "))
    rows.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = DedupQueries.dedupMinhashTuning(spark, dir).collect()
    got.foreach { r =>
      assert(r.getAs[Long]("hot_bands") >= 1,
        s"config ${(r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band"))} must report the hot cluster")
      assert(r.getAs[Long]("candidates") == 0L,
        "the mega-cluster must be excluded from the pair join, not enumerated")
      assert(r.getAs[Long]("hot_band_docs") >= 100L)
      // the truth side (df-capped jaccard) still counts the real pairs —
      // the card shows exactly what the cap traded away
      assert(r.getAs[Long]("true_pairs") == 100L * 99L / 2L)
    }
    // cap lifted (maxBand over the cluster size) restores the uncapped pairs
    val uncapped = DedupQueries.dedupMinhashTuning(spark, dir, maxBand = 1000).collect()
    uncapped.foreach { r =>
      assert(r.getAs[Long]("hot_bands") == 0L)
      assert(r.getAs[Long]("candidates") == 100L * 99L / 2L)
    }
  }

  test("a planted near-dup pair survives every banding; unrelated docs never pair") {
    val dir = tmpDir("lshtune")
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 40) "changed" else s"tok$i").mkString(" ")
    (Seq(
      (5L, base), (6L, nearDup),
      (7L, (100 to 140).map(i => s"other$i").mkString(" ")),
      (8L, (200 to 240).map(i => s"third$i").mkString(" "))
    )).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = DedupQueries.dedupMinhashTuning(spark, dir).collect()
    got.foreach { r =>
      // (5,6) share 37 of 43 union shingles (jaccard ~0.86): true pair;
      // identical docs' signatures agree on every hash, near-identical on
      // most — at minimum the loosest banding must catch it, and NO
      // banding may pair the disjoint-vocabulary docs
      assert(r.getAs[Long]("true_pairs") == 1L)
      assert(r.getAs[Long]("candidates") == r.getAs[Long]("hits"),
        "disjoint-vocabulary docs share no minhash, so every candidate is the true pair")
    }
    val loosest = got.find(_.getAs[Int]("bands") == 16).get
    assert(loosest.getAs[Long]("hits") == 1L)
    assert(loosest.getAs[Long]("recall_bp") == 10000L)
  }
}
