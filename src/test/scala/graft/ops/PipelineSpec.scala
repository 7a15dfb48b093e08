package graft.ops

import graft.SparkSpec

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("cleanCorpus removes exact dups, near-dups and junk; keeps min ids") {
    val base = "spark shuffles data across the cluster and sorts every partition " * 8
    val docs = Seq(
      (1L, base),                       // keeper of exact cluster {1,2}
      (2L, base),                       // exact dup of 1
      (3L, base + "with one extra tail sentence appended here"), // near-dup of 1
      (4L, "an entirely different document about streaming watermarks " * 8),
      (5L, "x")                         // junk: fails the quality gate
    ).toDF("doc_id", "text")
    val (clean, stats) = Pipeline.cleanCorpus(docs)
    val kept = clean.select("doc_id").as[Long].collect().toSet
    assert(stats.input == 5 && stats.afterQuality == 4)
    assert(stats.afterExact == 3, "doc 2 is an exact dup of doc 1")
    assert(stats.afterNearDup == 2, "doc 3 is a minhash near-dup of doc 1")
    assert(kept == Set(1L, 4L), s"min-id keepers survive, got $kept")
  }

  test("cleanCorpus on real documents shrinks the planted-dup corpus") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val (_, stats) = Pipeline.cleanCorpus(docs)
    assert(stats.afterQuality <= stats.input)
    assert(stats.afterNearDup < stats.afterExact,
      "testdata's planted near-dup pairs must lose their non-keeper half")
  }

  test("clustered near-dup stage keeps exactly the component keepers") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val kept = Pipeline.dropNearDupsClustered(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    // reference: the connected-components keeper set over the same pairs
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val all = docs.select("doc_id").as[Long].collect().toSet
    // union-find on the driver (tiny graph)
    val parent = scala.collection.mutable.Map(all.map(x => x -> x).toSeq: _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val keepers = all.filter(x => find(x) == x)
    assert(kept == keepers, s"diff: ${(kept diff keepers) ++ (keepers diff kept)}")
    // and the clustered pass never keeps MORE than pair-greedy
    val greedy = Pipeline.dropNearDups(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept.subsetOf(greedy), "clustered keepers are a subset of greedy survivors")
  }

  test("score-keeper near-dup stage keeps the C70 keeper set, same coverage") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val st = graft.functions.TokenMarkerStats(col("text"))
    val nTok = col("st.ws_tokens").cast("double")
    val q = lit(0.4) * least(col("st.ws_tokens").cast("double") / 100.0, lit(1.0)) +
      lit(0.3) * least(col("st.stop").cast("double") / nTok * 10.0, lit(1.0)) +
      lit(0.3) * when((col("st.alpha_len").cast("double") / nTok).between(3.0, 8.0),
        1.0).otherwise(0.0)
    val kept = Pipeline.dropNearDupsByScore(
        docs.withColumn("st", st), "doc_id", "text", q)
      .select("doc_id").as[Long].collect().toSet
    // reference: C70's keeper per multi-member cluster + every singleton
    val keepers = DedupQueries.dedupKeeperQuality(spark, sfDir).collect()
      .map(_.getAs[Long]("keeper_doc")).toSet
    val clustered = DedupQueries.dedupCluster(spark, sfDir).collect()
      .filter(_.getAs[Long]("cluster_size") >= 2).map(_.getLong(0)).toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    val want = (all -- clustered) ++ keepers
    assert(kept == want,
      s"diff: ${(kept diff want) ++ (want diff kept)}")
    // same SURVIVOR COUNT as min-id clustering (one keeper per cluster),
    // different members where quality beats min-id
    val minId = Pipeline.dropNearDupsClustered(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept.size == minId.size && kept != minId)
  }

  test("exportTrainingData ships a fold-partitioned, leak-free corpus") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val out = java.nio.file.Files.createTempDirectory("graft_export").toString + "/corpus"
    val (stats, folds) = Pipeline.exportTrainingData(docs, out, Sample.DemoWeights)
    assert(stats.afterNearDup > 0 && folds.values.sum > 0)
    assert(folds.keySet.subsetOf(Set("train", "val", "test")))
    val back = spark.read.parquet(out)
    // fold dirs exist on disk and no doc_id appears in two folds
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == folds.keySet.map(f => s"fold=$f"), s"dirs: $dirs")
    val leaks = back.groupBy($"doc_id")
      .agg(org.apache.spark.sql.functions.countDistinct($"fold").as("nf"))
      .where($"nf" > 1).count()
    assert(leaks == 0, "a document must never straddle folds")
    // mixture copies survive the write (copy_idx materialized per row)
    assert(back.where($"copies" > 1).count() > 0, "epoch-repeated docs present")
  }

  test("observed fold counts equal a recount of the written files") {
    // the round-10 verdict replaced the write-then-re-read fold count
    // with Dataset.observe on the write; this pins the two paths equal
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val out = java.nio.file.Files.createTempDirectory("graft_obs").toString + "/corpus"
    val (_, folds) = Pipeline.exportTrainingData(docs, out, Sample.DemoWeights)
    val reread = spark.read.parquet(out).groupBy($"fold").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(folds == reread, s"observe: $folds vs re-read: $reread")
  }

  test("manifest: re-export is byte-identical and recounts from the shipped files") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val base = java.nio.file.Files.createTempDirectory("graft_manifest").toString
    val (stats, _) = Pipeline.exportTrainingData(docs, base + "/a", Sample.DemoWeights)
    Pipeline.exportTrainingData(docs, base + "/b", Sample.DemoWeights)
    val ma = spark.read.parquet(base + "/a_manifest").collect().map(_.toString).sorted.toSeq
    val mb = spark.read.parquet(base + "/b_manifest").collect().map(_.toString).sorted.toSeq
    assert(ma == mb, "re-exporting the same corpus must yield the identical manifest")
    // the manifest is a faithful account of the files on disk: rebuild
    // it from the written corpus and compare cell for cell
    val shipped = spark.read.parquet(base + "/a")
    val rebuilt = Pipeline.manifest(shipped, stats).collect().map(_.toString).sorted.toSeq
    assert(rebuilt == ma, "manifest must recount exactly from the shipped files")
    // and the funnel section carries the cleaning stats verbatim
    val funnel = spark.read.parquet(base + "/a_manifest")
      .where($"section" === "funnel")
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("docs")).toMap
    assert(funnel == Map("0_input" -> stats.input, "1_quality" -> stats.afterQuality,
      "2_exact" -> stats.afterExact, "3_neardup" -> stats.afterNearDup))
    // totals are the exact cell sums / XORs (folds × sources partition rows)
    val m = spark.read.parquet(base + "/a_manifest")
    val cells = m.where($"section" === "cell")
    val total = m.where($"section" === "total").collect().head
    val agg = cells.agg(sum($"docs"), sum($"n_rows"), sum($"tokens"),
      expr("bit_xor(content_hash)")).collect().head
    assert(total.getAs[Long]("docs") == agg.getLong(0) &&
      total.getAs[Long]("n_rows") == agg.getLong(1) &&
      total.getAs[Long]("tokens") == agg.getLong(2) &&
      total.getAs[Long]("content_hash") == agg.getLong(3))
  }

  test("decontamination stage: flagged docs never reach the export") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    // the benchmark IS five corpus docs verbatim (the worst-case leak)
    val bench = docs.where($"doc_id" < 5).select($"text")
    val kept = Pipeline.dropContaminated(docs, bench)
    val keptIds = kept.select($"doc_id").as[Long].collect().toSet
    // the leaked originals themselves are flagged (they share ALL their
    // bigrams with "the benchmark"), so they must be gone
    assert((0L until 5L).forall(!keptIds.contains(_)), "verbatim leaks must drop")
    // driver recount of the C23 rule
    val norm = (t: String) => t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1)
    val rows = docs.select($"doc_id", $"text").as[(Long, String)].collect()
    val benchGrams = rows.filter(_._1 < 5)
      .flatMap(r => norm(r._2).sliding(2).map(_.mkString(" "))).toSet
    val expectDrop = rows.filter { case (_, t) =>
      norm(t).sliding(2).map(_.mkString(" ")).toSet.count(benchGrams.contains) >= 3
    }.map(_._1).toSet
    assert(keptIds == rows.map(_._1).toSet.diff(expectDrop), "exactly the C23 rule")

    // threaded through the export: the shipped corpus shares <3 bigrams
    // per doc with the benchmark
    val out = java.nio.file.Files.createTempDirectory("graft_decon_export")
      .toString + "/corpus"
    val (_, folds) = Pipeline.exportTrainingData(docs, out, Sample.DemoWeights,
      benchmark = Some(bench))
    assert(folds.values.sum > 0)
    val shippedIds = spark.read.parquet(out)
      .select($"doc_id").distinct().as[Long].collect().toSet
    assert(shippedIds.intersect(expectDrop).isEmpty,
      "no contaminated doc may ship in any fold")

    // an eval frame whose text column is NOT named "text" (a real eval
    // set ships "question"/"prompt") threads through benchTextCol —
    // identical result, no analysis error
    val out2 = java.nio.file.Files.createTempDirectory("graft_decon_export2")
      .toString + "/corpus"
    val (_, folds2) = Pipeline.exportTrainingData(docs, out2, Sample.DemoWeights,
      benchmark = Some(bench.withColumnRenamed("text", "question")),
      benchTextCol = "question")
    assert(folds2 == folds, "renamed benchmark column must not change the export")
  }

  test("star member set == pair loser set (the round-15 dropNearDups swap, proven on data)") {
    import org.apache.spark.sql.functions.col
    // real gate documents (planted exact + near dups) PLUS a planted
    // hot cluster, so the equivalence is exercised on both shapes
    val base = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val seed = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val hot = (0 until 30).map { i =>
      val w = seed.split(" "); w(i % w.length) = "dup"
      (900000L + i, w.mkString(" "))
    }
    val docs = base.unionByName(hot.toDF("doc_id", "text"))
    val pairLosers = Dedup.minhashCandidates(docs, "doc_id", "text")
      .select(col("doc_b")).as[Long].collect().toSet
    val starMembers = Dedup.minhashStarEdges(docs, "doc_id", "text")
      .select(col("doc_b")).as[Long].collect().toSet
    assert(starMembers == pairLosers,
      "x is a non-min star member iff x is doc_b of some candidate pair — " +
        s"diff: ${(starMembers diff pairLosers) ++ (pairLosers diff starMembers)}")
    assert(pairLosers.nonEmpty, "non-vacuous: the corpus has near-dups")
  }
}
