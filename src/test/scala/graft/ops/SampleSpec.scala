package graft.ops

import graft.SparkSpec

class SampleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1L to 1000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
    .toDF("id", "grp")

  test("sampling is a pure function of the id — reruns are identical") {
    val w = Map("a" -> 0.5, "b" -> 1.5)
    val r1 = Sample.sampleMixture(df, "id", "grp", w)
      .select("id", "copy_idx").as[(Long, Int)].collect().sorted.toSeq
    val r2 = Sample.sampleMixture(df.repartition(7), "id", "grp", w)
      .select("id", "copy_idx").as[(Long, Int)].collect().sorted.toSeq
    assert(r1 == r2, "partitioning must not change the sample")
    assert(r1.nonEmpty)
  }

  test("integer part of the weight guarantees copies; fraction adds at the rate") {
    val got = Sample.sampleMixture(df, "id", "grp", Map("a" -> 2.5, "b" -> 0.25))
      .groupBy($"id", $"grp").agg(org.apache.spark.sql.functions.max($"copies").as("c"))
      .as[(Long, String, Int)].collect()
    val aCopies = got.filter(_._2 == "a").map(_._3)
    assert(aCopies.forall(c => c == 2 || c == 3), "w=2.5 yields 2 or 3 copies")
    val a3 = aCopies.count(_ == 3).toDouble / 500
    assert(math.abs(a3 - 0.5) < 0.1, s"fraction rate off: $a3")
    val bKept = got.count(_._2 == "b").toDouble / 500
    assert(math.abs(bKept - 0.25) < 0.1, s"w=0.25 keep rate off: $bKept")
    // copy_idx materializes every copy 1..copies
    val rows = Sample.sampleMixture(df, "id", "grp", Map("a" -> 2.0, "b" -> 0.0))
      .select("grp", "copy_idx").as[(String, Int)].collect()
    assert(rows.forall(_._1 == "a"), "weight 0 drops the group entirely")
    assert(rows.count(_._2 == 1) == 500 && rows.count(_._2 == 2) == 500)
  }

  test("splits partition the corpus deterministically at ~the cut ratios") {
    import org.apache.spark.sql.functions.col
    val f1 = df.withColumn("fold", Sample.splitColumn(col("id"), Sample.DemoCuts, "test"))
      .select("id", "fold").as[(Long, String)].collect().toMap
    val f2 = df.repartition(13)
      .withColumn("fold", Sample.splitColumn(col("id"), Sample.DemoCuts, "test"))
      .select("id", "fold").as[(Long, String)].collect().toMap
    assert(f1 == f2, "fold assignment must be partitioning-independent")
    assert(f1.size == 1000, "every row lands in exactly one fold")
    val frac = f1.values.groupBy(identity).view.mapValues(_.size / 1000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05, s"train frac: $frac")
    assert(math.abs(frac("val") - 0.1) < 0.04 && math.abs(frac("test") - 0.1) < 0.04,
      s"val/test frac: $frac")
  }

  test("groups without a weight use the default") {
    val kept = Sample.sampleMixture(df, "id", "grp", Map("a" -> 0.0), defaultWeight = 1.0)
      .select("grp").as[String].collect()
    assert(kept.forall(_ == "b") && kept.length == 500)
  }

  test("sample_mixture query: every tier behaves per its weight at sf0.001") {
    val rows = Sample.sampleMixtureQuery(spark, sfDir)
      .as[(Long, String, Int, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, src, copies, idx) =>
      val w = Sample.DemoWeights(src)
      assert(copies >= math.floor(w).toInt && copies <= math.ceil(w).toInt,
        s"$src copies=$copies outside [floor,ceil] of $w")
      assert(idx >= 1 && idx <= copies)
    }
    // per-doc rows appear exactly `copies` times
    rows.groupBy(r => (r._1, r._2)).foreach { case ((id, _), g) =>
      assert(g.map(_._4).sorted.toSeq == (1 to g.head._3).toSeq, s"doc $id copy set")
    }
  }

  test("mixture plan: shares recount from the corpus and the factor is target/natural") {
    val rows = Sample.mixturePlan(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val docTotal = rows.map(_._2).sum
    val tokTotal = rows.map(_._3).sum
    rows.foreach { case (src, docs, tokens, nat, tgt, fac) =>
      assert(nat == tokens * 10000 / tokTotal, s"$src natural_bp")
      assert(tgt == docs * 10000 / docTotal, s"$src target_bp")
      assert(fac == tgt * 10000 / nat, s"$src factor_bp")
    }
    // the plan is non-vacuous: sources differ in verbosity, so at least
    // one source must be re-weighted away from 1.0 (10000 bp)
    assert(rows.exists(r => math.abs(r._6 - 10000L) > 100),
      "every factor within 1% of 1.0 — the planner has nothing to plan")
  }

  test("temperature re-weighting: T=1 identity, large T flattens, budget preserved") {
    val counts = Map("big" -> 8000L, "mid" -> 1500L, "small" -> 500L)
    val n = counts.values.sum

    // T=1: natural proportions — every doc keeps weight 1
    Sample.temperatureWeights(counts, 1.0, n).values.foreach(w =>
      assert(math.abs(w - 1.0) < 1e-12))

    // larger T: the small group's share must rise monotonically
    val shares = Seq(1.0, 2.0, 5.0, 100.0).map { t =>
      val w = Sample.temperatureWeights(counts, t, n)
      w("small") * counts("small") / n
    }
    assert(shares.zip(shares.tail).forall { case (a, b) => a < b },
      s"small-group share must grow with T: $shares")
    // T -> inf: shares approach uniform (1/3 each)
    assert(math.abs(shares.last - 1.0 / 3) < 0.01)

    // budget neutrality at every T: expected docs == budget
    for (t <- Seq(0.5, 1.0, 3.0)) {
      val w = Sample.temperatureWeights(counts, t, n)
      val expected = counts.map { case (g, c) => w(g) * c }.sum
      assert(math.abs(expected - n) < 1e-6, s"T=$t expected $expected docs")
    }

    // composes with the mixture sampler: realized output size tracks the
    // budget (copies are floor(w) + a coin at frac(w))
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val real = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val w = Sample.temperatureWeights(real, 2.0, real.values.sum)
    val out = Sample.sampleMixture(docs, "doc_id", "source", w).count()
    assert(math.abs(out - real.values.sum.toDouble) / real.values.sum < 0.15,
      s"realized $out vs budget ${real.values.sum}")
  }

  test("stratified sample: exact per-group counts, stable under repartitioning") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val got = Sample.sampleStratified(docs, "doc_id", "source", 20)
      .select("doc_id", "source").as[(Long, String)].collect().toSet
    val sizes = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    got.groupBy(_._2).foreach { case (src, members) =>
      assert(members.size == math.min(20L, sizes(src)),
        s"source $src must contribute exactly min(20, its size)")
    }
    // content-keyed coin: the same documents win regardless of layout
    val reshuffled = Sample.sampleStratified(
        docs.repartition(17), "doc_id", "source", 20)
      .select("doc_id", "source").as[(Long, String)].collect().toSet
    assert(reshuffled == got, "sample must be layout-independent")
    // per-group top-k plans the partial WindowGroupLimit (map-side prune)
    val df = Sample.sampleStratifiedQuery(spark, sfDir)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"stratified top-k must prune map-side:\n$plan")
  }

  test("per-source cap: exact accounting, coin-ordered survivors, rerun-stable") {
    import org.apache.spark.sql.functions.{col, sum => fsum}
    val rows = Sample.sampleCapSourceQuery(spark, sfDir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (d, k, dr) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(k <= 15 && k + dr == d, s"cap accounting broken in $r")
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 10000)
    }
    // survivors are the lowest-coin docs: recount one source by hand
    val d = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.concat_ws("",
            org.apache.spark.sql.functions.lit("cap|"),
            col("doc_id").cast("string"))).substr(1, 6).as("coin"))
      .where(col("source") === "src0")
      .collect().map(r => (r.getLong(0), r.getString(2))).sortBy(t => (t._2, t._1))
    val keptIds = d.take(15).map(_._1).toSet
    val tok = graft.sources.Tables(spark, sfDir, "documents")
      .where(col("source") === "src0")
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(Text.tokens(col("text"))).cast("long").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantKeptTokens = keptIds.toSeq.map(tok).sum
    val src0 = rows.find(_.getString(0) == "src0").get
    assert(src0.getLong(4) == wantKeptTokens, "kept token mass recount mismatch")
  }

  test("weighted sample: E-S recount, length bias real, repartition-stable") {
    import org.apache.spark.sql.functions.{col, size => fsize}
    val rows = Sample.sampleWeightedQuery(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.length == 100)
    // driver recount with the identical formula
    val all = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), fsize(Text.tokens(col("text"))).cast("long").as("tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def coin(id: Long): Long = {
      val hex = md.digest(s"wsample|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      java.lang.Long.parseLong(hex, 16)
    }
    val want = all.map { case (id, tok) =>
        (id, tok, math.pow((coin(id) + 1) / 16777216.0, 1.0 / tok))
      }.sortBy { case (id, _, key) => (-key, id) }.take(100)
      .map { case (id, tok, _) => (id, tok) }.sortBy(_._1).toSeq
    assert(rows.toSeq == want, "distributed top-k diverged from the E-S recount")
    // token-weighted draws must skew long: sample mean above corpus mean
    val sampleMean = rows.map(_._2).sum.toDouble / rows.length
    val corpusMean = all.map(_._2).sum.toDouble / all.length
    assert(sampleMean > corpusMean,
      s"no length bias: sample mean $sampleMean <= corpus mean $corpusMean")
    // the coin is content-keyed, so physical layout cannot matter
    val again = Sample.sampleWeightedQuery(spark, sfDir).collect().map(_.getLong(0)).toSeq
    assert(again == rows.map(_._1).toSeq)
  }

  test("packing matches the per-shard reference packer exactly") {
    // deterministic synthetic loads incl. docs larger than the budget
    val docs = (0L until 500L).map(i => (i, 1L + (i * 37L) % 300L))
      .toDF("doc_id", "tok")
    val budget = 256L
    val got = Sample.packSequences(docs, "doc_id", "tok", budget, shards = 8)
      .select("doc_id", "shard", "seq_id").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // reference: greedy exclusive-cumsum packer per shard, in plain Scala
    val expected = (0L until 500L).map(i => (i, 1L + (i * 37L) % 300L))
      .groupBy(_._1 % 8).flatMap { case (shard, ds) =>
        var cum = 0L
        ds.sortBy(_._1).map { case (id, tok) =>
          val bin = cum / budget; cum += tok; id -> ((shard, bin))
        }
      }
    assert(got == expected, "every doc must land in the reference bin")
  }

  test("packing is layout-independent and conserves tokens") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select($"doc_id",
        org.apache.spark.sql.functions.size(Text.tokens($"text")).cast("long").as("tok"))
    val a = Sample.packSequences(docs, "doc_id", "tok", 256L, 16)
      .select("doc_id", "shard", "seq_id").as[(Long, Long, Long)].collect().toSet
    val b = Sample.packSequences(docs.repartition(13), "doc_id", "tok", 256L, 16)
      .select("doc_id", "shard", "seq_id").as[(Long, Long, Long)].collect().toSet
    assert(a == b, "packing must be keyed on doc_id only")
    val seqs = Sample.samplePackQuery(spark, sfDir)
      .select("tokens").as[Long].collect()
    val total = docs.agg(org.apache.spark.sql.functions.sum($"tok")).as[Long].head()
    assert(seqs.sum == total, "packing must conserve the token total")
    // contiguous-greedy contract: a sequence overruns the budget only by
    // its final document (every doc's EXCLUSIVE cumsum lies inside the bin)
    val perSeq = Sample.packSequences(docs, "doc_id", "tok", 256L, 16)
      .select("shard", "seq_id", "cum", "tok").as[(Long, Long, Long, Long)]
      .collect().groupBy(t => (t._1, t._2))
    perSeq.foreach { case ((sh, sq), rows) =>
      rows.foreach { case (_, _, cum, _) =>
        assert(cum / 256L == sq, s"doc with cum $cum outside bin ($sh,$sq)")
      }
    }
  }

  test("curriculum stages: quartile-balanced, difficulty-ordered, exhaustive") {
    val rows = Sample.sampleCurriculum(spark, sfDir)
      .select("stage", "docs", "tokens", "d_min", "d_max")
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3, 4), "all four stages present")
    val total = graft.sources.Tables(spark, sfDir, "documents").count()
    assert(rows.map(_._2).sum == total, "every document is staged exactly once")
    // stages are difficulty-ordered: band floors strictly ascend and
    // bands never overlap (max of stage k <= min of stage k+1)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 <= b._4, s"stage ${a._1} band overlaps ${b._1}: ${a._5} > ${b._4}")
    }
    // quartile balance: no stage is empty or holds more than half
    rows.foreach { case (st, docs, toks, _, _) =>
      assert(docs > 0 && docs <= total / 2 + 1, s"stage $st holds $docs of $total")
      assert(toks > 0)
    }
    val again = Sample.sampleCurriculum(spark, sfDir)
      .select("stage", "docs", "tokens", "d_min", "d_max")
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.toSeq == again.toSeq, "deterministic")
  }

  test("pack efficiency: exact per-length accounting and the padding/truncation crossover") {
    import org.apache.spark.sql.functions.{col, size}
    val toks = graft.sources.Tables(spark, sfDir, "documents")
      .select(size(graft.ops.Text.tokens(col("text"))).cast("long")).as[Long].collect()
    val got = Sample.packEfficiency(spark, sfDir).collect()
      .map(r => r.getAs[Int]("ctx_len") -> r).toMap
    assert(got.keySet == Set(128, 256, 512, 1024, 2048))
    got.foreach { case (l, r) =>
      val trunc = toks.map(t => math.max(t - l, 0L)).sum
      val slots = toks.map(t => (t + l - 1) / l * l).sum
      val total = toks.sum
      assert(r.getAs[Long]("docs") == toks.length.toLong)
      assert(r.getAs[Long]("total_tokens") == total)
      assert(r.getAs[Long]("oversize_docs") == toks.count(_ > l).toLong)
      assert(r.getAs[Long]("trunc_tokens") == trunc, s"L=$l")
      assert(r.getAs[Long]("trunc_bp") == trunc * 10000 / total)
      assert(r.getAs[Long]("pad_tokens") == slots - total)
      assert(r.getAs[Long]("pad_bp") == (slots - total) * 10000 / slots)
    }
    // the economics must be monotone: growing L never increases
    // truncation loss and never decreases padding waste
    val ls = Seq(128, 256, 512, 1024, 2048)
    ls.sliding(2).foreach { case Seq(a, b) =>
      assert(got(b).getAs[Long]("trunc_tokens") <= got(a).getAs[Long]("trunc_tokens"))
      assert(got(b).getAs[Long]("pad_tokens") >= got(a).getAs[Long]("pad_tokens"))
    }
  }
}
