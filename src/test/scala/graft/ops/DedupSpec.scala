package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.sources.Tables(spark, sfDir, "documents")

  test("Text.fingerprint is word-order invariant, contentHash is not") {
    val df = Seq(
      (1L, "spark makes joins fast"),
      (2L, "fast joins makes   SPARK"), // same token set, different order
      (3L, "something else entirely")).toDF("id", "text")
    val fp = df.select(Text.fingerprint(col("text"))).as[String].collect()
    assert(fp(0) == fp(1) && fp(0) != fp(2))
    val ch = df.select(Text.contentHash(col("text"))).as[String].collect()
    assert(ch(0) != ch(1))
  }

  test("shingles produce n-grams and tolerate short docs") {
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("id", "text")
    val sh = df.select(col("id"), Dedup.shingles(col("text"), 3).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(1L) == Seq("a b c", "b c d"))
    assert(sh(2L).isEmpty, "doc shorter than n yields no shingles, not an error")
  }

  test("native shingles match the higher-order-function spelling") {
    val toks = Text.tokens(col("text"))
    val grams = transform(sequence(lit(0), size(toks) - 3),
      i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2),
        element_at(toks, i + 3)))
    val builtin = when(size(toks) >= 3, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
    val mismatch = docs
      .select(Dedup.shingles(col("text"), 3).as("a"), builtin.as("b"))
      .where(not(col("a") === col("b")))
      .count()
    assert(mismatch == 0, "native and built-in shingle sets must agree on every doc")
  }

  test("jaccardPairs finds planted near-dups and respects the threshold") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text").collect()
    assert(pairs.nonEmpty, "testdata contains planted near-dup pairs")
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.5))
    assert(pairs.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
  }

  test("minhash LSH candidates cover the high-Jaccard pairs") {
    val jac = Dedup.jaccardPairs(docs, "doc_id", "text")
      .where(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(jac.nonEmpty)
    val recall = jac.intersect(cand).size.toDouble / jac.size
    assert(recall >= 0.9, s"LSH recall $recall on >=0.9-Jaccard pairs (4 bands x 4 rows)")
  }

  test("capDocFrequency drops hot shingles") {
    val hot = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y")).toDF("doc_id", "s")
    val kept = Dedup.capDocFrequency(hot, maxDf = 2).select("s").as[String].collect()
    assert(kept.toSet == Set("y"))
  }

  test("capDocFrequency survives a synthetic hot shingle without a window straggler") {
    // one boilerplate shingle in EVERY doc (the 100-TB skew case), plus
    // per-doc unique shingles that must all survive the cap
    val n = 5000
    val frame = spark.range(n).selectExpr("id AS doc_id", "'hot hot hot' AS s")
      .unionAll(spark.range(n).selectExpr("id AS doc_id", "concat('u', id) AS s"))
    val capped = Dedup.capDocFrequency(frame, maxDf = 100)
    assert(capped.count() == n, "all unique shingles kept, the hot one dropped")
    assert(capped.where(col("s") === "hot hot hot").count() == 0)
    // plan shape: partial-agg discovery + broadcast anti-join; NO window
    // over s (a count-window buffers the whole hot group in one task)
    val plan = capped.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"df-cap must not window over s:\n$plan")
    assert(plan.contains("LeftAnti"), "hot shingles must be anti-joined away")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "the hot set must be broadcast, not shuffled")
  }

  test("native simhash equals the exploded 60-aggregate spelling") {
    val tok = docs.select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
    val bitSums = (0 until 60).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"b$i"))
    val withSums = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val hash = (0 until 60).map(i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((x, y) => x + y)
    val builtin = withSums.select(col("doc_id"), hash.as("simhash"))
      .as[(Long, Long)].collect().toMap
    val native = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(native == builtin, "native SimHash64 must reproduce the exploded spelling")
  }

  test("dedup_incremental: flags recount via independent plans, non-vacuous") {
    val rep = DedupQueries.dedupIncremental(spark, sfDir)
    val rows = rep.collect()
    assert(rows.nonEmpty)
    // non-vacuous at the smallest SF: the reorder and band faces fire
    def tot(c: String) = rows.map(_.getAs[Long](c)).sum
    assert(tot("dup_reorder") > 0, "planted reordered copies straddle the split")
    assert(tot("dup_near") > 0, "near-dup candidates straddle the split")
    assert(tot("new_docs") > 0)
    // ground truth for the band face from a DIFFERENT plan: the full C3
    // pair emitter, filtered to pairs crossing the batch split
    val isNew = (id: Long) => id % 5 == 4
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val nearTruth = pairs.flatMap { case (a, b) =>
      (if (isNew(a) && !isNew(b)) Seq(a) else Nil) ++
        (if (isNew(b) && !isNew(a)) Seq(b) else Nil)
    }.toSet
    assert(tot("dup_near") == nearTruth.size.toLong,
      "semi-join band probe must equal the pair-emitter ground truth")
    // exact + reorder ground truth driver-side from the keyed frame
    val keyed = docs.select(col("doc_id"),
        Text.contentHash(col("text")).as("h"), Text.fingerprint(col("text")).as("fp"))
      .as[(Long, String, String)].collect()
    val exH = keyed.filter(k => !isNew(k._1)).map(_._2).toSet
    val exFp = keyed.filter(k => !isNew(k._1)).map(_._3).toSet
    val inc = keyed.filter(k => isNew(k._1))
    assert(tot("dup_exact") == inc.count(k => exH(k._2)).toLong)
    assert(tot("dup_reorder") == inc.count(k => exFp(k._3)).toLong)
    assert(tot("incoming_docs") == inc.length.toLong)
    // per-source accounting: new_docs = incoming with NO flag, so the
    // flagged count per the report can never exceed incoming
    rows.foreach { r =>
      assert(r.getAs[Long]("new_docs") <= r.getAs[Long]("incoming_docs"))
    }
    val again = DedupQueries.dedupIncremental(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "deterministic across runs")
  }

  test("simhash pairs are within the Hamming bound and deterministic") {
    val pairs = Dedup.simhashCandidates(docs, "doc_id", "text").collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Int]("hamming") <= 3))
    // identical text => identical simhash
    val twin = Seq((1L, "spark shuffles data fast"), (2L, "spark shuffles data fast"))
      .toDF("doc_id", "text")
    val sigs = Dedup.simhash(twin, "doc_id", "text")
      .select("simhash").as[Long].collect()
    assert(sigs(0) == sigs(1))
  }

  test("duplicated-span report: invariants hold and a planted span is found whole") {
    val rep = TextQueries.textDupSpans(spark, sfDir).collect()
    assert(rep.length == 20)
    rep.foreach { r =>
      val (spans, mass, bp) = (r.getAs[Long]("dup_spans"),
        r.getAs[Long]("dup_token_mass"), r.getAs[Long]("share_bp"))
      assert(mass >= spans * 8, "every span covers at least L=8 tokens")
      assert(bp >= 0 && bp <= 10000)
      assert(r.getAs[Long]("docs_with_dups") <= 25, "docs per source at sf0.001")
    }
    assert(rep.exists(_.getAs[Long]("dup_spans") > 0), "corpus has recurring spans")

    // planted case: a 12-token chunk shared by two docs inside otherwise
    // unique text must surface as ONE maximal span of mass 12 per doc
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    def noise(tag: String) = (1 to 10).map(i => s"$tag$i").mkString(" ")
    val planted = Seq(
      (1L, s"${noise("a")} $shared ${noise("b")}", "s1"),
      (2L, s"${noise("c")} $shared ${noise("d")}", "s2"),
      (3L, noise("e") + " " + noise("f"), "s3"))
      .toDF("doc_id", "text", "source")
    // run the same operator over the planted frame via a temp view swap:
    // textDupSpans reads Tables(dir)/documents, so recount its core here
    val toks = planted.select(col("doc_id"), col("source"),
      Text.tokens(col("text")).as("ts"))
    val grams = toks.select(col("doc_id"), col("source"),
        posexplode(transform(sequence(lit(1), size(col("ts")) - 7),
          i => md5(concat_ws(" ", slice(col("ts"), i, lit(8)))))).as(Seq("p0", "h")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("h"))
    val dup = grams.withColumn("c",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .where(col("c") > 1)
    val spans = dup.withColumn("grp", col("pos") -
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("pos"))))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("s"), max(col("pos")).as("e"))
      .select(col("doc_id"), (col("e") - col("s") + 8).as("mass"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(spans == Seq((1L, 12L), (2L, 12L)),
      s"the planted 12-token span must merge to one 12-mass island per doc: $spans")
  }

  test("winnow fingerprints: driver recount, sane density, pairs found") {
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h12(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(12), 16)
    }
    var nShingles = 0L
    val sel = texts.map { case (id, text) =>
      val w = text.toLowerCase.replaceAll("\\s+", " ").trim.split(' ')
      val hs = w.sliding(3).filter(_.length == 3).map(g => h12(g.mkString(" "))).toVector
      nShingles += hs.length
      id -> hs.zipWithIndex.collect { case (h, i)
        if h == hs.slice(math.max(0, i - 4), i + 5).min => h }.toSet
    }.toMap
    val df = sel.toSeq.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val kept = sel.view.mapValues(_.filter(df(_) <= 50)).toMap
    val want = (for {
      (a, ha) <- kept.toSeq; (b, hb) <- kept.toSeq if a < b
      shared = (ha intersect hb).size if shared >= 3
    } yield (a, b) -> shared.toLong).toMap
    val got = DedupQueries.dedupWinnow(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty && got == want)
    // local-min-of-9 selection keeps roughly 1/9 of positions
    val density = sel.values.map(_.size.toLong).sum.toDouble / nShingles
    assert(density > 0.05 && density < 0.25, s"fingerprint density $density")
  }

  test("dedup_edit: driver DP recount, threshold splits, subset of candidates") {
    def lev(a: String, b: String): Int = {
      val (n, m) = (a.length, b.length)
      var prev = Array.tabulate(m + 1)(identity)
      var cur = new Array[Int](m + 1)
      for (i <- 1 to n) {
        cur(0) = i
        for (j <- 1 to m) {
          val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
          cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        }
        val t = prev; prev = cur; cur = t
      }
      prev(m)
    }
    val norm = docs.select(col("doc_id"), Text.normalized(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(cand.nonEmpty)
    val want = cand.flatMap { case (a, b) =>
      val d = lev(norm(a), norm(b)).toLong
      val ml = math.max(norm(a).length, norm(b).length).toLong
      if (d * 1000 <= ml * 25) Some((a, b) -> (d, ml)) else None
    }.toMap
    val got = DedupQueries.dedupEdit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == want, "Spark levenshtein confirm diverged from the driver DP")
    // the threshold must actually discriminate at this SF: some candidates
    // confirm, some are rejected — otherwise the confirm stage is vacuous
    assert(got.nonEmpty, "no candidate confirmed (threshold too tight)")
    assert(got.size < cand.length, "every candidate confirmed (threshold too loose)")
  }

  test("quality keeper: argmax within each cluster, non-vacuously different from min-id") {
    val keepers = DedupQueries.dedupKeeperQuality(spark, sfDir).collect()
    assert(keepers.nonEmpty)
    val clusters = DedupQueries.dedupCluster(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
      .filter(_._2.size >= 2)
    assert(keepers.map(_.getLong(0)).toSet == clusters.keySet,
      "one keeper row per multi-member cluster")
    val q = TextQueries.qualityScores(spark, sfDir)
      .select(col("doc_id"), col("q")).as[(Long, Double)].collect().toMap
    keepers.foreach { r =>
      val (cid, keeper) = (r.getLong(0), r.getAs[Long]("keeper_doc"))
      val members = clusters(cid)
      assert(members.contains(keeper))
      // argmax with doc_id tie-break, driver-recounted
      val want = members.toSeq.sortBy(d => (-q(d), d)).head
      assert(keeper == want, s"cluster $cid: keeper $keeper vs recount $want")
      assert((r.getAs[Int]("beats_min_id") == 1) == (keeper != cid))
      assert(r.getAs[Long]("dropped") == members.size - 1)
    }
    assert(keepers.count(_.getAs[Int]("beats_min_id") == 1) > 0,
      "quality must beat min-id somewhere, or the operator is vacuous")
  }

  test("source matrix cells recount from the pair list and conserve the pair total") {
    val pairs = DedupQueries.dedupMinhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val srcOf = docs.select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = pairs.groupBy { case (a, b) =>
        val (sa, sb) = (srcOf(a), srcOf(b))
        (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
      }.view.mapValues(_.length.toLong).toMap
    val got = DedupQueries.dedupSourceMatrix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty && got == want)
    assert(got.values.sum == pairs.length.toLong, "matrix must conserve the pair total")
  }

  test("dedup_bloom: bloom+confirm equals the exact probe, candidates bound the FP margin") {
    val confirmed = DedupQueries.dedupBloom(spark, sfDir)
      .collect().map(_.getLong(0)).toSeq
    // driver recount of the bloom-free semantics
    val keyed = docs.select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val corpusFps = keyed.collect { case (id, fp) if id % 5 != 4 => fp }.toSet
    val want = keyed.collect {
      case (id, fp) if id % 5 == 4 && corpusFps(fp) => id
    }.sorted.toSeq
    assert(confirmed == want, "bloom+confirm diverged from the exact membership probe")
    assert(confirmed.nonEmpty, "vacuous: no cross-split duplicates at this SF")
    // the bloom can never false-negative: every confirmed dup is a candidate;
    // and it must actually prune — candidates far below the batch size
    val cand = DedupQueries.dedupBloomCandidates(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val batchSize = keyed.count(_._1 % 5 == 4)
    assert(want.forall(cand), "a true duplicate was bloom-negative (impossible for a bloom)")
    assert(cand.size < batchSize,
      s"bloom pruned nothing: ${cand.size} candidates of $batchSize batch docs")
    // FP margin: at est 2^20 items the FPP is far below 1%, so candidates
    // should be dups plus at most a handful of false positives
    assert(cand.size - want.size <= math.max(2, batchSize / 100),
      s"false-positive margin too large: ${cand.size - want.size}")
  }

  test("split-leakage audit: full driver recount; cluster-keyed folds zero every straddle") {
    // driver-side replicas of the content-keyed machinery
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def fold(id: Long): String = {
      val b = md5hex(s"split|$id").substring(0, 6)
      if (b < Sample.hexThreshold(0.8)) "train"
      else if (b < Sample.hexThreshold(0.9)) "val" else "test"
    }
    val rows = docs.select($"doc_id", $"text").as[(Long, String)].collect()
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    val hOf = rows.map { case (id, t) =>
      id -> md5hex(Option(t).getOrElse("").toLowerCase.replaceAll("\\s+", " ").trim)
    }.toMap
    // union-find over minhash pairs + exact star edges
    val parent = scala.collection.mutable.Map(rows.map(r => r._1 -> r._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pairs.foreach { case (a, b) => union(a, b) }
    rows.groupBy(r => hOf(r._1)).values.foreach { g =>
      val ids = g.map(_._1).sorted
      ids.tail.foreach(union(ids.head, _))
    }
    // min-label components == union-find minima here, but the operator
    // uses Cluster.connectedComponents — recount its ids to be exact
    val clusterOf = rows.map(r => r._1 -> find(r._1)).toMap
    def spineKey(a: String, b: String) = if (a < b) (a, b) else (b, a)
    def expected(foldOf: Long => String) = {
      val nd = pairs.filter { case (a, b) => foldOf(a) != foldOf(b) }
        .groupBy { case (a, b) => spineKey(foldOf(a), foldOf(b)) }
        .view.mapValues(_.length.toLong).toMap
      val ex = rows.groupBy(r => hOf(r._1)).values.flatMap { g =>
        val byF = g.groupBy(r => foldOf(r._1)).view.mapValues(_.size.toLong).toMap
        for {
          a <- byF.keys; b <- byF.keys; if a < b
        } yield (a, b) -> byF(a) * byF(b)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      (nd, ex)
    }
    val (ndN, exN) = expected(fold)
    val (ndC, exC) = expected(id => fold(clusterOf(id)))
    val got = DedupQueries.dedupSplitLeakage(spark, sfDir).collect()
    assert(got.length == 3)
    got.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getAs[Long]("naive_exact_pairs") == exN.getOrElse(k, 0L), s"$k exact")
      assert(r.getAs[Long]("naive_neardup_pairs") == ndN.getOrElse(k, 0L), s"$k nd")
      assert(r.getAs[Long]("clustered_exact_pairs") == exC.getOrElse(k, 0L), s"$k exc")
      assert(r.getAs[Long]("clustered_neardup_pairs") == ndC.getOrElse(k, 0L), s"$k ndc")
      // the theorem: every duplicate relation is an edge, clusters land
      // whole, so the cluster-keyed counts are structurally zero
      assert(r.getAs[Long]("clustered_exact_pairs") == 0L, s"$k: clustered exact leak")
      assert(r.getAs[Long]("clustered_neardup_pairs") == 0L, s"$k: clustered nd leak")
    }
    // non-vacuous: the naive policy must actually leak on this corpus
    assert(got.map(_.getAs[Long]("naive_neardup_pairs")).sum > 0L,
      "no naive near-dup straddle — the audit demonstrates nothing")
  }
}
