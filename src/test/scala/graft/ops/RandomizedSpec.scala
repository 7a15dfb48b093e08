package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

/** Seeded randomized properties: the generic operators vs brute-force
  * in-memory references over adversarial random inputs (duplicate keys,
  * boundary times, delete/revive chains). Seeds are FIXED — failures
  * reproduce exactly. */
class RandomizedSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000)

  test("asofJoin equals the brute-force reference on random inputs") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 5) {
      val keys = 1L to 4L
      val rights = keys.flatMap { k =>
        // unique (k, t) per right row: tie semantics are exercised via
        // equal LEFT times instead
        rnd.shuffle((0L until 200L).toList).take(30).map(t => (k, t, rnd.nextInt(1000)))
      }
      val lefts = (1 to 60).map(i =>
        (keys(rnd.nextInt(keys.size)), rnd.nextInt(220).toLong, i.toLong))
      val rightDf = rights.map { case (k, t, v) => (k, ts(t), v) }.toDF("k", "rt", "rv")
      val leftDf = lefts.map { case (k, t, id) => (k, ts(t), id) }.toDF("k", "t", "lid")
      val got = AsofJoin.asofJoin(leftDf, rightDf, Seq("k"), "t", "rt")
        .select($"lid", $"rv").as[(Long, Option[Int])].collect().toMap
      lefts.foreach { case (k, t, id) =>
        val expect = rights.filter(r => r._1 == k && r._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
        assert(got(id) == expect, s"trial $trial, left $id (k=$k t=$t)")
      }
    }
  }

  test("withinWindow equals the brute-force reference on random inputs") {
    val rnd = new scala.util.Random(777)
    for (trial <- 1 to 5) {
      val w = 1 + rnd.nextInt(40)
      val lefts = (1 to 40).map(i => (rnd.nextInt(3).toLong, rnd.nextInt(300).toLong, i.toLong))
      val rights = (1 to 80).map(i => (rnd.nextInt(3).toLong, rnd.nextInt(300).toLong, 1000L + i))
      val got = RangeJoin.withinWindow(
          lefts.map { case (k, t, id) => (k, ts(t), id) }.toDF("k", "t", "lid"),
          rights.map { case (k, t, id) => (k, ts(t), id) }.toDF("k", "rt", "rid"),
          Seq("k"), "t", "rt", w.toLong)
        .select($"lid", $"rid").as[(Long, Long)].collect().toSet
      val expect = (for {
        (lk, lt, lid) <- lefts
        (rk, rt, rid) <- rights
        if lk == rk && rt > lt && rt <= lt + w
      } yield (lid, rid)).toSet
      assert(got == expect, s"trial $trial (w=$w): missing ${expect -- got}, extra ${got -- expect}")
    }
  }

  test("Merge.upsert equals a sequential fold of the changes on random inputs") {
    val rnd = new scala.util.Random(90125)
    for (trial <- 1 to 5) {
      val base = (1L to 20L).map(k => (k, s"b$k"))
      val changes = (1 to 40).map { i =>
        val k = 1L + rnd.nextInt(25)   // keys beyond the base → inserts
        val op = if (rnd.nextInt(4) == 0) "D" else "U"
        (k, s"c$i", op, i.toLong)
      }
      val got = graft.ingest.Merge.upsert(
          base.toDF("k", "v"), changes.toDF("k", "v", "op", "seq"), "k")
        .as[(Long, String)].collect().toMap
      // reference: latest change per key wins outright
      val latest = changes.groupBy(_._1).view.mapValues(_.maxBy(_._4)).toMap
      val expect = ((1L to 25L).flatMap { k =>
        latest.get(k) match {
          case Some((_, v, "U", _)) => Some(k -> v)
          case Some((_, _, "D", _)) => None
          case None => base.find(_._1 == k).map(b => k -> b._2)
          case _ => None
        }
      }).toMap
      assert(got == expect, s"trial $trial")
    }
  }

  test("both connected-components faces equal union-find on random graphs") {
    val rnd = new scala.util.Random(20250812L)
    for (trial <- 1 to 4) {
      val n = 40 + trial * 10
      val nodes = (1L to n).toSeq
      // densities from near-forest to blob, plus self-loop/dup noise
      val m = (n * (0.5 + trial * 0.6)).toInt
      val edges = Seq.fill(m)((rnd.nextInt(n) + 1L, rnd.nextInt(n) + 1L))

      // driver-side union-find reference
      val parent = scala.collection.mutable.Map(nodes.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra max rb) = ra min rb
      }
      val expect = nodes.map { i =>
        // canonical label = component MIN id
        val members = nodes.filter(j => find(j) == find(i))
        i -> members.min
      }.toMap

      val nodeDf = nodes.toDF("doc_id")
      val edgeDf = edges.toDF("doc_a", "doc_b")
      val prop = Cluster.connectedComponents(nodeDf, edgeDf, "doc_id", maxIters = 40)
        .as[(Long, Long)].collect().toMap
      val star = Cluster.connectedComponentsStar(nodeDf, edgeDf, "doc_id", maxIters = 40)
        .as[(Long, Long)].collect().toMap
      assert(prop == expect, s"trial $trial: propagation vs union-find")
      assert(star == expect, s"trial $trial: star vs union-find")
    }
  }

  test("kmv_sketch equals the exact k smallest distinct hashes on random inputs") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(90210)
    for (trial <- 1 to 5) {
      val k = Seq(2, 16, 64)(rnd.nextInt(3))
      // duplicates + a skewed range so sub-k and at-k cases both occur
      val vals = (1 to 40 + rnd.nextInt(400)).map(_ => rnd.nextInt(120).toLong)
      val df = vals.toDF("v").repartition(1 + rnd.nextInt(6))
        .select(xxhash64(col("v")).as("h"))
      val got = df.agg(graft.functions.KmvSketch(col("h"), k))
        .as[Seq[Long]].head()
      val expect = vals.toDF("v").select(xxhash64(col("v")).as("h"))
        .as[Long].collect().distinct.sorted.take(k).toSeq
      assert(got == expect, s"trial $trial (k=$k): sketch vs exact k-min")
    }
  }

  test("CorpusDiff.diff equals driver set arithmetic on random versions") {
    val rnd = new scala.util.Random(31337)
    for (trial <- 1 to 5) {
      val ids = (1L to 60L).filter(_ => rnd.nextBoolean())
      val oldIds = ids.filter(_ => rnd.nextInt(10) > 1)
      val newIds = ids.filter(_ => rnd.nextInt(10) > 1)
      val edited = ids.filter(_ => rnd.nextInt(4) == 0).toSet
      val o = oldIds.map(i => (i, s"g${i % 3}", s"h$i")).toDF("id", "g", "h")
      val n = newIds.map(i =>
        (i, s"g${i % 3}", if (edited(i)) s"h${i}x" else s"h$i")).toDF("id", "g", "h")
      val got = graft.ingest.CorpusDiff.diff(o, n, "id", "g", "h")
        .as[(Long, String, String)].collect().map(r => r._1 -> r._3).toMap
      val want = (oldIds ++ newIds).distinct.map { i =>
        i -> ((oldIds.contains(i), newIds.contains(i)) match {
          case (true, true) => if (edited(i)) "modified" else "unchanged"
          case (false, true) => "added"
          case (true, false) => "removed"
          case _ => sys.error("unreachable")
        })
      }.toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("span attribution conserves mass across the three cards on random corpora") {
    // Invariants tying C73 (removal), C78 (origin flow), C81 (effective
    // mass) to ONE accounting identity: the keeper rule and the span
    // frame are shared, so for every source
    //   removal_cut(s)            == Σ_from  flow(from → s)
    //   mixture_adopted(s)        == Σ_{from ≠ s} flow(from → s)
    //   0 ≤ effective(s) ≤ total(s), totals == Σ token counts
    // Random corpora: shared phrases (≥L tokens) planted across random
    // docs/sources + per-doc unique filler; phrase adjacency exercises
    // the island-merge / content-unique conservative-keep path too.
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(86753)
    for (trial <- 1 to 3) {
      val phrases = (0 until 5).map(p =>
        (0 until 8 + rnd.nextInt(5)).map(w => s"t${trial}p${p}w$w"))
      val sources = Seq("sa", "sb", "sc")
      val docs = (0 until 12).map { d =>
        val src = sources(rnd.nextInt(sources.size))
        val parts = scala.collection.mutable.Buffer[Seq[String]]()
        parts += (0 until 3 + rnd.nextInt(4)).map(i => s"t${trial}d${d}f$i")
        (0 until rnd.nextInt(3)).foreach { _ =>
          parts += phrases(rnd.nextInt(phrases.size))
          parts += (0 until 1 + rnd.nextInt(5)).map(i =>
            s"t${trial}d${d}g${parts.size}x$i")
        }
        (d.toLong, src, parts.flatten.mkString(" "))
      }
      val dir = tmpDir(s"spanmass$trial")
      docs.toDF("doc_id", "source", "text")
        .withColumn("lang", lit("en"))
        .withColumn("n_chars", length(col("text")))
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")

      val flow = ExactSubstr.spanOriginCard(spark, dir).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
      val cut = ExactSubstr.removeDupSpansCard(spark, dir).collect()
        .map(r => r.getString(0) ->
          (r.getAs[Long]("tokens_before") - r.getAs[Long]("tokens_after"))).toMap
      val mix = ExactSubstr.mixtureEffectiveCard(spark, dir).collect()
        .map(r => r.getString(0) ->
          (r.getAs[Long]("total_tokens"), r.getAs[Long]("adopted_tokens"),
            r.getAs[Long]("effective_tokens"))).toMap

      val expectTotals = docs.groupBy(_._2)
        .map { case (s, ds) => s -> ds.map(_._3.split(" ").length.toLong).sum }
      sources.foreach { s =>
        val inFlow = flow.collect { case ((_, to), v) if to == s => v }.sum
        val crossFlow = flow.collect {
          case ((from, to), v) if to == s && from != s => v }.sum
        assert(cut.getOrElse(s, 0L) == inFlow,
          s"trial $trial $s: removal mass ${cut.getOrElse(s, 0L)} != flow-in $inFlow")
        mix.get(s).foreach { case (tot, adopted, eff) =>
          assert(adopted == crossFlow,
            s"trial $trial $s: mixture adopted $adopted != cross flow-in $crossFlow")
          assert(eff == tot - adopted && eff >= 0L && eff <= tot)
          assert(tot == expectTotals(s), s"trial $trial $s: totals")
        }
      }
    }
  }

  test("LmQuant bins are monotone and codebook-consistent on random inputs") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(5150)
    for (trial <- 1 to 3) {
      val bits = 2 + rnd.nextInt(5)
      val vals = (1 to 200 + rnd.nextInt(2000)).map(_ => -rnd.nextDouble() * 20)
      val q = LmQuant.quantize(vals.toDF("lp"), "lp", bits)
        .select("lp", "bin", "q").as[(Double, Int, Double)].collect()
      assert(q.map(_._2).distinct.length <= (1 << bits))
      val sorted = q.sortBy(_._1)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._2 <= b._2; case _ => true
      }, s"trial $trial: a larger value landed in a smaller bin")
      q.groupBy(_._2).foreach { case (bin, rows) =>
        val mean = rows.map(_._1).sum / rows.length
        assert(math.abs(rows.head._3 - mean) < 1e-9,
          s"trial $trial bin $bin: codebook value is not the member mean")
      }
    }
  }

  test("pack-efficiency identities hold on random corpora (empty docs included)") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(31337)
    for (trial <- 1 to 3) {
      // doc lengths spanning the whole L range, plus planted degenerates:
      // an empty doc and a whitespace-only doc (both the [""] convention)
      val lens = (1 to 30).map(_ => 1 + rnd.nextInt(3000))
      val docs = lens.zipWithIndex.map { case (n, i) =>
        (i.toLong, (0 until n).map(k => s"w$k").mkString(" "))
      } ++ Seq((100L, ""), (101L, "   "))
      val dir = tmpDir(s"packeff$trial")
      docs.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")))
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val toks = lens.map(_.toLong) ++ Seq(1L, 1L) // [""] counts one token
      val got = Sample.packEfficiency(spark, dir).collect()
        .map(r => r.getAs[Int]("ctx_len") -> r).toMap
      got.foreach { case (l, r) =>
        val trunc = toks.map(t => math.max(t - l, 0L)).sum
        val slots = toks.map(t => (t + l - 1) / l * l).sum
        val total = toks.sum
        assert(r.getAs[Long]("docs") == toks.length.toLong, s"trial $trial L=$l")
        assert(r.getAs[Long]("total_tokens") == total)
        assert(r.getAs[Long]("trunc_tokens") == trunc)
        assert(r.getAs[Long]("pad_tokens") == slots - total)
        // identity: slot mass == corpus mass + padding, always
        assert(r.getAs[Long]("pad_tokens") + total == slots)
      }
    }
  }

  test("chunk-origin flow equals C31's drop accounting on random corpora") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(24601)
    for (trial <- 1 to 3) {
      val sources = Seq("sa", "sb", "sc")
      // random docs + planted full-doc duplicates across sources (every
      // chunk of a duplicated doc is an adopted window somewhere)
      val base = (0 until 10).map { d =>
        (d.toLong, sources(rnd.nextInt(3)),
          (0 until 20 + rnd.nextInt(80)).map(k => s"t${trial}d${d}w$k").mkString(" "))
      }
      val dups = (0 until 4).map { i =>
        val src = base(rnd.nextInt(base.size))
        (100L + i, sources(rnd.nextInt(3)), src._3)
      }
      val dir = tmpDir(s"chunkflow$trial")
      (base ++ dups).toDF("doc_id", "source", "text")
        .withColumn("lang", lit("en"))
        .withColumn("n_chars", length(col("text")))
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      val flowIn = TextQueries.chunkOriginCard(spark, dir).collect()
        .groupBy(_.getAs[String]("src_to"))
        .map { case (s, rs) => s -> rs.map(_.getAs[Long]("adopted_chunks")).sum }
      val dropped = TextQueries.dedupChunk(spark, dir).collect()
        .map(r => r.getAs[String]("source") -> r.getAs[Long]("dup_chunks")).toMap
      sources.foreach { s =>
        assert(flowIn.getOrElse(s, 0L) == dropped.getOrElse(s, 0L),
          s"trial $trial $s: flow-in ${flowIn.getOrElse(s, 0L)} != dropped ${dropped.getOrElse(s, 0L)}")
      }
      assert(flowIn.values.sum > 0, s"trial $trial: planted dups must adopt")
    }
  }
}
