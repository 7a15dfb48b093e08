package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation of the published algorithm (get_stats /
    * merge_vocab): plain Scala over an in-memory word histogram, greedy
    * left-to-right merging, ties on (count desc, left asc, right asc). */
  private def referenceBpe(words: Seq[(Seq[String], Long)],
                           numMerges: Int): Seq[(String, String, Long)] = {
    var w = words
    val out = Vector.newBuilder[(String, String, Long)]
    var continue = true
    var r = 0
    while (r < numMerges && continue) {
      val stats = scala.collection.mutable.Map.empty[(String, String), Long]
      w.foreach { case (syms, n) =>
        syms.zip(syms.drop(1)).foreach { p =>
          stats(p) = stats.getOrElse(p, 0L) + n
        }
      }
      if (stats.isEmpty) continue = false
      else {
        val ((a, b), c) = stats.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((a, b, c))
        w = w.map { case (syms, n) =>
          val acc = scala.collection.mutable.Buffer.empty[String]
          syms.foreach { s =>
            if (acc.nonEmpty && acc.last == a && s == b) {
              acc.remove(acc.length - 1); acc += (a + b)
            } else acc += s
          }
          (acc.toSeq, n)
        }
        r += 1
      }
    }
    out.result()
  }

  test("the classic paper example learns the expected first merges") {
    // Sennrich et al. 2016 §3.2 toy vocabulary
    val words = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
      .map { case (wd, n) => (wd.map(_.toString) :+ "</w>", n) }
    val df = words.toDF("syms", "n")
    val got = Bpe.train(df, 4).map(m => (m.left, m.right, m.count))
    // (e,s) fires on newest+widest = 9, then (es,t) 9, then (est,</w>) 9
    assert(got.take(3) == Seq(("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L)),
      s"unexpected head merges: $got")
    assert(got == referenceBpe(words, 4))
  }

  test("corpus merges equal the driver reference exactly, with non-increasing counts") {
    val hist = Bpe.wordHistogram(spark, sfDir)
      .as[(Seq[String], Long)].collect().toSeq
    val want = referenceBpe(hist, 20)
    val got = Bpe.textBpeMerges(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(got.nonEmpty)
    assert(got == want, s"distributed trainer diverged from the reference:\n$got\nvs\n$want")
    // merging only removes or caps pair mass, so the argmax count never rises
    got.map(_._3).sliding(2).foreach {
      case Seq(prev, next) => assert(next <= prev, s"count rose: $prev -> $next")
      case _ =>
    }
    // merged symbols surface in later merges (the vocabulary actually grows)
    val merged = got.map { case (a, b, _) => a + b }.toSet
    assert(got.drop(1).exists { case (a, b, _) => merged(a) || merged(b) },
      "no learned symbol was ever reused — merges are not composing")
  }

  test("encode face equals a reference encode piece-for-piece") {
    val hist = Bpe.wordHistogram(spark, sfDir)
      .as[(Seq[String], Long)].collect().toSeq
    // reference: train, then apply each merge greedily in rank order
    val merges = referenceBpe(hist, 20)
    def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
      val acc = scala.collection.mutable.Buffer.empty[String]
      syms.foreach { s =>
        if (acc.nonEmpty && acc.last == a && s == b) {
          acc.remove(acc.length - 1); acc += (a + b)
        } else acc += s
      }
      acc.toSeq
    }
    val encoded = hist.map { case (syms, n) =>
      (merges.foldLeft(syms) { case (ss, (a, b, _)) => applyMerge(ss, a, b) }, n)
    }
    val wantHist = encoded.flatMap { case (ps, n) => ps.map(_ -> n) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val wantTotal = wantHist.values.sum
    val want = wantHist.toSeq.sortBy { case (p, c) => (-c, p) }.take(30)
      .map { case (p, c) => (p, c, c * 10000 / wantTotal) }
    val got = Bpe.textBpeEncode(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"encode diverged:\n$got\nvs\n$want")
    // the encoder really fired: learned multi-char pieces carry mass
    assert(got.exists { case (p, _, _) => p.replace("</w>", "").length > 1 },
      "no multi-character piece in the top-30 — merges never applied")
  }

  test("batched distributed trainer equals the sequential reference in few collects") {
    val words = Bpe.wordHistogram(spark, sfDir)
    val hist = words.as[(Seq[String], Long)].collect().toSeq
    val want = referenceBpe(hist, 20)
    val t = Bpe.trainDistributed(words, 20)
    assert(t.merges.map(m => (m.left, m.right, m.count)) == want,
      s"batched trainer diverged:\n${t.merges}\nvs\n$want")
    // the whole point of batching: strictly fewer round-trips than
    // one-per-merge (the conservative accept rule still makes progress)
    assert(t.collects < 20, s"batching never helped: ${t.collects} collects for 20 merges")
    // ranks are 1..n contiguous
    assert(t.merges.map(_.rank) == (1 to t.merges.size))
  }

  test("hybrid train finishes driver-side in 2 round-trips on a collectable histogram") {
    val words = Bpe.wordHistogram(spark, sfDir)
    val t = Bpe.trainStats(words, 20)
    assert(t.collects == 2, s"expected driver finish (2 round-trips), got ${t.collects}")
    val hist = words.as[(Seq[String], Long)].collect().toSeq
    assert(t.merges.map(m => (m.left, m.right, m.count)) == referenceBpe(hist, 20))
    // forced-distributed threshold: same answer when the driver path is disallowed
    val forced = Bpe.trainStats(words, 6, driverFinishRows = 0L)
    assert(forced.merges.map(m => (m.left, m.right, m.count)) == referenceBpe(hist, 6))
  }

  test("batched trainer on the paper example matches the reference") {
    val words = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
      .map { case (wd, n) => (wd.map(_.toString) :+ "</w>", n) }
    val t = Bpe.trainDistributed(words.toDF("syms", "n"), 4)
    assert(t.merges.map(m => (m.left, m.right, m.count)) == referenceBpe(words, 4))
  }

  test("mergePair matches greedy left-to-right semantics on runs") {
    val df = Seq(
      Seq("x", "x", "x"),
      Seq("x", "x", "x", "x"),
      Seq("a", "b", "b"),
      Seq("c", "a", "b", "c")).toDF("syms")
    val got = df.select(Bpe.mergePair(col("syms"), "x", "x").as("m")).as[Seq[String]].collect()
    assert(got(0) == Seq("xx", "x"))
    assert(got(1) == Seq("xx", "xx"))
    val got2 = df.select(Bpe.mergePair(col("syms"), "a", "b").as("m")).as[Seq[String]].collect()
    assert(got2(2) == Seq("ab", "b"))
    assert(got2(3) == Seq("c", "ab", "c"))
  }
}
