package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C102 — unigram-LM (SentencePiece-family) tokenizer training. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  // ---- driver reference implementation (plain Scala, same rules) ----

  private val Unk = -1e9

  private def refViterbi(w: String, logp: Map[String, Double],
      maxLen: Int): Seq[String] = {
    val n = w.length
    if (n == 0) return Nil
    val sc = Array.fill(n + 1)(0.0)
    val bp = Array.fill(n + 1)(0)
    for (i <- 1 to n) {
      var bestS = Double.NegativeInfinity; var bestJ = -1
      for (j <- math.max(0, i - maxLen) until i) {
        val s = sc(j) + logp.getOrElse(w.substring(j, i), Unk)
        // tie rule: prefer the LARGER split point (shorter final piece)
        if (s > bestS || (s == bestS && j > bestJ)) { bestS = s; bestJ = j }
      }
      sc(i) = bestS; bp(i) = bestJ
    }
    var pos = n
    val out = scala.collection.mutable.ArrayBuffer[String]()
    while (pos > 0) { out += w.substring(bp(pos), pos); pos = bp(pos) }
    out.reverse.toSeq
  }

  private def refMStep(counts: Map[String, Long],
      alphabet: Set[String]): Map[String, Double] = {
    val withChars = alphabet.foldLeft(counts) { (m, c) =>
      if (m.getOrElse(c, 0L) > 0) m else m.updated(c, 1L) }
    val total = withChars.values.sum.toDouble
    withChars.map { case (p, c) => p -> math.log(c / total) }
  }

  private def refTrain(hist: Seq[(String, Long)], vocabTarget: Int,
      emRounds: Int, maxLen: Int, seedSize: Int): Map[String, Double] = {
    val subs = scala.collection.mutable.Map[String, Long]()
    hist.foreach { case (w, n) =>
      for (i <- 0 until w.length; l <- 1 to math.min(maxLen, w.length - i))
        subs(w.substring(i, i + l)) = subs.getOrElse(w.substring(i, i + l), 0L) + n
    }
    val alphabet = subs.keySet.filter(_.length == 1).toSet
    val topMulti = subs.toSeq.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }.take(seedSize)
    var model = refMStep(
      topMulti.toMap ++ subs.filter(_._1.length == 1), alphabet)
    val pruneAt = emRounds / 2
    for (r <- 1 to emRounds) {
      val counts = scala.collection.mutable.Map[String, Long]()
      hist.foreach { case (w, n) =>
        refViterbi(w, model, maxLen).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + n) }
      val kept =
        if (r != pruneAt) counts.toMap
        else {
          val multi = counts.toSeq.filter(_._1.length > 1)
            .sortBy { case (p, c) => (-c, p) }
            .take(math.max(0, vocabTarget - alphabet.size))
          multi.toMap ++ counts.filter(_._1.length == 1)
        }
      model = refMStep(kept, alphabet)
    }
    model
  }

  // ---- specs ----

  test("BOTH fit paths equal the spec's independent reference, piece for piece") {
    val words = UnigramLm.wordHistogram(
      graft.sources.Tables(spark, sfDir, "documents"), "text")
    val hist = words.as[(String, Long)].collect().toSeq
    val expected = refTrain(hist, vocabTarget = 60, emRounds = 4,
      maxLen = 6, seedSize = 200)
    def check(name: String, got: Map[String, Double]): Unit = {
      assert(got.keySet == expected.keySet,
        s"$name vocab diff: ${(expected.keySet diff got.keySet).take(5)} missing, " +
          s"${(got.keySet diff expected.keySet).take(5)} extra")
      got.foreach { case (p, lp) =>
        assert(math.abs(lp - expected(p)) < 1e-12, s"$name logp($p)") }
    }
    // the driver-finish path (the production default at vocabulary scale)
    check("driver", UnigramLm.train(words).model.logp)
    // the distributed fold path (the >100k-vocab guard)
    check("distributed", UnigramLm.trainDistributed(words, vocabTarget = 60,
      emRounds = 4, maxLen = 6, seedSize = 200).model.logp)
  }

  test("Viterbi segmentation: totality, concat identity, tie rule, unknown chars") {
    val model = Map("ab" -> math.log(0.3), "abc" -> math.log(0.3),
      "a" -> math.log(0.1), "b" -> math.log(0.1), "c" -> math.log(0.2))
    val df = Seq("abcabc", "abc", "cab", "azb", "").toDF("w")
      .select(col("w"), UnigramLm.viterbiPieces(col("w"), model, 6).as("ps"))
    val got = df.collect().map(r =>
      r.getAs[String]("w") -> r.getSeq[String](1)).toMap
    // every segmentation reassembles its word (unknown 'z' included:
    // it rides as a single UNK-scored char, the search stays total)
    got.foreach { case (w, ps) => assert(ps.mkString == w, s"'$w' -> $ps") }
    assert(got("") == Nil)
    // reference equality on every word, tie rule included
    got.foreach { case (w, ps) =>
      assert(ps == refViterbi(w, model, 6), s"'$w'") }
    // p(abc)=0.3 beats ab+c (0.3*0.2): one piece
    assert(got("abc") == Seq("abc"))
  }

  test("a planted repeated motif becomes a vocabulary piece") {
    val dir = tmpDir("unigram")
    val motif = Seq.fill(30)("tokenizer").mkString(" ")
    (Seq((1L, motif), (2L, motif), (3L, "alpha beta gamma delta")))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val card = UnigramLm.textUnigramLm(spark, dir).collect()
    assert(card.nonEmpty)
    val top = card.head
    // "tokenizer" is 9 chars > maxLen 6; its dominant SUBSTRING piece
    // must top the card over any single character
    assert(top.getAs[String]("piece").length > 1,
      s"top piece is ${top.getAs[String]("piece")} — the motif substring must win")
    assert(card.map(_.getAs[String]("piece"))
      .exists(p => "tokenizer".contains(p) && p.length >= 4),
      "a long substring of the planted motif must be in the vocabulary")
  }

  test("hard-EM likelihood is non-decreasing across fixed-vocab rounds") {
    val words = UnigramLm.wordHistogram(
      graft.sources.Tables(spark, sfDir, "documents"), "text")
    val t = UnigramLm.train(words)
    // rounds: 1, 2(prune), 3, 4 — monotone where the vocab is unchanged
    val r = t.rounds
    assert(r.size == 4 && r(1).pruned && !r(0).pruned && !r(2).pruned)
    assert(r(3).ll >= r(2).ll - 1e-9,
      s"post-prune EM must not decrease likelihood: ${r(2).ll} -> ${r(3).ll}")
    assert(t.collects <= 1 + 4 * 2, "driver round-trips stay bounded")
    // determinism end to end
    val again = UnigramLm.train(words)
    assert(again.model.logp == t.model.logp)
  }

  test("the card face: valid bp columns, rank order, coverage monotone") {
    val card = UnigramLm.textUnigramLm(spark, sfDir).collect()
    assert(card.nonEmpty && card.length <= 30)
    assert(card.map(_.getAs[Int]("rank")).toSeq == (1 to card.length))
    val occ = card.map(_.getAs[Long]("occurrences"))
    assert(occ.zip(occ.tail).forall { case (a, b) => a >= b })
    val cum = card.map(_.getAs[Long]("cum_bp"))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b })
    assert(cum.last <= 10000L)
    card.foreach { r =>
      assert(r.getAs[Long]("prob_bp") >= 0 && r.getAs[Long]("prob_bp") <= 10000) }
  }
}
