package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Byte-pair-encoding vocabulary training (Sennrich et al. 2016) — the
  * tokenizer-fitting pass of a training-data pipeline, run where BPE
  * training actually happens: over the corpus WORD HISTOGRAM, not the
  * raw corpus.
  *
  * Scale shape at 100 TB:
  *  - The only corpus-sized work is the one-pass word-frequency
  *    aggregate (explode + partial-agg groupBy — map-side combined,
  *    shuffling distinct words, not occurrences). Everything after
  *    operates on the histogram, which is millions of rows when the
  *    corpus is billions of documents.
  *  - Each merge round is one pair-count aggregate over the histogram
  *    (weighted by word frequency) + one narrow fold rewriting the
  *    symbol arrays. Only the single argmax row is collected per round
  *    (the KMeans centroid pattern); the histogram frame is eagerly
  *    localCheckpoint'ed so plans never deepen (the Cluster.scala
  *    lesson).
  *  - Merging is greedy left-to-right within each word — the reference
  *    algorithm's regex-replace semantics — spelled as a higher-order
  *    `aggregate` fold, so it stays inside codegen with no UDF.
  *
  * Reference behavior anchored to the public algorithm (learn_bpe's
  * get_stats/merge_vocab loop); words carry the `</w>` end-of-word
  * marker so word-final merges stay distinct, as in the paper.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** One greedy left-to-right merge pass of adjacent (a, b) → a+b over
    * a symbol array: a fold that either glues the incoming symbol onto
    * a matching tail or appends it. Matches the reference regex
    * `(?<!\S)a b(?!\S)` replacement on non-overlapping occurrences —
    * including runs (merging (x,x) turns `x x x` into `xx x`, and
    * `x x x x` into `xx xx`). */
  def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(s))))

  /** A training run's output plus how many driver round-trips (collects
    * / counts) it took — the latency tax a real cluster pays per round. */
  final case class Trained(merges: Seq[Merge], collects: Int)

  /** Learns up to `numMerges` merges from a (syms: array<string>,
    * n: long) word histogram. Ties break on (count desc, left asc,
    * right asc) — fully deterministic across reruns, partitionings,
    * and engines. Stops early when no adjacent pair remains.
    *
    * Driver round-trips are bounded, not one-per-merge: when the word
    * histogram fits on the driver (vocabulary-scale — even a 100 TB
    * corpus has a bounded distinct-word set, but the threshold guards
    * the adversarial case) it is collected ONCE and the merge loop
    * finishes driver-side ([[driverTrain]], 2 round-trips total);
    * otherwise the distributed loop accepts a provably-safe BATCH of
    * merges per collect ([[trainDistributed]]). Both paths produce the
    * exact sequential merge table (BpeSpec pins equality). */
  def train(words: DataFrame, numMerges: Int): Seq[Merge] =
    trainStats(words, numMerges).merges

  /** [[train]] with the round-trip count surfaced. */
  def trainStats(words: DataFrame, numMerges: Int,
                 driverFinishRows: Long = 100000L): Trained = {
    require(numMerges >= 1, s"numMerges must be positive: $numMerges")
    val sp = words.sparkSession
    import sp.implicits._
    if (words.count() <= driverFinishRows) {
      val hist = words.select(col("syms"), col("n"))
        .as[(Seq[String], Long)].collect().toSeq
      Trained(driverTrain(hist, numMerges), collects = 2)
    } else trainDistributed(words, numMerges)
  }

  /** Exact sequential BPE (get_stats / merge_vocab) over an in-memory
    * histogram — the driver-side finisher for vocabulary-scale inputs.
    * Same greedy semantics and (count desc, left asc, right asc)
    * tie-break as the distributed path. */
  def driverTrain(hist: Seq[(Seq[String], Long)], numMerges: Int): Seq[Merge] = {
    var w = hist
    val out = Vector.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val stats = scala.collection.mutable.Map.empty[(String, String), Long]
      w.foreach { case (syms, n) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          stats(p) = stats.getOrElse(p, 0L) + n
        }
      }
      if (stats.isEmpty) done = true
      else {
        val ((a, b), c) = stats.minBy { case ((x, y), m) => (-m, x, y) }
        out += Merge(rank, a, b, c)
        w = w.map { case (syms, n) =>
          val acc = scala.collection.mutable.Buffer.empty[String]
          syms.foreach { s =>
            if (acc.nonEmpty && acc.last == a && s == b) {
              acc.remove(acc.length - 1); acc += (a + b)
            } else acc += s
          }
          (acc.toSeq, n)
        }
        rank += 1
      }
    }
    out.result()
  }

  /** The distributed merge loop, batched: each round collects the
    * top-`batchK` pair counts once and accepts a PREFIX of them whose
    * sequential outcome is provable from the snapshot alone, so one
    * round-trip yields several merges with output identical to the
    * one-merge-per-collect loop.
    *
    * A candidate (a_i, b_i, c_i) is accepted after already-accepted
    * (a_j, b_j) iff
    *  - its own count is untouched by merge j: b_i ≠ a_j (no
    *    "x a_j b_j" steal of its left token), a_i ≠ b_j (no
    *    "a_j b_j y" steal of its right token), and neither symbol
    *    collides with the new symbol a_j+b_j; and
    *  - c_i strictly exceeds every count a pair NEWLY CREATED by merge
    *    j can have: (x, a_j b_j) occurrences each come from a snapshot
    *    "x a_j" adjacency and (a_j b_j, y) from a "b_j y" one, so the
    *    snapshot counts of those two families (uncollected pairs are
    *    ≤ the k-th collected count) bound every newcomer.
    * The batch stops at the first candidate failing either test —
    * accepted merges form a contiguous prefix of the snapshot order,
    * which is exactly what the sequential algorithm would emit. */
  def trainDistributed(words: DataFrame, numMerges: Int,
                       batchK: Int = 512): Trained = {
    require(numMerges >= 1, s"numMerges must be positive: $numMerges")
    var w = words.select(col("syms"), col("n")).localCheckpoint(true)
    val merges = Vector.newBuilder[Merge]
    var rank = 1
    var collects = 0
    var done = false
    while (rank <= numMerges && !done) {
      val top = w
        .select(explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"), col("n"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(batchK).collect()
      collects += 1
      if (top.isEmpty) done = true
      else {
        val snap = top.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        // pairs beyond the collected K can carry at most the K-th count
        val uncollectedCap = if (snap.length < batchK) 0L else snap.last._3
        val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var newPairCap = Long.MinValue
        var stop = false
        snap.foreach { case (a, b, c) =>
          if (!stop && rank + accepted.size <= numMerges) {
            val conflict = accepted.exists { case (aj, bj, _) =>
              val m = aj + bj
              b == aj || a == bj || a == m || b == m
            }
            if (conflict || (accepted.nonEmpty && c <= newPairCap)) stop = true
            else {
              accepted += ((a, b, c))
              val familyMax = snap.iterator.collect {
                case (x, y, cc) if (x, y) != (a, b) && (y == a || x == b) => cc
              }.foldLeft(0L)(math.max)
              // an (x,x) self-merge can also chain into (xx,xx); cap at c
              val selfCap = if (a == b) c else 0L
              newPairCap = math.max(newPairCap,
                math.max(uncollectedCap, math.max(familyMax, selfCap)))
            }
          } else stop = true
        }
        accepted.foreach { case (a, b, c) =>
          merges += Merge(rank, a, b, c); rank += 1
        }
        val folded = accepted.foldLeft(col("syms")) { case (cc, (a, b, _)) =>
          mergePair(cc, a, b)
        }
        val next = w.select(folded.as("syms"), col("n")).localCheckpoint(true)
        w.unpersist()
        w = next
      }
    }
    Trained(merges.result(), collects)
  }

  /** C50: the learned merge table over the documents corpus — rank,
    * merge pair, merged symbol, and the weighted pair count at learn
    * time. Rows-only: the artifact is an iterative learned model (like
    * embed_kmeans); BpeSpec proves it equal to a driver-side reference
    * implementation of the published algorithm and pins the
    * non-increasing-count invariant. */
  def textBpeMerges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = wordHistogram(s, dir)
    val merges = train(words, numMerges = 20)
    merges.toDF("rank", "left", "right", "count")
      .select(col("rank"), col("left"), col("right"),
        concat(col("left"), col("right")).as("merged"),
        col("count").as("pair_count"))
      .orderBy(col("rank"))
  }

  /** Apply a learned merge list in rank order: each merge is one
    * [[mergePair]] fold, so the WHOLE encoder is a single narrow
    * codegen'd projection — no UDF, no driver loop at apply time, and
    * it composes with any frame that carries symbol arrays. */
  def encodeColumn(syms: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(syms)((c, m) => mergePair(c, m.left, m.right))

  /** C57: subword vocabulary utilization — the corpus word histogram
    * encoded with the C50-learned merges ([[encodeColumn]]), rolled up
    * to the top-30 piece histogram (weighted by word frequency, share
    * in integer bp of ALL piece occurrences). The tokenizer designer's
    * acceptance view: which learned pieces actually carry corpus mass
    * once applied — and the proof the trained artifact round-trips
    * into an encoder. Scale shape: encoding runs over the HISTOGRAM
    * (vocabulary-sized), never the corpus; the piece rollup is map-side
    * combined; the total is one agg-to-scalar broadcast; top-30 is
    * TakeOrderedAndProject. Rows-only (downstream of the learned merge
    * table); BpeSpec proves the piece histogram equals a driver-side
    * reference encode piece-for-piece. */
  def textBpeEncode(s: SparkSession, dir: String): DataFrame = {
    val words = wordHistogram(s, dir).localCheckpoint(true) // feeds train AND encode
    val merges = train(words, numMerges = 20)
    val pieces = words
      .select(explode(encodeColumn(col("syms"), merges)).as("piece"), col("n"))
      .groupBy(col("piece")).agg(sum(col("n")).as("count"))
    val tot = pieces.agg(sum(col("count")).as("t"))
    pieces.crossJoin(broadcast(tot))
      .select(col("piece"), col("count"),
        expr("count * 10000 div t").as("share_bp"))
      .orderBy(col("count").desc, col("piece"))
      .limit(30)
  }

  /** C57a: the C57 encode face against a PERSISTED merge table — the
    * production tokenizer shape (train the vocabulary once, ship the
    * merge list, encode every batch against it). First invocation
    * trains + persists the merges ([[ArtifactStore]]); warm invocations
    * load the 20-row table and run only the narrow encode projection +
    * rollup. BpeSpec pins equality to the inline face. */
  def textBpeEncodeCached(s: SparkSession, dir: String): DataFrame = {
    val words = wordHistogram(s, dir)
    if (!ArtifactStore.has(s, dir, "bpe_merges")) {
      import s.implicits._
      val merges = train(words.localCheckpoint(true), numMerges = 20)
      ArtifactStore.save(
        merges.map(m => (m.rank, m.left, m.right, m.count))
          .toDF("rank", "left", "right", "count"),
        dir, "bpe_merges")
    }
    val merges = ArtifactStore.load(s, dir, "bpe_merges")
      .orderBy(col("rank")).collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val pieces = words
      .select(explode(encodeColumn(col("syms"), merges)).as("piece"), col("n"))
      .groupBy(col("piece")).agg(sum(col("n")).as("count"))
    val tot = pieces.agg(sum(col("count")).as("t"))
    pieces.crossJoin(broadcast(tot))
      .select(col("piece"), col("count"),
        expr("count * 10000 div t").as("share_bp"))
      .orderBy(col("count").desc, col("piece"))
      .limit(30)
  }

  /** The corpus word histogram as symbol arrays: single characters plus
    * the `</w>` end-of-word marker. */
  def wordHistogram(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(explode(Text.tokens(col("text"))).as("wd"))
      .where(col("wd") =!= "")
      .groupBy(col("wd")).agg(count(lit(1)).as("n"))
      .select(
        concat(filter(split(col("wd"), ""), x => x =!= ""),
          array(lit("</w>"))).as("syms"),
        col("n"))
}
