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

  /** Learns up to `numMerges` merges from a (syms: array<string>,
    * n: long) word histogram. Ties break on (count desc, left asc,
    * right asc) — fully deterministic across reruns, partitionings,
    * and engines. Stops early when no adjacent pair remains. */
  def train(words: DataFrame, numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be positive: $numMerges")
    var w = words.localCheckpoint(true)
    val merges = Vector.newBuilder[Merge]
    var rank = 1
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
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank, a, b, c)
        val next = w.select(mergePair(col("syms"), a, b).as("syms"), col("n"))
          .localCheckpoint(true)
        w.unpersist()
        w = next
        rank += 1
      }
    }
    merges.result()
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
