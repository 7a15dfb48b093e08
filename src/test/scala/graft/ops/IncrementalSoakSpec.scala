package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multi-week SOAK of the incremental indexes — the production cadence
  * (probe → admit → append, daily) run for dozens of simulated days,
  * proving the two properties a 100 TB standing index lives or dies
  * by: (1) EXACT ACCOUNTING — index size after N days equals the
  * initial corpus plus the sum of admitted batches (appends never
  * duplicate, drop, or resurrect keys); (2) FLAT PROBE COST — a day's
  * probe stays O(batch), not O(history): wall time over the soak must
  * not trend with index size. Per-batch idempotency is pinned
  * elsewhere (IncrementalIndexSpec / IncrementalVecSpec); this spec is
  * the LONG-RUN composition of those cycles. */
class IncrementalSoakSpec extends SparkSpec {
  import spark.implicits._

  private def medianMs(xs: Seq[Long]): Long = {
    val s = xs.sorted; s(s.length / 2)
  }

  test("24-day document-index soak: exact accounting + flat probe cost") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val days = 24
    val byDay = docs.groupBy { case (id, _) => (id % days).toInt }
    val root = tmpDir("soak-doc-idx")

    // day 0 seeds the standing index
    val seed = byDay(0).toSeq
    IncrementalIndex.write(root,
      seed.toDF("doc_id", "text"), "doc_id", "text")
    var indexedDocs = seed.length.toLong
    val probeMs = collection.mutable.Buffer.empty[Long]

    for (d <- 1 until days) {
      val fresh = byDay(d).toSeq
      // plant cross-day leakage: 3 docs re-shipping day-(d-1) texts
      // under new ids — the probe must flag them, admission drop them
      val replayed = byDay(d - 1).take(3).map { case (_, t) =>
        (1000000L + d * 10L, t)
      }.zipWithIndex.map { case ((base, t), i) => (base + i, t) }
      val batch = (fresh ++ replayed).toDF("doc_id", "text")

      val t0 = System.nanoTime()
      val probed = IncrementalIndex.probe(spark, root, batch, "doc_id", "text")
        .select(col("doc_id"),
          greatest(col("dup_exact"), col("dup_reorder"), col("dup_near"))
            .as("flagged")).collect()
      probeMs += (System.nanoTime() - t0) / 1000000L

      // a replay flags dup_exact when its original was admitted, or
      // dup_near when the original itself lost to a near-dup already
      // in the index — either way it must carry SOME flag
      val flaggedIds = probed.filter(_.getInt(1) == 1).map(_.getLong(0)).toSet
      assert(replayed.map(_._1).toSet.subsetOf(flaggedIds),
        s"day $d: replayed texts must flag as duplicates")

      val admitted = IncrementalIndex.admit(spark, root, batch, "doc_id", "text")
      val nAdmitted = admitted.count()
      assert(nAdmitted <= fresh.length,
        s"day $d: replays can never be admitted")
      IncrementalIndex.append(root, admitted, "doc_id", "text")
      indexedDocs += nAdmitted

      val keyRows = spark.read.parquet(s"$root/keys").count()
      assert(keyRows == indexedDocs,
        s"day $d: index keys $keyRows != seed + sum(admitted) $indexedDocs")
    }
    // growth sanity: the index grew steadily (corpus-internal planted
    // dups and the replays drop; everything else accumulates) and never
    // exceeded the real corpus
    assert(indexedDocs > seed.length.toLong && indexedDocs <= docs.length.toLong,
      s"soak accounting out of range: $indexedDocs of ${docs.length}")

    // flat probe cost: the last week's median must not trend up vs the
    // first week's (generous 3x bound absorbs JIT/GC wall-clock noise)
    val first = medianMs(probeMs.take(7).toSeq)
    val last = medianMs(probeMs.takeRight(7).toSeq)
    info(s"doc-index probe ms per day: ${probeMs.mkString(",")}")
    assert(last <= first * 3 + 50,
      s"probe cost trends with history: first-week median ${first}ms, " +
        s"last-week median ${last}ms")
  }

  test("12-day vector-index soak: frozen model, exact accounting, flat probes") {
    val v = Vectors.withNorm(
        graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
      .select(col("vec_id"), col("e"), col("nrm"))
    val days = 12
    val root = tmpDir("soak-vec-idx")
    val corpusDir = tmpDir("soak-vec-corpus") + "/corpus"

    val seed = v.where(col("vec_id") % days === 0)
    IncrementalIndex.writeVecIndex(root, seed)
    seed.write.mode("append").parquet(corpusDir)
    var indexed = seed.count()
    val probeMs = collection.mutable.Buffer.empty[Long]

    for (d <- 1 until days) {
      val batch = v.where(col("vec_id") % days === d)
      val standing = spark.read.parquet(corpusDir)

      val t0 = System.nanoTime()
      val flagged = IncrementalIndex.probeVecs(spark, root, batch, standing)
        .select("vec_id").as[Long].collect().toSet
      probeMs += (System.nanoTime() - t0) / 1000000L

      val admitted = batch.where(!col("vec_id").isin(flagged.toSeq: _*))
      val nAdmitted = admitted.count()
      IncrementalIndex.appendVecIndex(spark, root, admitted)
      admitted.write.mode("append").parquet(corpusDir)
      indexed += nAdmitted

      val codeRows = spark.read.parquet(s"$root/vcodes").count()
      assert(codeRows == indexed,
        s"day $d: vcodes $codeRows != seed + sum(admitted) $indexed")
    }
    // the frozen model kept admitting: the index grew every day the
    // batch carried non-near-dup vectors
    assert(indexed > seed.count(), "the soak admitted new vectors")

    val first = medianMs(probeMs.take(5).toSeq)
    val last = medianMs(probeMs.takeRight(5).toSeq)
    info(s"vec-index probe ms per day: ${probeMs.mkString(",")}")
    assert(last <= first * 3 + 50,
      s"vector probe cost trends with history: first ${first}ms, last ${last}ms")
  }
}
