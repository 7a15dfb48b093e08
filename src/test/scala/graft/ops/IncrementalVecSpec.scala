package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C79 dedup_semantic_incremental — batch-vs-standing semantic dedup
  * over the frozen vector index. Rows-only CORRECTNESS entry; this spec
  * is its oracle: a driver recount of the same-cluster cos≥τ contract
  * through the MATERIALIZED index cycle (write → probe → append →
  * re-probe), batch-internal silence, and determinism of the query
  * face. */
class IncrementalVecSpec extends SparkSpec {
  import spark.implicits._

  private val tau = 0.35

  private def corpus = Vectors.withNorm(
    graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")

  test("index probe equals a driver recount of same-cluster cos >= tau vs history") {
    val v = corpus
    val isNew = col("vec_id") % 5 === 4
    val cols = Seq(col("vec_id"), col("e"), col("nrm"))
    val standing = v.where(!isNew).select(cols: _*)
    val batch = v.where(isNew).select(cols: _*)
    val root = tmpDir("vecindex")
    IncrementalIndex.writeVecIndex(root, standing)
    val got = IncrementalIndex.probeVecs(spark, root, batch, standing)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("n_near"), r.getAs[Double]("best_cos"))).toMap

    // recount with the STORED centroids (the frozen-model contract)
    val cents = spark.read.parquet(s"$root/vcents")
    def side(df: org.apache.spark.sql.DataFrame) =
      SemanticPq.assignWith(df, cents)
        .select(col("vec_id"), col("e"), col("nrm"), col("cluster"))
        .as[(Long, Seq[Double], Double, Long)].collect()
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    val st = side(standing).groupBy(_._4)
    val expected = side(batch).flatMap { case (bid, be, bn, bc) =>
      val hits = st.getOrElse(bc, Array.empty[(Long, Seq[Double], Double, Long)])
        .map { case (_, se, sn, _) => dot(be, se) / (bn * sn) }
        .filter(_ >= tau)
      if (hits.isEmpty) None
      else Some(bid -> (hits.length.toLong,
        BigDecimal(hits.max).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
    assert(got.keySet == expected.keySet,
      s"flagged sets differ: missing ${expected.keySet -- got.keySet}, " +
        s"extra ${got.keySet -- expected.keySet}")
    got.foreach { case (id, (n, c)) =>
      assert(n == expected(id)._1, s"n_near for $id")
      assert(math.abs(c - expected(id)._2) <= 2e-4, s"best_cos for $id")
    }
    assert(got.nonEmpty, "the corpus batch must near-duplicate some history")

    // append the batch, re-probe: every batch vector now matches its own
    // copy in history at cosine 1
    IncrementalIndex.appendVecIndex(spark, root, batch)
    val re = IncrementalIndex.probeVecs(spark, root, batch, standing.union(batch))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("best_cos")).toMap
    val batchIds = batch.select(col("vec_id")).as[Long].collect().toSet
    assert(re.keySet == batchIds, "after append, every batch vector is a dup of history")
    re.values.foreach(c => assert(c >= 0.9999, s"self-match cosine: $c"))
  }

  test("baseline refresh: rebuild-equal on the build corpus, covers appends after") {
    val v = corpus.select(col("vec_id"), col("e"), col("nrm"))
    val isNew = col("vec_id") % 5 === 4
    val standing = v.where(!isNew)
    val batch = v.where(isNew)
    val root = tmpDir("vecrefresh")
    IncrementalIndex.writeVecIndex(root, standing)
    def vbase = spark.read.parquet(s"$root/vbase").collect()
      .map(r => r.getAs[Long]("cluster") ->
        (r.getAs[Long]("base_n"), r.getAs[Double]("base_qerr"))).toMap
    val built = vbase
    // same corpus, same frozen model → identical baseline
    IncrementalIndex.refreshVecBaseline(spark, root, standing)
    assert(vbase == built, "refresh on the build corpus must be a no-op")
    // after an append, the refreshed counts cover the full population
    IncrementalIndex.appendVecIndex(spark, root, batch)
    IncrementalIndex.refreshVecBaseline(spark, root, standing.union(batch))
    assert(vbase.values.map(_._1).sum == v.count(),
      "refreshed baseline must count every admitted vector")
  }

  test("batch-internal duplication stays silent") {
    // standing: distinct orthogonal-ish vectors; batch: two IDENTICAL
    // vectors unseen in history — nothing may flag
    def unitAt(i: Int): Seq[Double] = Seq.tabulate(64)(j => if (j == i) 1.0 else 0.0)
    val standing = Vectors.withNorm(
      (0L to 3L).map(i => (i * 5, unitAt(i.toInt))).toDF("vec_id", "embedding"),
      "embedding").select(col("vec_id"), col("e"), col("nrm"))
    val novel = Seq.tabulate(64)(j =>
      if (j == 40 || j == 41) 0.7 else if (j == 47) 0.1 else 0.0)
    val batchRows = Seq((4L, novel), (9L, novel))
    val batch = Vectors.withNorm(batchRows.toDF("vec_id", "embedding"), "embedding")
      .select(col("vec_id"), col("e"), col("nrm"))
    val root = tmpDir("vecindex2")
    IncrementalIndex.writeVecIndex(root, standing)
    assert(IncrementalIndex.probeVecs(spark, root, batch, standing).count() == 0L,
      "history never saw these vectors; batch-internal dups must stay silent")
  }

  test("query face: deterministic, reconciled accounting") {
    val a = SemanticPq.dedupSemanticIncremental(spark, sfDir).collect()
    val b = SemanticPq.dedupSemanticIncremental(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq)
    a.foreach { r =>
      assert(r.getAs[Long]("flagged") <= r.getAs[Long]("batch_vecs"))
      assert(r.getAs[Long]("near_pairs") >= r.getAs[Long]("flagged"))
      assert(r.getAs[Long]("flagged_bp") ==
        r.getAs[Long]("flagged") * 10000 / r.getAs[Long]("batch_vecs"))
    }
    assert(a.map(_.getAs[Long]("flagged")).sum > 0, "non-vacuous at sf")
  }
}
