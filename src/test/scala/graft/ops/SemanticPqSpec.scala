package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C76 dedup_semantic_pq — SemDeDup over PQ codes. Rows-only
  * CORRECTNESS entry; this spec is its oracle: card equality with the
  * float-vector C37 face (the margin must cover the measured
  * quantization error on this corpus), the candidate pruning the SDC
  * gate buys over the full within-cluster pair set, a planted
  * near-dup/far-pair corpus, and determinism. */
class SemanticPqSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Vectors.withNorm(
      graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
    .select(col("vec_id"), col("e"), col("nrm"))

  test("card equals the float-vector C37 face on the test corpus") {
    val pq = SemanticPq.dedupSemanticPq(spark, sfDir).collect()
    val fl = VectorQueries.dedupSemantic(spark, sfDir).collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("cluster"), r.getAs[Long]("n_vecs"),
        r.getAs[Long]("n_pruned"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("n_pairs"))
    assert(pq.map(key).toSeq == fl.map(key).toSeq,
      "SDC margin must cover the quantization error: same clusters, " +
        "same confirmed pairs, same keeper counts")
    pq.zip(fl).foreach { case (a, b) =>
      assert(math.abs(a.getAs[Double]("avg_pair_cos") -
        b.getAs[Double]("avg_pair_cos")) <= 2e-4)
    }
  }

  test("SDC gate prunes the quadratic stage, harder at a near-dup threshold") {
    val v = corpus
    val (assigned, coded, dtabs) = SemanticPq.build(v, 8, 3, 16, 4, 64)
    val totalPairs = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"))
      .select(sum(col("n") * (col("n") - 1) / 2).cast("long")).as[Long].head()
    val cand35 = SemanticPq.candidatePairs(coded, dtabs,
      tau = 0.35, margin = 0.15, grid = 4).count()
    assert(cand35 > 0, "corpus has near-dup candidates at tau=0.35")
    assert(cand35 * 2 < totalPairs,
      s"gate must cut ≥half the quadratic stage at tau=0.35: $cand35 of $totalPairs")
    val cand60 = SemanticPq.candidatePairs(coded, dtabs,
      tau = 0.6, margin = 0.15, grid = 4).count()
    assert(cand60 * 20 < totalPairs,
      s"gate must cut ≥95% at the tau=0.6 near-dup threshold: $cand60 of $totalPairs")
    // equality with the float face holds at the near-dup threshold too
    val pq = SemanticPq.card(v, tau = 0.6).collect()
    val fl = VectorQueries.dedupSemantic(spark, sfDir, tau = 0.6).collect()
    assert(pq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))).toSeq ==
      fl.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))).toSeq,
      "card equality at tau=0.6")
  }

  test("planted near-dups survive, far pairs are never confirmed") {
    // two tight near-dup pairs + orthogonal far vectors, 8 dims
    def vec(xs: Double*): Seq[Double] = xs
    val rows = Seq(
      (0L, vec(1, 0, 0, 0, 0, 0, 0, 0)),
      (1L, vec(0.999, 0.04, 0, 0, 0, 0, 0, 0)),   // near-dup of 0
      (2L, vec(0, 1, 0, 0, 0, 0, 0, 0)),
      (3L, vec(0, 0.999, 0.04, 0, 0, 0, 0, 0)),   // near-dup of 2
      (4L, vec(0, 0, 0, 1, 0, 0, 0, 0)),
      (5L, vec(0, 0, 0, 0, 1, 0, 0, 0)),
      (6L, vec(0, 0, 0, 0, 0, 1, 0, 0)),
      (7L, vec(0, 0, 0, 0, 0, 0, 1, 0)))
    val v = Vectors.withNorm(
      rows.toDF("vec_id", "embedding"), "embedding")
      .select(col("vec_id"), col("e"), col("nrm"))
    // k = 1: a single cluster, so no planted pair is forgone at a
    // cluster boundary — the test isolates the SDC gate + confirm
    val rep = SemanticPq.card(v, tau = 0.35, margin = 0.25,
      k = 1, iters = 2, grid = 2, numSub = 4, subDim = 2, pqK = 4).collect()
    // exactly the two planted near-dups confirm: 2 pruned, n−2 kept
    assert(rep.map(_.getAs[Long]("n_pruned")).sum == 2L)
    assert(rep.map(_.getAs[Long]("n_pairs")).sum == 2L)
    assert(rep.map(_.getAs[Long]("n_vecs")).sum == 8L)
  }

  test("deterministic run over run") {
    val a = SemanticPq.dedupSemanticPq(spark, sfDir).collect().toSeq
    val b = SemanticPq.dedupSemanticPq(spark, sfDir).collect().toSeq
    assert(a == b)
  }
}
