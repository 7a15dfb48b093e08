package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C38b sim_search_opq_rot — full-rotation OPQ. Rows-only CORRECTNESS
  * entry; this spec is its oracle: rotation orthonormality, monotone
  * descent of the OPQ objective across refine sweeps, recall on a
  * MIXED anisotropic corpus that no axis permutation can unscramble,
  * no-regression + determinism on the real (near-isotropic) corpus. */
class OpqSpec extends SparkSpec {
  import spark.implicits._

  private val (numSub, subDim, k) = (8, 8, 16)
  private val dim = numSub * subDim

  private lazy val unit = {
    val v = Vectors.withNorm(
      graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
    v.select(col("vec_id"), transform(col("e"), x => x / col("nrm")).as("e"))
  }

  /** Sylvester-construction Hadamard matrix scaled to orthonormal —
    * a deterministic DENSE rotation: every mixed dim is a ±1/8
    * combination of ALL natural dims, so marginal variances equalize
    * and axis permutations lose all signal about the dominant
    * directions. */
  private def hadamard(n: Int): Array[Array[Double]] = {
    var h = Array(Array(1.0))
    while (h.length < n) {
      val m = h.length
      h = Array.tabulate(2 * m, 2 * m) { (i, j) =>
        val s = h(i % m)(j % m)
        if (i >= m && j >= m) -s else s
      }
    }
    val scale = 1.0 / math.sqrt(n)
    h.map(_.map(_ * scale))
  }

  /** Dominant dims 0–7 scaled 16×, then Hadamard-mixed: anisotropic
    * energy spread across ALL natural axes with heavy cross-dim
    * correlation — the regime where C38a's permutation is provably
    * stuck (marginal variances are near-equal) but a learned rotation
    * can recover the latent axes. */
  private lazy val mixed: DataFrame = {
    val aniso = graft.sources.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        transform(Vectors.toDouble(col("embedding")),
          (x, i) => when(i < 8, x * 16.0).otherwise(x)).as("e"))
    val m = Opq.rotate(aniso, hadamard(dim))
    m.withColumn("nrm", Vectors.norm(col("e")))
      .select(col("vec_id"), col("e"), col("nrm"))
      .localCheckpoint(true)
  }

  private def orthonormal(r: Array[Array[Double]]): Unit = {
    val n = r.length
    for (a <- 0 until n; b <- a until n) {
      val d = (0 until n).map(i => r(i)(a) * r(i)(b)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"col $a · col $b = $d, want $want")
    }
  }

  /** recall@10 of `res` against exact cosine truth over frame `v`
    * (vec_id, e, nrm), queries vec_id < 5 — the PqSpec recount. */
  private def recall(v: DataFrame, res: DataFrame): Double = {
    val vecs = v.select(col("vec_id"),
        transform(col("e"), x => x / col("nrm")).as("e"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val dot = (a: Seq[Double], b: Seq[Double]) =>
      a.zip(b).map { case (x, y) => x * y }.sum
    val truth = (0L until 5L).map { q =>
      val qe = vecs.find(_._1 == q).get._2
      q -> vecs.filter(_._1 != q).map { case (id, e) => (dot(qe, e), id) }
        .sortBy { case (c, id) => (-c, id) }.take(10).map(_._2).toSet
    }.toMap
    val got = res.select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    truth.keys.toSeq.sorted.map { q =>
      truth(q).intersect(got.getOrElse(q, Set.empty)).size / 10.0
    }.sum / truth.size
  }

  test("pcaAllocRotation and the refined rotation are orthonormal") {
    val r0 = Opq.pcaAllocRotation(unit, numSub, subDim)
    orthonormal(r0)
    val (r, _) = Opq.refine(unit, r0, numSub, subDim, k, sweeps = 2)
    orthonormal(r)
  }

  test("the OPQ objective descends monotonically across refine sweeps") {
    val r0 = Opq.pcaAllocRotation(mixed
      .select(col("vec_id"), transform(col("e"), x => x / col("nrm")).as("e")),
      numSub, subDim)
    val u = mixed.select(col("vec_id"),
      transform(col("e"), x => x / col("nrm")).as("e")).localCheckpoint(true)
    val errs = (0 to 3).map { s =>
      val (r, cb) = Opq.refine(u, r0, numSub, subDim, k, sweeps = s)
      Opq.quantError(u, r, cb, numSub, subDim)
    }
    info(s"objective by sweep count: ${errs.mkString(", ")}")
    errs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-6, s"objective rose: $a -> $b (all: $errs)")
    }
  }

  test("rotation recovers recall on a mixed corpus no permutation can fix") {
    // a TIGHT candidate budget (20 of ~500, vs the faces' default 100)
    // so the quality of the ADC ordering — not the rescore — decides
    // recall; at cand=100 every face saturates at this corpus size
    val rPerm = recall(mixed, ProductQuant.pqTopK(mixed, balance = true, cand = 20))
    val rPlain = recall(mixed, ProductQuant.pqTopK(mixed, balance = false, cand = 20))
    val rRot = recall(mixed, Opq.opqTopK(mixed, cand = 20))
    info(s"mixed-corpus recall@10: rot=$rRot perm=$rPerm plain=$rPlain")
    assert(rRot >= rPerm + 0.05,
      s"rotation must measurably beat the permutation face on mixed data " +
        s"(rot=$rRot perm=$rPerm plain=$rPlain)")
    assert(rRot >= 0.85, s"rotated-PQ recall@10 $rRot")
  }

  test("on the (isotropic) corpus OPQ-rot matches PQ and is deterministic") {
    val brute = VectorQueries.simSearchTopk(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val res = Opq.simSearchOpqRot(spark, sfDir)
    val got = res.select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = brute.keys.toSeq.sorted.map { q =>
      brute(q).intersect(got.getOrElse(q, Set.empty)).size.toDouble / brute(q).size
    }
    val mean = recalls.sum / recalls.size
    info(s"corpus recall@10: $mean")
    assert(mean >= 0.75, s"OPQ-rot mean recall@10 $mean on the corpus")
    val a = res.collect().map(_.toString).toSeq
    val b = Opq.simSearchOpqRot(spark, sfDir).collect().map(_.toString).toSeq
    assert(a == b, "OPQ-rot search is deterministic run over run")
  }
}
