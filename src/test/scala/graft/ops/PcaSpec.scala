package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C61 embed_pca — PCA reduce/whiten. Rows-only CORRECTNESS entry;
  * this spec is its oracle: basis orthonormality, projection-variance
  * == eigenvalue recount, whitening contract, residual-energy
  * identity, face shape, determinism. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  private lazy val unit = {
    val v = Vectors.withNorm(
      graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
    v.select(col("vec_id"), transform(col("e"), x => x / col("nrm")).as("e"))
      .localCheckpoint(true)
  }
  private lazy val model = Pca.fit(unit, dim)

  test("basis is orthonormal, eigenvalues descend and are non-negative") {
    for (a <- 0 until dim; b <- a until dim) {
      val d = (0 until dim).map(i => model.basis(i)(a) * model.basis(i)(b)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"col $a · col $b = $d")
    }
    model.eigenvalues.sliding(2).foreach { case Array(x, y) =>
      assert(x >= y - 1e-12, "descending")
    }
    assert(model.eigenvalues.last >= -1e-9, "PSD covariance")
  }

  test("per-component projection variance equals its eigenvalue") {
    val p = Pca.project(unit, model, k = 4)
    val vars = p.select((0 until 4).map(c =>
      var_pop(col("p").getItem(c)).as(s"v$c")): _*).collect()(0)
    (0 until 4).foreach { c =>
      val got = vars.getDouble(c)
      val want = model.eigenvalues(c)
      assert(math.abs(got - want) <= 1e-9 + 1e-6 * want, s"comp $c: $got vs $want")
    }
  }

  test("whitened projections carry unit variance") {
    val p = Pca.project(unit, model, k = 4, whiten = true)
    val vars = p.select((0 until 4).map(c =>
      var_pop(col("p").getItem(c)).as(s"v$c")): _*).collect()(0)
    (0 until 4).foreach { c =>
      assert(math.abs(vars.getDouble(c) - 1.0) < 1e-6, s"comp $c var ${vars.getDouble(c)}")
    }
  }

  test("residual energy at k equals the tail eigenvalue sum (driver recount)") {
    val vecs = unit.select(col("vec_id"), col("e")).as[(Long, Seq[Double])]
      .collect()
    val n = vecs.length
    def residual(k: Int): Double = vecs.map { case (_, e) =>
      val c = Array.tabulate(dim)(i => e(i) - model.mean(i))
      // energy of the centered vector minus energy captured by top-k
      val captured = (0 until k).map { comp =>
        val p = (0 until dim).map(i => c(i) * model.basis(i)(comp)).sum
        p * p
      }.sum
      c.map(x => x * x).sum - captured
    }.sum
    Seq(8, 32).foreach { k =>
      val got = residual(k)
      val want = model.eigenvalues.drop(k).sum * n
      assert(math.abs(got - want) <= 1e-6 * math.max(1.0, want),
        s"k=$k residual $got vs tail-eigensum $want")
    }
    assert(residual(dim) <= 1e-6, "full basis reconstructs exactly")
  }

  test("query face: 16 rows, nondecreasing cumulative shares, deterministic") {
    val rows = Pca.embedPca(spark, sfDir)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(rows.length == 16)
    assert(rows.map(_._1).toSeq == (0 until 16))
    rows.foreach { case (_, bp, cum) =>
      assert(bp >= 0 && cum <= 10001, s"bp=$bp cum=$cum")
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3, "cumulative share nondecreasing")
    }
    val again = Pca.embedPca(spark, sfDir).as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(rows.toSeq == again.toSeq, "deterministic")
  }
}
