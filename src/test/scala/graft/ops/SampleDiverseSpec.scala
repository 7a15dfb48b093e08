package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C91 — D4-style prototype pruning; C90 gets its correctness from the
  * DuckDB oracle, so only its structural invariants are pinned here. */
class SampleDiverseSpec extends SparkSpec {

  test("sample_diverse: ceil arithmetic, exhaustive partition, threshold property") {
    val flags = VectorQueries.sampleDiverseFlags(spark, sfDir, 0.25).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val corpus = graft.sources.Tables(spark, sfDir, "embeddings").count()
    assert(flags.length == corpus, "every vector is flagged exactly once")
    assert(flags.map(_._1).distinct.length == flags.length)
    flags.groupBy(_._2).foreach { case (c, rows) =>
      val n = rows.length
      val dropped = rows.count(!_._4)
      assert(dropped == math.ceil(0.25 * n).toLong, s"cluster $c: $dropped of $n")
      // no kept member more prototypical than any dropped one (ties
      // break to the lower vec_id, so compare the (proto, -id) order)
      val worstDropped = rows.filter(!_._4).map(r => (r._3, -r._1)).minOption
      val bestKept = rows.filter(_._4).map(r => (r._3, -r._1)).maxOption
      (worstDropped, bestKept) match {
        case (Some(d), Some(k)) =>
          assert(Ordering[(Double, Long)].lteq(k, d),
            s"cluster $c keeps a vector more prototypical than a dropped one")
        case _ =>
      }
    }
    // the card aggregates exactly these flags
    val card = VectorQueries.sampleDiverse(spark, sfDir).collect()
    assert(card.map(_.getAs[Long]("n")).sum == corpus)
    card.foreach { r =>
      assert(r.getAs[Long]("n") ==
        r.getAs[Long]("dropped") + r.getAs[Long]("kept"))
      assert(r.getAs[Long]("drop_bp") ==
        r.getAs[Long]("dropped") * 10000 / r.getAs[Long]("n"))
    }
    val sizes = flags.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    card.foreach(r =>
      assert(sizes(r.getAs[Long]("cluster")) == r.getAs[Long]("n")))
  }

  test("sample_diverse: deterministic; dropShare=0 keeps everything") {
    val a = VectorQueries.sampleDiverse(spark, sfDir).collect().map(_.toSeq).toSeq
    val b = VectorQueries.sampleDiverse(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(a == b)
    val none = VectorQueries.sampleDiverseFlags(spark, sfDir, 0.0).collect()
    assert(none.forall(_.getBoolean(3)), "dropShare 0 must keep every vector")
  }

  test("embed_divergence: symmetric-zero self-check and plan shape") {
    val got = VectorQueries.embedDivergence(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
      // W2² decomposes into two non-negative halves
      assert(r.getAs[Double]("mean_gap_sq") >= 0.0)
      assert(r.getAs[Double]("var_gap") >= -1e-9)
      assert(math.abs(r.getAs[Double]("frechet_d2") -
        r.getAs[Double]("mean_gap_sq") - r.getAs[Double]("var_gap")) <= 2e-4,
        "total must be the sum of its published halves (round-4 noise only)")
    }
    val plan = VectorQueries.embedDivergence(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"pair stage must equi-join:\n$plan")
  }

  test("sample_diverse plan: no cartesian, no pair stage") {
    val plan = VectorQueries.sampleDiverse(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
