package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Vectors

/** D20: the C79 vector probe run on an ARRIVING embedding feed — flag
  * each incoming vector that near-duplicates the standing corpus, at
  * intake time rather than in the nightly batch.
  *
  * Shape: the MODEL (coarse centroids, residual codebook, SDC tables —
  * all model-scale) collapses into broadcast literals at stream start,
  * so assignment, residual coding, and the SDC gate are one narrow
  * stateless projection per arriving vector (the D19 posture: model
  * fixed at start, refresh = restart). The corpus-scale pieces stay
  * FRAMES: candidates form by a stream-static equi-join on the
  * assigned cluster against the standing `vcodes` table, and the exact
  * confirm is a second stream-static join that touches standing floats
  * only for candidate rows — both re-planned per micro-batch, so a
  * nightly index refresh is picked up without a restart (the D11
  * trade, the opposite of the literal model). The only state is
  * `dropDuplicatesWithinWatermark` on vec_id so each flagged vector
  * emits once inside the watermark horizon.
  *
  * Parity contract (StreamingVectorsSpec): replaying a batch through
  * this face flags EXACTLY the vectors [[graft.ops.SemanticPq]]'s
  * batch probe flags — same frozen model, same margin, same confirm.
  * Flag-only output (no n_near/best_cos): per-vector aggregation in a
  * stream would need stateful aggregation; counts belong to the
  * nightly batch card.
  */
object StreamingVectors {

  private def l2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** `vecs` is a STREAMING (vec_id, e, nrm, tsCol) frame; `cents`,
    * `cb`, `codes` are the stored vector-index tables
    * ([[graft.ops.IncrementalIndex.writeVecIndex]] layout); `standing`
    * is the cold corpus (vec_id, e, nrm) read only for candidate
    * confirm. Emits (vec_id, tsCol) once per flagged vector. */
  def nearDupStream(vecs: DataFrame, cents: DataFrame, cb: DataFrame,
      codes: DataFrame, standing: DataFrame, tsCol: String,
      tau: Double = 0.35, margin: Double = 0.25,
      numSub: Int = 16, subDim: Int = 4,
      watermarkDelay: String = "1 hour"): DataFrame = {
    // ---- model → literals (driver-side, once, at plan time) ----
    val centRows = cents.orderBy(col("cluster")).collect().map { r =>
      (r.getAs[Long]("cluster"),
        r.getAs[scala.collection.Seq[Double]]("ce").toSeq,
        r.getAs[Double]("cn"))
    }
    val centsArr = array(centRows.map { case (cl, ce, cn) =>
      struct(lit(cl).as("cluster"), typedLit(ce).as("ce"), lit(cn).as("cn"))
    }: _*)
    val unitCentMap = map(centRows.flatMap { case (cl, ce, cn) =>
      Seq(lit(cl), typedLit(ce.map(_ / cn)))
    }: _*)
    val cbRows = cb.collect().map { r =>
      (r.getAs[Int]("m"), r.getAs[Long]("code"),
        r.getAs[scala.collection.Seq[Double]]("cv").toSeq)
    }
    // dense per-subspace codebooks, ascending code id (the codeRemap
    // order, so dense indices agree with the stored codes table)
    val cvs: Seq[Seq[Seq[Double]]] = (0 until numSub).map { m =>
      cbRows.filter(_._1 == m).sortBy(_._2).map(_._3).toSeq
    }
    // SDC tables computed in plain Scala from the same codebooks
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    val dtabs: Seq[Seq[Seq[Double]]] =
      cvs.map(entries => entries.map(a => entries.map(b => d2(a, b))))

    // ---- stateless per-row projection: assign, residual, codes ----
    val assigned = vecs
      .withWatermark(tsCol, watermarkDelay)
      .withColumn("cluster",
        graft.functions.NearestCentroids(col("e"), centsArr, 1).getItem(0))
      .withColumn("r", zip_with(
        transform(col("e"), x => x / col("nrm")),
        element_at(unitCentMap, col("cluster")),
        (x, y) => x - y))
    val codeCols = (0 until numSub).map { m =>
      val sv = slice(col("r"), m * subDim + 1, subDim)
      array_min(transform(typedLit(cvs(m)),
        (cv, i) => struct(l2(sv, cv).as("d"), i.as("i")))).getField("i")
    }
    val coded = assigned.withColumn("codes", array(codeCols: _*))

    // ---- stream-static candidate join + SDC gate + exact confirm ----
    val cut = 2.0 * (1.0 - tau + margin)
    val approx = aggregate(
      zip_with(zip_with(col("codes"), col("codes_s"),
        (x, y) => struct(x.as("a"), y.as("b"))), typedLit(dtabs),
        (p, t) => element_at(element_at(t, p.getField("a") + 1),
          p.getField("b") + 1)),
      lit(0.0), (acc, x) => acc + x)
    val cand = coded
      .join(codes.select(col("vec_id").as("s_id"), col("cluster"),
        col("codes").as("codes_s")), Seq("cluster"))
      .where(approx <= cut)
    cand
      .join(standing.select(col("vec_id").as("s_id"), col("e").as("se"),
        col("nrm").as("sn")), Seq("s_id"))
      .where(Vectors.cosine(col("e"), col("se"), col("nrm"), col("sn")) >= tau)
      .select(col("vec_id"), col(tsCol))
      .dropDuplicatesWithinWatermark("vec_id")
  }
}
