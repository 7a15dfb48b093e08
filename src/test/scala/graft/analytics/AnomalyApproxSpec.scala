package graft.analytics

import graft.SparkSpec

/** A39a — the sketch face of the anomaly fence must track the exact
  * face closely enough that the gate decision is the same in practice:
  * fences within the sketch's error band, flagged counts within a few
  * events per type. */
class AnomalyApproxSpec extends SparkSpec {

  test("approx fence tracks the exact fence; flagged counts drift by at most a few") {
    val exact = LakeQueries.q38EventAnomaly(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = LakeQueries.q38EventAnomalyApprox(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    approx.foreach { case (t, a) =>
      val e = exact(t)
      assert(a.getAs[Long]("events") == e.getAs[Long]("events"))
      // at accuracy 10000 the sketch quantiles sit within a tight
      // relative band of the exact order statistics
      val (fa, fe) = (a.getAs[Double]("fence"), e.getAs[Double]("fence"))
      assert(math.abs(fa - fe) / fe <= 0.05, s"$t: fence $fa vs exact $fe")
      // a slightly different fence moves only the events between the
      // two fences — the far tail is identical
      val (na, ne) = (a.getAs[Long]("anomalies"), e.getAs[Long]("anomalies"))
      assert(math.abs(na - ne) <= math.max(3L, ne / 5),
        s"$t: flagged $na vs exact $ne")
    }
    val again = LakeQueries.q38EventAnomalyApprox(spark, sfDir).collect()
    assert(approx.values.map(_.toString).toSeq.sorted ==
      again.map(_.toString).toSeq.sorted, "deterministic")
  }
}
