package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D17: the A39 value-anomaly fence run inline on the event intake —
  * a mis-scaled feed (cents-vs-dollars, a stuck sensor) is flagged the
  * micro-batch it arrives, not at the nightly card.
  *
  * Posture: the per-type fences are a TINY STATIC FRAME joined
  * stream-static per micro-batch (the D11/D13 "current table" posture
  * — a nightly fence refresh from the batch A39 card is picked up
  * live, no restart), and the flag itself is a per-row comparison:
  * STATELESS — no watermark, no aggregation, no state store
  * (StreamingAnomalySpec pins `stateOperators` empty). Types absent
  * from the fence table pass un-flagged (left join, flag null→false):
  * an unknown event type is a schema question for B13's expectations
  * gate, not a value anomaly.
  */
object StreamingAnomaly {

  /** Flag an arriving events frame (needs `event_type`, `value`):
    * original columns + `is_anomaly`. `fences` is (event_type, fence)
    * — A39's card or any per-type bound table. */
  def flagStream(events: DataFrame, fences: DataFrame): DataFrame =
    events.join(broadcast(fences.select(col("event_type"), col("fence"))),
        Seq("event_type"), "left")
      .withColumn("is_anomaly",
        coalesce(col("value") > col("fence"), lit(false)))
      .drop("fence")

  /** The quarantine gate: anomalous arrivals are held out (the
    * reference's FAILED_TO_CONVERT posture for values — route, don't
    * drop silently). Returns the CLEAN stream. */
  def gateStream(events: DataFrame, fences: DataFrame): DataFrame =
    flagStream(events, fences).where(!col("is_anomaly")).drop("is_anomaly")
}
