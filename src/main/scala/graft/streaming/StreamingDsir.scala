package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Sample

/** D16: the C63 DSIR importance scorer run inline on the intake feed —
  * "does this arriving document look like the target corpus?" answered
  * per row, the moment it arrives, with the same log-weight the batch
  * resampler computes.
  *
  * STATELESS by construction, like D15: the batch fit collapses the
  * target/raw models to a B-entry bucket→log-ratio MAP (B=1024 — a few
  * KB), which rides into the plan as a map literal; scoring is then a
  * pure per-row fold over the document's own hashed n-grams
  * (`aggregate(transform(grams, lookup), 0.0, +)`) — no explode, no
  * aggregation across rows, no watermark, no state store
  * (StreamingDsirSpec pins `stateOperators` empty). Buckets never seen
  * at fit time take the smoothing default ln((R+B)/(T+B)) — exactly
  * what the batch formula assigns a zero-count bucket — so stream docs
  * with novel vocabulary score consistently with a batch re-run.
  *
  * Model posture: like D15 (and unlike the D11/D14 static-join
  * indexes), the ratio map is a versioned artifact baked into the
  * plan — a refit lands by restarting the query, an explicit cutover.
  */
object StreamingDsir {

  /** A fitted DSIR scorer: hashed-bucket log-ratios, the unseen-bucket
    * smoothing default, and the bucket count. */
  final case class DsirModel(ratios: Map[Long, Double], default: Double, buckets: Int)

  /** Batch-side fit (fit-on-corpus, score-everywhere): builds the
    * smoothed target-vs-raw log-ratio table over `docs` (needs `text`)
    * and collects it — B rows, metadata-scale. */
  def fit(docs: DataFrame, isTarget: Column, buckets: Int = Sample.DsirBuckets): DsirModel = {
    val tab = Sample.dsirRatioTable(docs, isTarget, buckets)
      .select(col("b"), col("lr"), col("tt"), col("rt"))
      .collect()
    // EMPTY fit corpus (first deploy, round-12 degenerate sweep): the
    // ratio table has no rows, and the smoothing default at tt=rt=0 is
    // ln(1/B)−ln(1/B) = 0 — every arrival scores logw 0, the neutral
    // weight, exactly what the batch formula would assign
    if (tab.isEmpty) DsirModel(Map.empty, 0.0, buckets)
    else {
      val ratios = tab.map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val (tt, rt) = (tab.head.getLong(2), tab.head.getLong(3))
      val default = math.log(1.0 / (tt + buckets)) - math.log(1.0 / (rt + buckets))
      DsirModel(ratios, default, buckets)
    }
  }

  /** Score an arriving documents frame (needs `text`): original
    * columns + `logw` = the DSIR importance log-weight. */
  def scoreStream(docs: DataFrame, m: DsirModel): DataFrame = {
    val ratioMap = typedlit(m.ratios)
    val perGram = transform(Sample.dsirGrams(col("text")), g =>
      coalesce(
        element_at(ratioMap, pmod(xxhash64(g), lit(m.buckets.toLong))),
        lit(m.default)))
    docs.withColumn("logw", aggregate(perGram, lit(0.0), (acc, x) => acc + x))
  }

  /** The admit gate: arrivals whose log-weight clears `minLogw` pass —
    * the streaming half of "only keep raw data that resembles the
    * target distribution". */
  def gateStream(docs: DataFrame, m: DsirModel, minLogw: Double): DataFrame =
    scoreStream(docs, m).where(col("logw") >= minLogw)
}
