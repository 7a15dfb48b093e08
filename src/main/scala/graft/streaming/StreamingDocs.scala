package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Pipeline, Text}

/** Continuous training-data intake — the batch cleaning pipeline's first
  * two stages (quality gate → exact dedup, graft.ops.Pipeline) run as a
  * stream, for the corpus that arrives as a feed rather than a drop.
  *
  * The quality gate is a narrow codegen'd projection (TokenMarkerStats),
  * identical in both faces. Exact dedup streams as
  * `dropDuplicatesWithinWatermark` on the canonical content hash: state
  * holds one hash per distinct document seen inside the watermark
  * horizon — bounded by the delay window, never by corpus history —
  * which is the honest streaming trade: a duplicate arriving later than
  * the lateness bound is admitted (the nightly batch dedup sweeps those).
  * Keeper semantics differ accordingly: the batch face keeps each
  * cluster's MIN id, the stream keeps the FIRST arrival — equal whenever
  * arrival order follows id order, which StreamingDocsSpec exercises by
  * replaying the corpus in id order against the batch face.
  */
object StreamingDocs {

  /** Quality-gated, hash-deduped view of a streaming documents frame
    * (needs `text` and an event-time column `tsCol` for the watermark).
    * Emits each surviving document once, with its content hash. */
  def cleanStream(docs: DataFrame, tsCol: String,
                  watermarkDelay: String = "1 hour"): DataFrame =
    Pipeline.qualityFilter(docs, "text")
      .withColumn("content_hash", Text.contentHash(col("text")))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")
}
