package graft.ingest

import org.apache.spark.sql.DataFrame

/** Layout-change (schema evolution) handling.
  *
  * Reference: tables flagged in a layout-changed config are re-read with
  * `mergeSchema=True` and rewritten compacted (DATALAKE_TRANSFORMATION_S3_
  * DAILY_JOB.PY:237–248). Old files simply lack the new columns.
  *
  * Spark-first: `unionByName(allowMissingColumns = true)` expresses the
  * same null-filling union declaratively, so Catalyst prunes and pushes
  * down through it; the storage-side equivalent is the mergeSchema scan in
  * [[graft.sources.Tables.mergedSchema]].
  */
object SchemaEvolution {
  /** Union frames with evolving layouts; missing columns become nulls. */
  def mergeLayouts(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty, "mergeLayouts needs at least one frame")
    frames.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
  }
}
