package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC upsert — MERGE INTO semantics as one declarative plan.
  *
  * The reference lake is append-only (daily partition overwrite); a
  * changed row can only be fixed by rewriting its whole day. Upsert is
  * the operator that closes that gap: apply a changeset of
  * inserts/updates/deletes to a base table, latest change per key wins.
  *
  * Plan shape at 100 TB: the changeset collapses to one row per key via
  * a keyed window (row_number over seq desc — changes are a fraction of
  * the base, and the window partitions on the merge key, so no task sees
  * more than one key's history), then ONE full-outer equi-join on the
  * key applies it. Two shuffles total, both on the merge key; with the
  * base bucketed on the key (LakeWriter.writeBucketed) the join side of
  * the shuffle disappears entirely.
  *
  * Column semantics: a non-null change value overwrites, a null change
  * value falls back to the base (column-patch, not row-replace); a
  * delete op removes the key; a change for an unseen key inserts it.
  */
object Merge {

  /** Apply `changes` to `base`. `changes` carries base's columns plus
    * `opCol` ('U' upsert / `deleteOp` delete) and `seqCol` (change
    * order; highest wins per key). */
  def upsert(base: DataFrame, changes: DataFrame, key: String,
             opCol: String = "op", seqCol: String = "seq",
             deleteOp: String = "D"): DataFrame = {
    val latest = changes
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(key)).orderBy(col(seqCol).desc)))
      .where(col("__rn") === 1)
      .drop("__rn", seqCol)
    val payload = base.columns.filterNot(_ == key).toSeq
    base.as("b").join(latest.as("c"), Seq(key), "full_outer")
      .where(col(opCol).isNull || col(opCol) =!= deleteOp)
      .select(col(key) +: payload.map(c =>
        coalesce(col(s"c.$c"), col(s"b.$c")).as(c)): _*)
  }
}
