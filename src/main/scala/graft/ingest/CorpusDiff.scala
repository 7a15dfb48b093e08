package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Text
import graft.sources.Tables

/** C69: CONTENT-level corpus diff — "what changed between yesterday's
  * corpus and today's?", the dataset-versioning card that pairs with
  * [[Snapshots]] time travel: B8's zone diff answers it for FILES, this
  * answers it for DOCUMENTS (a rewritten file can carry 99% identical
  * rows — file-level diff calls that a full change; content diff says
  * exactly which documents were added / removed / modified).
  *
  * Plan shape at 100 TB: both sides collapse to (id, group, content
  * hash) — the md5 content key every dedup face already derives — and
  * meet in ONE co-partitioned full-outer equi-join on the id (the B11
  * CDC-merge shape); status is a per-row case; the report is a tiny
  * (group × status) aggregate. Nothing ever pairs beyond the id join,
  * and with both snapshots bucketed on the id (the LakeWriter layout)
  * the join runs shuffle-free.
  */
object CorpusDiff {

  /** Per-row diff status of `newDf` vs `oldDf` (both need `idCol` +
    * `hashCol`, plus `groupCol` carried through): one row per id seen
    * on either side, with status added / removed / modified /
    * unchanged. */
  def diff(oldDf: DataFrame, newDf: DataFrame,
           idCol: String, groupCol: String, hashCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("id"), col(groupCol).as("g_old"),
      col(hashCol).as("h_old"))
    val n = newDf.select(col(idCol).as("id"), col(groupCol).as("g_new"),
      col(hashCol).as("h_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"), coalesce(col("g_new"), col("g_old")).as(groupCol),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "modified")
          .otherwise("unchanged").as("status"))
  }

  /** The per-group diff card: counts per (group, status) + integer-bp
    * share of the group's UNION population. */
  def card(oldDf: DataFrame, newDf: DataFrame,
           idCol: String, groupCol: String, hashCol: String): DataFrame = {
    val perGroup = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    diff(oldDf, newDf, idCol, groupCol, hashCol)
      .groupBy(col(groupCol), col("status")).agg(count(lit(1)).as("docs"))
      .withColumn("grp_docs", sum(col("docs")).over(perGroup))
      .select(col(groupCol), col("status"), col("docs"),
        expr("docs * 10000 div grp_docs").as("share_bp"))
      .orderBy(col(groupCol), col("status"))
  }

  /** Deterministic previous-day simulation used by the query face (and
    * mirrored verbatim in the DuckDB oracle): the "old" corpus drops
    * ids ≡ 5 (mod 11) — those read as ADDED since — and carries a
    * pre-edit text for ids ≡ 2 (mod 13) — those read as MODIFIED; the
    * "new" corpus drops ids ≡ 4 (mod 9) — those read as REMOVED. */
  private def oldFace(d: DataFrame): DataFrame =
    d.where(col("doc_id") % 11 =!= 5)
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 13 === 2, concat(col("text"), lit(" legacy")))
          .otherwise(col("text")).as("text"))

  /** C69 query face over documents. */
  def corpusDiffQuery(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("doc_id"), col("source"), col("text"))
    val keyed = (df: DataFrame) => df.withColumn("h", Text.contentHash(col("text")))
    card(keyed(oldFace(d)), keyed(d.where(col("doc_id") % 9 =!= 4)),
      "doc_id", "source", "h")
  }

  /** C69 oracle: the identical split/edit rules in DuckDB SQL. */
  val oracle: String =
    """WITH cur AS (
      |  SELECT doc_id, source,
      |         md5(trim(regexp_replace(lower(text),'\s+',' ','g'))) AS h,
      |         md5(trim(regexp_replace(lower(text||' legacy'),'\s+',' ','g'))) AS h_edit
      |  FROM documents),
      |o AS (SELECT doc_id, source,
      |             CASE WHEN doc_id % 13 = 2 THEN h_edit ELSE h END AS h
      |      FROM cur WHERE doc_id % 11 <> 5),
      |n AS (SELECT doc_id, source, h FROM cur WHERE doc_id % 9 <> 4),
      |d AS (
      |  SELECT coalesce(n.doc_id, o.doc_id) AS doc_id,
      |         coalesce(n.source, o.source) AS source,
      |         CASE WHEN o.h IS NULL THEN 'added'
      |              WHEN n.h IS NULL THEN 'removed'
      |              WHEN o.h <> n.h THEN 'modified'
      |              ELSE 'unchanged' END AS status
      |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id),
      |c AS (SELECT source, status, count(*) AS docs FROM d GROUP BY 1, 2)
      |SELECT source, status, docs,
      |       CAST(docs * 10000 // sum(docs) OVER (PARTITION BY source) AS BIGINT) AS share_bp
      |FROM c ORDER BY source, status""".stripMargin
}
