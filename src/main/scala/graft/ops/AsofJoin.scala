package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** As-of (point-in-time) join — for each left row, the LATEST right row
  * of the same key with `rightTime <= leftTime`. Spark has no native
  * operator for this (DuckDB/kdb/Flink do); the naive spelling is a
  * range join that explodes into O(left × right-per-key) then re-filters.
  *
  * Spark-first plan: tag both sides, UNION them, and run ONE window pass
  * per key ordered by (time, side) carrying the last non-null right
  * payload — every left row picks up exactly the right row an as-of
  * semantics demands, with inclusive `=` ties resolved right-first
  * because the right side sorts before the left at equal times.
  *
  * Scale shape: a single shuffle on the key (the union is narrow), and
  * the window's running `last(…, ignoreNulls)` frame never buffers more
  * than the sorter's spill pages — there is no per-key materialized
  * cross product anywhere. At 100 TB this is the same cost as any
  * keyed window over the event history.
  */
object AsofJoin {

  /** Generic as-of join. `right`'s non-key columns (including
    * `rightTime`) must not collide with `left`'s column names — rename
    * before calling. Unmatched left rows keep null right columns. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String): DataFrame = {
    val rightVals = right.columns.filterNot(keys.contains).toSeq
    val rvStruct = struct(rightVals.map(col): _*)
    val rvType = right.select(rvStruct.as("__rv")).schema.head.dataType
    val lrowType = left.select(struct(left.columns.toSeq.map(col): _*).as("__lrow"))
      .schema.head.dataType

    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__side"),
        rvStruct.as("__rv"), lit(null).cast(lrowType).as("__lrow")): _*)
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(rvType).as("__rv"),
        struct(left.columns.toSeq.map(col): _*).as("__lrow")): _*)

    // right rows sort before left rows at equal time (side 0 < 1): the
    // as-of bound is inclusive. __rv is the final tiebreak so duplicate
    // right times resolve deterministically (max payload wins in last()).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__lrow.*") +: rightVals.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** Query face (`asof_join`): click→purchase attribution. For every
    * purchase event, the same user's most recent click at or before it,
    * with the attribution gap in seconds. Clicks are deduplicated to one
    * per (user, ts) — max event_id — so tie resolution is well-defined
    * on both engines (DuckDB's native ASOF JOIN is the oracle). */
  def asofClickAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("__click_ts"))
      .agg(max(col("event_id")).as("click_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    asofJoin(purchases, clicks, Seq("user_id"), "ts", "__click_ts")
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("click_id"),
        date_format(col("__click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("__click_ts"))).as("gap_s"))
      .orderBy(col("event_id"))
  }
}
