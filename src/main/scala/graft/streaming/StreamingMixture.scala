package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Text

/** D24: SOURCE-MIX drift monitor on the intake feed — the streaming
  * face of the mixture family (C55 plans the mix, C96 applies it;
  * this watches the RAW intake it all assumes). A crawler that stalls
  * on one domain, a feed that re-delivers a backlog, or a new source
  * appearing unannounced shifts the per-window token share long
  * before the nightly corpus card notices — and a mixture computed
  * against yesterday's shares silently mis-weights today's corpus.
  *
  * Shape: per-source windowed token rollup, then a CHAINED event-time
  * window aggregation (Spark's multiple-stateful-operator support)
  * collapses each closed window to one row carrying every source —
  * which is what turns counts into SHARES without a stream-stream
  * join: the window total and the per-source list ride one state
  * row. The baseline is the batch-fit S-row natural-share frame,
  * broadcast and re-planned per micro-batch (same current-table
  * posture as D21/D23: a nightly refresh is picked up without
  * restart). State is bounded by the watermark horizon; everything
  * after the two aggs is stateless projection.
  */
object StreamingMixture {

  /** Batch-fit baseline: each source's natural share of the standing
    * corpus's token budget, integer bp (the C55 `natural_bp` column).
    * Persist and refresh nightly; the monitor broadcasts it. */
  def sourceShareBaseline(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    docs
      .select(col("source"), size(Text.tokens(col("text"))).cast("long").as("tok"))
      .groupBy(col("source")).agg(sum(col("tok")).as("tokens"))
      .withColumn("__t", sum(col("tokens")).over(w))
      .select(col("source"), expr("(tokens * 10000) div __t").as("base_bp"))
  }

  /** The monitor. Per (event-time window × source): arrivals, token
    * mass, the window's integer-bp token share, the baseline share,
    * and the `drifted` flag — |live − baseline| beyond `tolBp`, or a
    * source with NO baseline row (a brand-new feed is novel by
    * definition — the D21/D23 no-baseline rule). Two-sided: a source
    * VANISHING from the mix is exactly as alarming as one flooding
    * it, but a vanished source emits no row, so downstream pairs this
    * with the baseline frame for absence checks; within emitted rows
    * the flag catches floods AND starvation.
    * Emits (window_start, window_end, source, n_docs, tokens,
    * share_bp, base_bp, drifted). */
  def shareDriftStream(docs: DataFrame, baseline: DataFrame,
      tsCol: String, windowDur: String = "1 hour",
      tolBp: Long = 1500L,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val perSrc = docs.withWatermark(tsCol, watermarkDelay)
      .select(col("source"), col(tsCol),
        size(Text.tokens(col("text"))).cast("long").as("tok"))
      .groupBy(window(col(tsCol), windowDur), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tokens"))
    // chained event-time agg: one state row per closed window carrying
    // the total AND the per-source breakdown — shares need no second
    // shuffle and no stream-stream join
    val perWin = perSrc
      .groupBy(window(col("window"), windowDur))
      .agg(sum(col("tokens")).as("win_tokens"),
        collect_list(struct(col("source"), col("n_docs"), col("tokens")))
          .as("xs"))
    perWin
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("win_tokens"), explode(col("xs")).as("x"))
      .select(col("window_start"), col("window_end"),
        col("x.source").as("source"), col("x.n_docs").as("n_docs"),
        col("x.tokens").as("tokens"),
        expr("(x.tokens * 10000) div greatest(win_tokens, 1)").as("share_bp"))
      .join(broadcast(baseline.select(col("source"), col("base_bp"))),
        Seq("source"), "left")
      .select(col("window_start"), col("window_end"), col("source"),
        col("n_docs"), col("tokens"), col("share_bp"), col("base_bp"),
        (col("base_bp").isNull ||
          abs(col("share_bp") - col("base_bp")) > tolBp).as("drifted"))
  }
}
