package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingAsofSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
  private def sec(t: Timestamp) = t.getTime / 1000

  private type Row4 = (Long, Long, Timestamp, String)

  private def run(name: String)(feed: (MemoryStream[Row4],
      org.apache.spark.sql.streaming.StreamingQuery) => Unit): Set[(Long, Long, Long, Option[Long], Option[Long], Option[Long])] = {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Row4]
    val q = StreamingAsof.attributionStream(
        stream.toDF().toDF("user_id", "event_id", "ts", "event_type"),
        watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      feed(stream, q)
      // two sentinel batches: the watermark a batch computes only takes
      // effect for the NEXT batch
      stream.addData((999999999L, 0L, Timestamp.valueOf("2030-01-01 00:00:00"), "click"))
      q.processAllAvailable()
      stream.addData((999999999L, 1L, Timestamp.valueOf("2030-01-02 00:00:00"), "click"))
      q.processAllAvailable()
      spark.table(name)
        .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long])]
        .collect().toSet
    } finally q.stop()
  }

  test("purchases attribute to the latest prior-or-equal click; none -> null") {
    val got = run("asof_basic") { (stream, q) =>
      stream.addData(
        (7L, 1L, ts(1, 0), "click"),
        (7L, 2L, ts(1, 20), "click"),
        (7L, 3L, ts(1, 20), "click"),   // same-second duplicate: max id wins
        (7L, 4L, ts(1, 30), "purchase"),
        (7L, 5L, ts(2, 0), "click"),    // after the purchase: must not win
        (9L, 6L, ts(1, 0), "purchase")) // no click at all for user 9
      q.processAllAvailable()
    }
    assert(got.contains((4L, 7L, sec(ts(1, 30)), Some(3L), Some(sec(ts(1, 20))), Some(600L))),
      s"latest prior click with max-id tiebreak must win, got $got")
    assert(got.contains((6L, 9L, sec(ts(1, 0)), None, None, None)),
      s"clickless purchase must emit null-attributed, got $got")
  }

  test("a click at exactly the purchase time wins (inclusive as-of bound)") {
    val got = run("asof_tie") { (stream, q) =>
      stream.addData(
        (7L, 1L, ts(1, 0), "click"),
        (7L, 2L, ts(1, 30), "click"),
        (7L, 3L, ts(1, 30), "purchase"))
      q.processAllAvailable()
    }
    assert(got.contains((3L, 7L, sec(ts(1, 30)), Some(2L), Some(sec(ts(1, 30))), Some(0L))),
      s"equal-time click must attribute with gap 0, got $got")
  }

  test("a late click arriving in a later batch still wins before finalization") {
    val got = run("asof_late") { (stream, q) =>
      stream.addData((7L, 1L, ts(1, 0), "click"), (7L, 2L, ts(1, 30), "purchase"))
      q.processAllAvailable()
      // above the watermark (wm = 1:30 - 10 min = 1:20 at most), between
      // the first click and the purchase: must replace the attribution
      stream.addData((7L, 3L, ts(1, 25), "click"))
      q.processAllAvailable()
    }
    assert(got.contains((2L, 7L, sec(ts(1, 30)), Some(3L), Some(sec(ts(1, 25))), Some(300L))),
      s"cross-batch late click must re-attribute the pending purchase, got $got")
    assert(!got.exists(r => r._1 == 2L && r._4.contains(1L)),
      "the stale attribution must never emit")
  }

  test("anchor compaction: attribution survives clicks far below the watermark") {
    val got = run("asof_anchor") { (stream, q) =>
      stream.addData((7L, 1L, ts(0, 0), "click"))
      q.processAllAvailable()
      stream.addData((42L, 2L, ts(8, 0), "click")) // watermark >> user 7's click
      q.processAllAvailable()
      // the purchase arrives hours later: the compacted anchor must win
      stream.addData((7L, 3L, ts(9, 0), "purchase"))
      q.processAllAvailable()
    }
    assert(got.contains((3L, 7L, sec(ts(9, 0)), Some(1L), Some(sec(ts(0, 0))),
      Some(sec(ts(9, 0)) - sec(ts(0, 0))))),
      s"anchored click must attribute a much-later purchase, got $got")
  }

  test("jittered out-of-order replay still matches the batch face") {
    // deliver events out of TIME order, bounded by +-3 min of jitter —
    // under a 10-min watermark delay every event stays admissible, so
    // the final attributions must be exactly the batch answer even
    // though clicks and purchases arrive shuffled across micro-batches
    val events = graft.sources.Tables(spark, sfDir, "events")
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts"), col("event_type"))
      .as[Row4].collect()
    val jittered = events.sortBy { r =>
      val jitterMs = (r._2 * 2654435761L % 360000L) - 180000L // +-3 min
      r._3.getTime + jitterMs
    }
    val chunks = jittered.grouped(math.max(1, jittered.length / 9)).toSeq
    val streaming = run("asof_jitter") { (stream, q) =>
      chunks.foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
    }.filter(_._2 != 999999999L)
      .map(r => r._1 -> (r._4, r._6)).toMap
    val batch = graft.ops.AsofJoin.asofClickAttribution(spark, sfDir)
      .select(col("event_id"), col("click_id"), col("gap_s"))
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    assert(streaming == batch,
      s"jittered replay diverged: ${(batch.toSet diff streaming.toSet).take(3)} / " +
        s"${(streaming.toSet diff batch.toSet).take(3)}")
  }

  test("incremental replay of the events table matches the batch asof_join face") {
    val events = graft.sources.Tables(spark, sfDir, "events")
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts"), col("event_type"))
      .as[Row4].collect().sortBy(r => (r._3.getTime, r._2))
    val chunks = events.grouped(math.max(1, events.length / 7)).toSeq

    val streaming = run("asof_replay") { (stream, q) =>
      chunks.foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
    }.filter(_._2 != 999999999L)
      .map(r => r._1 -> (r._4, r._6)).toMap

    val batch = graft.ops.AsofJoin.asofClickAttribution(spark, sfDir)
      .select(col("event_id"), col("click_id"), col("gap_s"))
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap

    assert(streaming.keySet == batch.keySet,
      s"replay must finalize every purchase: ${(batch.keySet diff streaming.keySet).take(5)} missing, " +
        s"${(streaming.keySet diff batch.keySet).take(5)} extra")
    streaming.foreach { case (id, attr) =>
      assert(attr == batch(id), s"purchase $id: streaming $attr vs batch ${batch(id)}")
    }
  }
}
