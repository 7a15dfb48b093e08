package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.ops.{IncrementalIndex, Vectors}

/** Kill-and-restart-from-checkpoint proofs for the STATEFUL streaming
  * faces (D18 windowed volume, D21 drift monitor) — the coverage
  * EventsPipeline's restart spec gives D1, extended to the two faces
  * that carry watermark-bounded aggregation state of their own. The
  * contract under test: stopping mid-stream and resuming from the same
  * checkpoint emits every finalized window EXACTLY once, and the
  * restarted run's total output equals a never-stopped run over the
  * same feed. */
class StreamingRestartSpec extends SparkSpec {
  import spark.implicits._

  /** Run `make` over the file-sourced frame until AvailableNow drains,
    * writing parquet through `chk`. */
  private def drain(src: String, schema: org.apache.spark.sql.types.StructType,
      out: String, chk: String)(make: DataFrame => DataFrame): Unit = {
    val q = make(spark.readStream.schema(schema).parquet(src))
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
  }

  test("D18 volume monitor: restart from checkpoint emits each window exactly once") {
    val events = graft.sources.Tables(spark, sfDir, "events")
      .select(col("ts"), col("event_type"))
    val baseline = StreamingVolume.hourlyBaseline(events)
    val rows = events.as[(Timestamp, String)].collect().sortBy(_._1.getTime)
    val (half1, half2) = rows.splitAt(rows.length / 2)
    val flush = Seq((new Timestamp(rows.last._1.getTime + 86400000L), "flush"))

    val src = tmpDir("vol-rs-src"); val chk = tmpDir("vol-rs-chk")
    val out = tmpDir("vol-rs-out") + "/out"
    val schema = half1.toSeq.toDF("ts", "event_type").schema
    def monitor(df: DataFrame) = StreamingVolume.monitorStream(df, baseline)

    half1.toSeq.toDF("ts", "event_type").write.mode("append").parquet(src)
    drain(src, schema, out, chk)(monitor)         // run 1, then "crash"
    val afterFirst = spark.read.parquet(out).count()
    half2.toSeq.toDF("ts", "event_type").write.mode("append").parquet(src)
    flush.toDF("ts", "event_type").write.mode("append").parquet(src)
    drain(src, schema, out, chk)(monitor)         // restart, same checkpoint

    val got = spark.read.parquet(out).where(col("event_type") =!= "flush")
      .select(col("event_type"), col("hour"), col("events"), col("ratio_bp"))
      .as[(String, Timestamp, Long, Long)].collect()
    assert(got.length.toLong >= afterFirst, "restart extends, never shrinks")
    assert(got.map(r => (r._1, r._2)).distinct.length == got.length,
      "every (type, hour) window must emit EXACTLY once across the restart")

    // a never-stopped run over the same feed produces the same set
    val chk2 = tmpDir("vol-rs-chk2"); val out2 = tmpDir("vol-rs-out2") + "/out"
    drain(src, schema, out2, chk2)(monitor)
    val fresh = spark.read.parquet(out2).where(col("event_type") =!= "flush")
      .select(col("event_type"), col("hour"), col("events"), col("ratio_bp"))
      .as[(String, Timestamp, Long, Long)].collect()
    assert(got.toSet == fresh.toSet,
      "restarted run must equal the never-stopped run window for window")
    assert(got.nonEmpty)
  }

  test("D21 drift monitor: restart from checkpoint emits each window exactly once") {
    val v = Vectors.withNorm(
        graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
      .select(col("vec_id"), col("e"), col("nrm"))
    val root = tmpDir("drift-rs-idx")
    IncrementalIndex.writeVecIndex(root, v)
    val cents = spark.read.parquet(s"$root/vcents")
    val cb = spark.read.parquet(s"$root/vcb")
    val base = spark.read.parquet(s"$root/vbase")

    // deterministic event times spreading the corpus over 3 hours
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = v.as[(Long, Seq[Double], Double)].collect().sortBy(_._1)
      .map { case (id, e, n) =>
        (id, e, n, new Timestamp(t0 + (id % 3) * 3600000L + (id * 7 % 60) * 60000L))
      }.sortBy(_._4.getTime)
    val (half1, half2) = rows.splitAt(rows.length / 2)
    val flushTs = new Timestamp(t0 + 86400000L)
    val flush = Seq((rows.head._1, rows.head._2, rows.head._3, flushTs))

    val src = tmpDir("drift-rs-src"); val chk = tmpDir("drift-rs-chk")
    val out = tmpDir("drift-rs-out") + "/out"
    val schema = half1.toSeq.toDF("vec_id", "e", "nrm", "ts").schema
    def monitor(df: DataFrame) =
      StreamingVectors.driftStream(df, cents, cb, base, "ts")

    half1.toSeq.toDF("vec_id", "e", "nrm", "ts").write.mode("append").parquet(src)
    drain(src, schema, out, chk)(monitor)         // run 1, then "crash"
    half2.toSeq.toDF("vec_id", "e", "nrm", "ts").write.mode("append").parquet(src)
    flush.toDF("vec_id", "e", "nrm", "ts").write.mode("append").parquet(src)
    drain(src, schema, out, chk)(monitor)         // restart, same checkpoint

    val real = spark.read.parquet(out)
      .where(col("window_start") < lit(flushTs))
    val got = real.select(col("window_start"), col("cluster"), col("n_vecs"),
        col("avg_qerr"), col("stale"))
      .as[(Timestamp, Long, Long, Double, Boolean)].collect()
    assert(got.nonEmpty)
    assert(got.map(r => (r._1, r._2)).distinct.length == got.length,
      "every (window, cluster) must emit EXACTLY once across the restart")
    assert(got.map(_._3).sum == rows.length.toLong,
      "every arriving vector is counted in exactly one finalized window")

    // never-stopped run equality
    val chk2 = tmpDir("drift-rs-chk2"); val out2 = tmpDir("drift-rs-out2") + "/out"
    drain(src, schema, out2, chk2)(monitor)
    val fresh = spark.read.parquet(out2).where(col("window_start") < lit(flushTs))
      .select(col("window_start"), col("cluster"), col("n_vecs"),
        col("avg_qerr"), col("stale"))
      .as[(Timestamp, Long, Long, Double, Boolean)].collect()
    assert(got.toSet == fresh.toSet,
      "restarted run must equal the never-stopped run window for window")
  }
}
