package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{IncrementalIndex, Vectors}

class StreamingVectorsSpec extends SparkSpec {
  import spark.implicits._

  test("streamed vector probe flags exactly the batch probe's set") {
    val v = Vectors.withNorm(
        graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
      .select(col("vec_id"), col("e"), col("nrm"))
    val isNew = col("vec_id") % 5 === 4
    val standing = v.where(!isNew)
    val batch = v.where(isNew)

    val root = tmpDir("vecstream")
    IncrementalIndex.writeVecIndex(root, standing)
    val expected = IncrementalIndex.probeVecs(spark, root, batch, standing)
      .select("vec_id").as[Long].collect().toSet
    assert(expected.nonEmpty, "corpus batch must near-duplicate some history")

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = batch.as[(Long, Seq[Double], Double)].collect().sortBy(_._1)
      .map { case (id, e, n) => (id, e, n, new Timestamp(base + id * 1000)) }

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Double], Double, Timestamp)]
    val q = StreamingVectors.nearDupStream(
        stream.toDF().toDF("vec_id", "e", "nrm", "ts"),
        spark.read.parquet(s"$root/vcents"),
        spark.read.parquet(s"$root/vcb"),
        spark.read.parquet(s"$root/vcodes"),
        standing, "ts")
      .writeStream.format("memory").queryName("vec_flags")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 3))
        .foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
      val streamed = spark.table("vec_flags")
        .select("vec_id").as[Long].collect().toSet
      assert(streamed == expected,
        s"faces diverge: ${(expected diff streamed).take(5)} missing, " +
          s"${(streamed diff expected).take(5)} extra")
      // each flagged vector emits exactly once
      assert(spark.table("vec_flags").count() == streamed.size.toLong)
    } finally q.stop()
  }
}
