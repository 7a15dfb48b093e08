package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** D12 — streaming IVF index maintenance. The replay proofs: stream
  * admission equals the batch assignment against the same frozen
  * centroids, admitted vectors are searchable before any retrain, and
  * after an offline retrain the stored index's probe results equal the
  * C16a inline build over the same corpus. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private val (k, iters) = (8, 3)

  private lazy val corpus = Vectors.withNorm(
      graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
    .select(col("vec_id"), col("e"), col("nrm"))

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"ivf_$tag").toString

  /** Stream the given vectors into the index in `n` micro-batches. */
  private def streamIn(root: String, vecs: Seq[(Long, Seq[Double])], n: Int): Unit = {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Double])]
    val q = IvfIndex.admitStream(spark, root,
      stream.toDF().toDF("vec_id", "embedding"), tmp("ckpt"))
    try {
      vecs.grouped(math.max(1, vecs.length / n))
        .foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
    } finally q.stop()
  }

  test("stream admission equals the batch assignment, and admits are searchable") {
    val root = tmp("admit")
    val standing = corpus.where(col("vec_id") < 250)
    val feed = corpus.where(col("vec_id") >= 250)
    IvfIndex.build(root, standing, k, iters)
    val centroids = spark.read.parquet(s"$root/centroids")

    val raw = graft.sources.Tables(spark, sfDir, "embeddings")
      .where(col("vec_id") >= 250)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    streamIn(root, raw.toIndexedSeq, n = 3)

    // replay proof: the appended posting rows == one batch assign pass
    val expected = IvfIndex.assign(feed, centroids)
      .select(col("cluster"), col("vec_id")).as[(Long, Long)].collect().toSet
    val got = spark.read.parquet(s"$root/postings")
      .where(col("vec_id") >= 250)
      .select(col("cluster"), col("vec_id")).as[(Long, Long)].collect().toSet
    assert(got == expected,
      s"stream/batch assignment diverges: ${(expected diff got).take(5)} missing, " +
        s"${(got diff expected).take(5)} extra")
    assert(spark.read.parquet(s"$root/postings").count() == corpus.count())

    // an admitted (post-build) vector is immediately probe-visible
    val hits = IvfIndex.probe(spark, root, corpus.where(col("vec_id") < 5))
      .select("vec_id").as[Long].collect()
    assert(hits.exists(_ >= 250), "no admitted vector surfaced in any top-10")
  }

  test("after retrain the stored index probes equal the C16a inline build") {
    val root = tmp("retrain")
    IvfIndex.build(root, corpus.where(col("vec_id") < 250), k, iters)
    val raw = graft.sources.Tables(spark, sfDir, "embeddings")
      .where(col("vec_id") >= 250)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    streamIn(root, raw.toIndexedSeq, n = 3)
    IvfIndex.retrain(spark, root, k, iters)

    val fromIndex = IvfIndex.probe(spark, root, corpus.where(col("vec_id") < 5))
      .collect()
    val inline = VectorQueries.simSearchIvfLearned(spark, sfDir).collect()
    assert(fromIndex.length == inline.length,
      s"row counts diverge: index ${fromIndex.length} vs inline ${inline.length}")
    fromIndex.zip(inline).foreach { case (a, b) =>
      assert(a.getAs[Long]("query_id") == b.getAs[Long]("query_id"))
      assert(a.getAs[Int]("rnk") == b.getAs[Int]("rnk"))
      assert(a.getAs[Long]("vec_id") == b.getAs[Long]("vec_id"),
        s"query ${a.getAs[Long]("query_id")} rank ${a.getAs[Int]("rnk")}: " +
          s"index ${a.getAs[Long]("vec_id")} vs inline ${b.getAs[Long]("vec_id")}")
      assert(math.abs(a.getAs[Double]("cosine") - b.getAs[Double]("cosine")) <= 2e-4)
    }
  }
}
