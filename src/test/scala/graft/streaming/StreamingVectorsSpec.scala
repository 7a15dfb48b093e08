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
    val dim = v.select(size(col("e"))).head.getInt(0)
    val rows = (batch.as[(Long, Seq[Double], Double)].collect().sortBy(_._1)
      .map { case (id, e, n) => (id, e, n, new Timestamp(base + id * 1000)) }
      :+ // a failed-encoder degenerate riding the same feed: must be
         // silently dropped by the intake guard, not kill the query
      ((999999L, Seq.fill(dim)(0.0), 0.0, new Timestamp(base + 500))))

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

  test("drift monitor: the training feed reads par, a shifted feed goes stale") {
    val v = Vectors.withNorm(
        graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
      .select(col("vec_id"), col("e"), col("nrm"))
    val root = tmpDir("vecdrift")
    IncrementalIndex.writeVecIndex(root, v)
    val cents = spark.read.parquet(s"$root/vcents")
    val cb = spark.read.parquet(s"$root/vcb")
    val base = spark.read.parquet(s"$root/vbase")

    def run(feed: Seq[(Long, Seq[Double], Double, Timestamp)], name: String) = {
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val stream = MemoryStream[(Long, Seq[Double], Double, Timestamp)]
      // staleFactor 1.3 here: the planted dim-reversal drifts every
      // cluster into the 1.4–1.7× band (pinned below); the production
      // default stays a conservative 2.0
      val q = StreamingVectors.driftStream(
          stream.toDF().toDF("vec_id", "e", "nrm", "ts"),
          cents, cb, base, "ts", staleFactor = 1.3)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        stream.addData(feed.toIndexedSeq)
        q.processAllAvailable()
        // append mode only emits CLOSED windows: advance the watermark
        stream.addData(IndexedSeq(
          (999999L, feed.head._2, feed.head._3,
            new Timestamp(feed.head._4.getTime + 8L * 3600 * 1000))))
        q.processAllAvailable()
      } finally q.stop()
      spark.table(name).collect()
    }

    val base0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = v.as[(Long, Seq[Double], Double)].collect().sortBy(_._1)
    val trainFeed = rows.toSeq.map { case (id, e, n) => (id, e, n, base0) }
    val par = run(trainFeed, "drift_par")
    assert(par.nonEmpty)
    // the full training population replayed: per-cluster mean error IS
    // the baseline — par (10000 bp), never stale
    assert(par.map(_.getAs[Long]("n_vecs")).sum == rows.length.toLong)
    par.foreach { r =>
      assert(!r.getAs[Boolean]("stale"), s"training feed flagged stale: $r")
      assert(math.abs(r.getAs[Long]("drift_bp") - 10000L) <= 1L, s"$r")
    }

    // a shifted encoder: every vector's dims reversed — same norms,
    // different subspace structure, so quantization error jumps
    val shiftFeed = rows.toSeq.map { case (id, e, n) => (id, e.reverse, n, base0) }
    val drift = run(shiftFeed, "drift_shift")
    drift.foreach { r =>
      assert(r.getAs[Long]("drift_bp") >= 13000L,
        s"every cluster must show material drift on the shifted feed: $r")
      assert(r.getAs[Boolean]("stale"), s"must trip at staleFactor 1.3: $r")
    }
  }

  test("drift monitor: a cluster with no baseline row reports stale, not silence") {
    val v = Vectors.withNorm(
        graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
      .select(col("vec_id"), col("e"), col("nrm"))
    val root = tmpDir("vecdrift2")
    IncrementalIndex.writeVecIndex(root, v)
    val cents = spark.read.parquet(s"$root/vcents")
    val cb = spark.read.parquet(s"$root/vcb")
    val base = spark.read.parquet(s"$root/vbase")
    val dropped = base.orderBy(col("cluster")).limit(1)
      .select("cluster").as[Long].head()
    // simulate a build that captured zero vectors in `dropped`
    val holey = base.where(col("cluster") =!= dropped)

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Double], Double, Timestamp)]
    val q = StreamingVectors.driftStream(
        stream.toDF().toDF("vec_id", "e", "nrm", "ts"), cents, cb, holey, "ts")
      .writeStream.format("memory").queryName("drift_holey")
      .outputMode("append").start()
    try {
      val base0 = Timestamp.valueOf("2024-01-01 00:00:00")
      val rows = v.as[(Long, Seq[Double], Double)].collect().sortBy(_._1)
        .map { case (id, e, n) => (id, e, n, base0) }
      stream.addData(rows.toIndexedSeq)
      q.processAllAvailable()
      stream.addData(IndexedSeq((999999L, rows.head._2, rows.head._3,
        new Timestamp(base0.getTime + 8L * 3600 * 1000))))
      q.processAllAvailable()
      val out = spark.table("drift_holey").collect()
      val orphan = out.filter(_.getAs[Long]("cluster") == dropped)
      assert(orphan.nonEmpty,
        "windows for the baseline-less cluster must still be reported")
      orphan.foreach { r =>
        assert(r.getAs[Boolean]("stale"), s"no-baseline cluster must read stale: $r")
        assert(r.isNullAt(r.fieldIndex("base_qerr")))
      }
    } finally q.stop()
  }

  test("streamed semantic decontamination flags exactly the batch pair set") {
    val v = Vectors.withNorm(
        graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
      .select(col("vec_id"), col("e"), col("nrm"))
    val items = v.where(col("vec_id") < 5)
    val corpus = v.where(col("vec_id") >= 5)

    // the batch truth: every (corpus vec, item) pair at cos >= tau
    val expected = corpus.crossJoin(broadcast(items
        .select(col("vec_id").as("item_id"), col("e").as("qe"), col("nrm").as("qn"))))
      .where(Vectors.cosine(col("e"), col("qe"), col("nrm"), col("qn")) >= 0.35)
      .select(col("vec_id"), col("item_id"))
      .as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty, "the corpus must graze the eval set at tau=0.35")

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val dim = v.select(size(col("e"))).head.getInt(0)
    val rows = (corpus.as[(Long, Seq[Double], Double)].collect().sortBy(_._1)
      .map { case (id, e, n) => (id, e, n, new Timestamp(base + id * 1000)) }
      :+ // a zero-norm failed-encoder vector on the intake feed: the
         // guard must drop it silently — pre-guard this killed the
         // always-on gate with an ANSI DIVIDE_BY_ZERO
      ((999999L, Seq.fill(dim)(0.0), 0.0, new Timestamp(base + 500))))

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Double], Double, Timestamp)]
    val q = StreamingVectors.decontaminateSemanticStream(
        stream.toDF().toDF("vec_id", "e", "nrm", "ts"), items, "ts")
      .writeStream.format("memory").queryName("semcon_flags")
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 3))
        .foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
      val streamed = spark.table("semcon_flags")
        .select("vec_id", "item_id").as[(Long, Long)].collect()
      assert(streamed.toSet == expected,
        s"faces diverge: ${(expected diff streamed.toSet).take(5)} missing, " +
          s"${(streamed.toSet diff expected).take(5)} extra")
      // once per pair inside the watermark horizon
      assert(streamed.length == streamed.toSet.size)
    } finally q.stop()
  }
}
