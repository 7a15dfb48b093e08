package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 queue item (j): the LSH serve artifact gains the same
  * append-only incremental cadence the text and PQ-vector standing
  * indexes have.
  *
  *  - append-then-serve == rebuild-then-serve: banding is a pure
  *    per-row function of the (seeded, deterministic) plane set and
  *    the stored width, so a batch banded on append lands in exactly
  *    the buckets a full rebuild gives it — pinned by frame equality.
  *  - the adaptive-width seam: when an append grows the corpus past
  *    the [[Vectors.adaptiveLshBits]] threshold the stored width is
  *    STALE (the round-12 ADVICE finding on the cached face) —
  *    [[IncrementalIndex.appendLshIndex]] must return false so the
  *    caller rebuilds before the next serve.
  */
class IncrementalLshSpec extends SparkSpec {
  import spark.implicits._

  private def emb: DataFrame =
    Vectors.withNorm(graft.sources.Tables(spark, sfDir, "embeddings"),
      "embedding")

  test("append-then-serve equals rebuild-then-serve on the grown corpus") {
    val full = emb
    val standing = full.where(col("vec_id") < 300)
    val batch = full.where(col("vec_id") >= 300)

    val rootA = tmpDir("lshidx_append")
    IncrementalIndex.writeLshIndex(rootA, standing)
    assert(IncrementalIndex.appendLshIndex(spark, rootA, batch),
      "500 vectors stay below the width threshold: append must stay fresh")

    val rootB = tmpDir("lshidx_rebuild")
    IncrementalIndex.writeLshIndex(rootB, full)

    val served = IncrementalIndex.serveLsh(spark, rootA, full).collect().toSeq
    val rebuilt = IncrementalIndex.serveLsh(spark, rootB, full).collect().toSeq
    assert(served.nonEmpty)
    assert(served == rebuilt)

    val meta = spark.read.parquet(s"$rootA/lmeta").head()
    assert(meta.getAs[Long]("n") == full.count())
  }

  test("append crossing the adaptive-width threshold reports the index stale") {
    // synthetic 64-dim corpus: 8000 standing (bits = 6) + 600 appended
    // crosses the 8192 threshold where the rule answers (7, 1)
    def synth(from: Int, until: Int): DataFrame =
      spark.range(from, until).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          j => sin(col("id") * (j + lit(1)))).as("e"))
        .withColumn("nrm", Vectors.norm(col("e")))

    val root = tmpDir("lshidx_stale")
    IncrementalIndex.writeLshIndex(root, synth(0, 8000))
    val m0 = spark.read.parquet(s"$root/lmeta").head()
    assert(m0.getAs[Int]("bits") == Vectors.adaptiveLshBits(8000))

    val fresh = IncrementalIndex.appendLshIndex(spark, root, synth(8000, 8600))
    assert(!fresh, "crossing 8192 vectors must flag the stored width stale")
    val m1 = spark.read.parquet(s"$root/lmeta").head()
    assert(m1.getAs[Long]("n") == 8600L)
    // the stored width is the OLD one until the caller rebuilds
    assert(m1.getAs[Int]("bits") == m0.getAs[Int]("bits"))

    // the prescribed repair: rebuild at the new operating point
    IncrementalIndex.writeLshIndex(root, synth(0, 8600))
    val m2 = spark.read.parquet(s"$root/lmeta").head()
    assert(m2.getAs[Int]("bits") == Vectors.adaptiveLshBits(8600))
    assert(m2.getAs[Int]("radius") == Vectors.adaptiveLshRadius(8600))
  }
}
