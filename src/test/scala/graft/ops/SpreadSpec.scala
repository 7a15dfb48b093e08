package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-15 optimization seams: the spread/materialize helpers must
  * change COST only, never content — every caller's oracle depends on
  * that. */
class SpreadSpec extends SparkSpec {
  import spark.implicits._

  private def freshDocs = (0L until 200L)
    .map(i => (i, s"token$i common words ${"x " * (i % 7).toInt}"))
    .toDF("doc_id", "text")

  test("ensureParallelismBy: same rows, more partitions on a narrow input") {
    val narrow = freshDocs.coalesce(1)
    val spread = Vectors.ensureParallelismBy(narrow, col("doc_id"))
    assert(spread.rdd.getNumPartitions >=
      math.min(spark.sparkContext.defaultParallelism, 2),
      "a 1-partition frame must gain parallelism")
    assert(spread.orderBy("doc_id").collect().toSeq ==
      narrow.orderBy("doc_id").collect().toSeq, "content unchanged")
  }

  test("ensureParallelismBy: no-op on an already-spread frame") {
    val wide = freshDocs.repartition(spark.sparkContext.defaultParallelism * 2)
    val out = Vectors.ensureParallelismBy(wide, col("doc_id"))
    assert(out eq wide, "already-parallel inputs must not re-shuffle")
  }

  test("materializeSpread: same rows + exact count, spread row-aware") {
    val plan = freshDocs.coalesce(1).where(col("doc_id") % 2 === 0)
    val (m, n) = Vectors.materializeSpread(plan, rowsPerTask = 10)
    assert(n == 100L, "count must be the post-filter row count")
    assert(m.orderBy("doc_id").collect().toSeq ==
      plan.orderBy("doc_id").collect().toSeq, "content unchanged")
    assert(m.rdd.getNumPartitions >= 2, "must spread past one partition")
  }

  test("minhashSignature: materialize=true and false are value-identical") {
    val sh = Dedup.shingleFrame(freshDocs, "doc_id", "text", 3)
    val a = Dedup.minhashSignature(sh, "doc_id", 16)
      .orderBy("doc_id").collect().toSeq
    val b = Dedup.minhashSignature(sh, "doc_id", 16, materialize = false)
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "the checkpoint is a cost decision, not a value one")
  }
}
