package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.LakeWriter

/** Round-12 extension of the bucketed-layout proof (round-11 verdict,
  * task 7): the A32/Q13 posture — "write the table bucketed on the key
  * its standing queries shuffle on" — generalized from TPC-H keys to
  * the dedup hash-window surface.
  *
  * `dedup_exact` and `dedup_chunk` each pay exactly one corpus-sized
  * Exchange on plain parquet: the window partition on the content
  * hash. At 100 TB that shuffle IS the job. Both cards group on a hash
  * that is a pure function of stored content, so the layout can
  * pre-pay it: materialize the hash column once at ingest and write
  * the table bucketed on it — every subsequent dedup run (the daily
  * reality: dedup reruns per intake, the corpus rewrites rarely) reads
  * co-located buckets and the only Exchange left is the S-row source
  * roll-up. These tests pin that plan shape AND row-identical output
  * vs the plain-parquet face. SURVEY §5 carries the layout
  * recommendation. */
class DedupBucketingSpec extends SparkSpec {
  import spark.implicits._

  private def exchanges(df: DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size

  test("dedup_exact over a content-hash-bucketed layout: only the source roll-up shuffles") {
    // the C1 shape over any (doc_id, source, h) frame — same arithmetic
    // as TextQueries.dedupExact, which derives h from text on the fly
    def shape(d: DataFrame): DataFrame = {
      val keeper = min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("h")))
      d.withColumn("keeper", keeper)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("docs"),
          countDistinct(col("h")).as("uniq_docs"),
          sum(when(col("doc_id") =!= col("keeper"), 1L).otherwise(0L)).as("dup_docs"),
          min(col("h")).as("min_h"), max(col("h")).as("max_h"))
        .orderBy(col("source"))
    }
    val hashed = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), Text.contentHash(col("text")).as("h"))
    LakeWriter.writeBucketed(hashed, "b_dedup_docs", "h", 8, sortCols = Seq("h"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plain = shape(hashed)
      val bucketed = shape(spark.table("b_dedup_docs"))
      assert(exchanges(plain) >= 2,
        s"plain face must pay the hash-window shuffle:\n${plain.queryExecution.executedPlan}")
      assert(exchanges(bucketed) == 1,
        s"bucketed face may shuffle only the source roll-up:\n${bucketed.queryExecution.executedPlan}")
      assert(bucketed.queryExecution.executedPlan.toString.contains("Bucketed: true"))
      val got = bucketed.collect().map(_.toString).toSeq
      val want = plain.collect().map(_.toString).toSeq
      assert(got == want && got.nonEmpty, "bucketed face must be row-identical")
      // and the layout serves the REAL face's numbers: same card as C1
      val real = TextQueries.dedupExact(spark, sfDir).collect().map(_.toString).toSeq
      assert(got == real, "the bucketed shape must equal the shipping dedup_exact")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_dedup_docs")
    }
  }

  test("dedup_chunk over a chunk_hash-bucketed chunk store: only the source roll-up shuffles") {
    // the 100 TB recommendation: a packing pipeline that re-runs chunk
    // dedup per intake materializes the chunk frame ONCE, bucketed on
    // chunk_hash — the C31/C82 window then never re-shuffles the corpus
    def shape(cf: DataFrame): DataFrame = {
      val posKey = (col("doc_id") * lit(1048576L)) + col("chunk_idx")
      val keeper = min(posKey).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("chunk_hash")))
      cf.withColumn("pos_key", posKey)
        .withColumn("keeper", keeper)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("pos_key") =!= col("keeper"), 1L).otherwise(0L))
            .as("dup_chunks"))
        .withColumn("dup_bp", expr("dup_chunks * 10000 div n_chunks"))
        .orderBy(col("source"))
    }
    val chunks = TextQueries.chunkFrame(spark, sfDir, width = 32, stride = 24)
      .select(col("doc_id"), col("source"), col("chunk_idx"), col("chunk_hash"))
    LakeWriter.writeBucketed(chunks, "b_chunk_store", "chunk_hash", 8,
      sortCols = Seq("chunk_hash"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plain = shape(chunks)
      val bucketed = shape(spark.table("b_chunk_store"))
      assert(exchanges(bucketed) == 1,
        s"bucketed chunk store may shuffle only the roll-up:\n${bucketed.queryExecution.executedPlan}")
      assert(bucketed.queryExecution.executedPlan.toString.contains("Bucketed: true"))
      val got = bucketed.collect().map(_.toString).toSeq
      assert(got == plain.collect().map(_.toString).toSeq && got.nonEmpty)
      val real = TextQueries.dedupChunk(spark, sfDir).collect().map(_.toString).toSeq
      assert(got == real, "the bucketed shape must equal the shipping dedup_chunk")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_chunk_store")
    }
  }
}
