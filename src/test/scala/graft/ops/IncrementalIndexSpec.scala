package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IncrementalIndex — the materialized standing-index cycle behind C36
  * and D11: build → probe → admit → append, across "days". */
class IncrementalIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.sources.Tables(spark, sfDir, "documents")
    .select(col("doc_id"), col("source"), col("text"))
  private lazy val standing = docs.where(col("doc_id") % 5 =!= 4)
  private lazy val batch = docs.where(col("doc_id") % 5 === 4)

  test("probe against the materialized index equals the inline C36 query") {
    val root = tmpDir("inc_index")
    IncrementalIndex.write(root, standing, "doc_id", "text")
    val probed = IncrementalIndex.probe(spark, root, batch, "doc_id", "text")
    val got = probed.groupBy(col("source"))
      .agg(count(lit(1)).as("incoming_docs"),
        sum(col("dup_exact")).cast("long").as("dup_exact"),
        sum(col("dup_reorder")).cast("long").as("dup_reorder"),
        sum(col("dup_near")).cast("long").as("dup_near"),
        sum(when(col("dup_exact") === 0 && col("dup_reorder") === 0 &&
          col("dup_near") === 0, 1L).otherwise(0L)).as("new_docs"))
      .orderBy(col("source")).collect().map(_.toString).toSeq
    val expected = DedupQueries.dedupIncremental(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(got == expected,
      "stored-table probe must reproduce the inline derivation exactly")
  }

  test("the daily cycle: admitted docs are flagged once appended") {
    val root = tmpDir("inc_cycle")
    IncrementalIndex.write(root, standing, "doc_id", "text")
    val admitted = IncrementalIndex.admit(spark, root, batch, "doc_id", "text")
    val nAdmitted = admitted.count()
    assert(nAdmitted > 0 && nAdmitted < batch.count(),
      "the index must reject some of the batch and admit the rest")
    IncrementalIndex.append(root, admitted, "doc_id", "text")
    // day 2: re-probing the same batch finds every admitted doc by hash,
    // and admits nothing
    val reprobe = IncrementalIndex.probe(spark, root, batch, "doc_id", "text")
    val admittedIds = admitted.select("doc_id").as[Long].collect().toSet
    val flaggedExact = reprobe.where(col("dup_exact") === 1)
      .select("doc_id").as[Long].collect().toSet
    assert(admittedIds.subsetOf(flaggedExact),
      "every appended document must now collide with its own hash")
    assert(IncrementalIndex.admit(spark, root, batch, "doc_id", "text").count() == 0,
      "the cycle is idempotent per batch")
  }
}
