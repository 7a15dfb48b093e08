package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** B15 — measure-then-compact partition health. */
class PartitionHealthSpec extends SparkSpec {
  import spark.implicits._

  test("report counts files/bytes per partition and flags only the fragmented ones") {
    val zone = tmpDir("health")
    val df = (1 to 400).map(i => (i.toLong, s"2024-01-0${1 + i % 3}"))
      .toDF("id", LakeWriter.PartitionCol)
    // healthy: one file at the root
    df.coalesce(1).write.parquet(s"$zone/healthy.parquet")
    // fragmented: 6 shards per day partition
    df.repartition(6).write.partitionBy(LakeWriter.PartitionCol)
      .parquet(s"$zone/frag")
    val rep = PartitionHealth.report(spark, zone,
        smallBytes = 1L * 1024 * 1024, targetFiles = 4)
      .collect()
    val healthy = rep.filter(_.getAs[String]("table_name") == "healthy")
    assert(healthy.length == 1 && healthy.head.isNullAt(1))
    assert(healthy.head.getAs[Int]("files") == 1)
    assert(!healthy.head.getAs[Boolean]("needs_compaction"),
      "few files never flag, however small")
    val frag = rep.filter(_.getAs[String]("table_name") == "frag")
    assert(frag.length == 3, s"one row per day partition: ${frag.toSeq}")
    frag.foreach { r =>
      assert(r.getAs[String]("partition").startsWith(s"${LakeWriter.PartitionCol}="))
      assert(r.getAs[Int]("files") == 6)
      assert(r.getAs[Int]("small_files") == 6)
      assert(r.getAs[Boolean]("needs_compaction"), s"must flag: $r")
      assert(r.getAs[Long]("avg_bytes") * r.getAs[Int]("files") <=
        r.getAs[Long]("bytes") + r.getAs[Int]("files"))
    }
  }

  test("compactPartition clears the flag it raised (the measure-then-compact loop)") {
    val zone = tmpDir("health-loop")
    val df = (1 to 300).map(i => (i.toLong, "2024-02-01")).toDF("id", LakeWriter.PartitionCol)
    df.repartition(8).write.partitionBy(LakeWriter.PartitionCol).parquet(s"$zone/t")
    def flagged() = PartitionHealth.report(spark, zone,
        smallBytes = 1L * 1024 * 1024, targetFiles = 4)
      .where(col("needs_compaction")).count()
    assert(flagged() == 1L, "the fragmented partition must flag before compaction")
    LakeWriter.compactPartition(spark, s"$zone/t", "2024-02-01", filesPerPartition = 1)
    assert(flagged() == 0L, "compaction must clear the flag")
  }
}
