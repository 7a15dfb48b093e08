package graft.ingest

import org.apache.spark.sql.SaveMode

import graft.SparkSpec

class LakeWriterSpec extends SparkSpec {
  import spark.implicits._

  test("writePartitioned lays out partition directories") {
    val out = tmpDir("lw-layout")
    val df = Seq((1L, "2024-01-01"), (2L, "2024-01-01"), (3L, "2024-01-02"))
      .toDF("id", "TRANSFERRED_DATE")
    LakeWriter.writePartitioned(df, out)
    val dirs = new java.io.File(out).listFiles.filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("TRANSFERRED_DATE=2024-01-01", "TRANSFERRED_DATE=2024-01-02"))
    assert(spark.read.parquet(out).count() == 3)
  }

  test("overwrite of one partition preserves the others (dynamic mode)") {
    val out = tmpDir("lw-dynamic")
    val initial = Seq((1L, "2024-01-01"), (3L, "2024-01-02")).toDF("id", "TRANSFERRED_DATE")
    LakeWriter.writePartitioned(initial, out)
    // re-ingest ONLY day 1
    val day1 = Seq((10L, "2024-01-01")).toDF("id", "TRANSFERRED_DATE")
    LakeWriter.writePartitioned(day1, out, SaveMode.Overwrite)
    val rows = spark.read.parquet(out)
      .select("id", "TRANSFERRED_DATE").as[(Long, String)].collect().toSet
    assert(rows == Set((10L, "2024-01-01"), (3L, "2024-01-02")),
      "day-2 partition must survive a day-1 re-ingest")
  }

  test("file count per partition is bounded by filesPerPartition") {
    val out = tmpDir("lw-files")
    val big = (1 to 2000).map(i => (i.toLong, "2024-02-01")).toDF("id", "TRANSFERRED_DATE")
    LakeWriter.writePartitioned(big, out, filesPerPartition = 4)
    val files = new java.io.File(s"$out/TRANSFERRED_DATE=2024-02-01")
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(files >= 1 && files <= 4)
  }

  test("withTransferredDate derives yyyy-MM-dd from a timestamp column") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-03-05 14:30:00")).toDF("ts")
    val out = LakeWriter.withTransferredDate(df, "ts")
      .select("TRANSFERRED_DATE").as[String].head()
    assert(out == "2024-03-05")
  }

  test("date filters prune partitions at the scan (no full-table read)") {
    val out = tmpDir("lw-prune")
    val df = Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-03"))
      .toDF("id", "TRANSFERRED_DATE")
    LakeWriter.writePartitioned(df, out)
    val q = spark.read.parquet(out)
      .where(org.apache.spark.sql.functions.col("TRANSFERRED_DATE") === "2024-01-02")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      "partition column filter must become a PartitionFilter")
    assert(plan.contains("TRANSFERRED_DATE"),
      "the pruned column must appear in the partition filter")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("compactPartition rewrites one day without touching the others") {
    val out = tmpDir("lw-cpact")
    // day 1 lands as many small appends
    (1 to 6).foreach { i =>
      LakeWriter.writePartitioned(
        Seq((i.toLong, "2024-01-01")).toDF("id", "TRANSFERRED_DATE"),
        out, SaveMode.Append, filesPerPartition = 1)
    }
    LakeWriter.writePartitioned(
      Seq((99L, "2024-01-02")).toDF("id", "TRANSFERRED_DATE"), out, SaveMode.Append)
    val before = new java.io.File(s"$out/TRANSFERRED_DATE=2024-01-01")
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(before >= 6)
    LakeWriter.compactPartition(spark, out, "2024-01-01", filesPerPartition = 2)
    val after = new java.io.File(s"$out/TRANSFERRED_DATE=2024-01-01")
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(after <= 2, s"expected <=2 files after compaction, got $after")
    val rows = spark.read.parquet(out).select("id").as[Long].collect().toSet
    assert(rows == (1L to 6L).toSet + 99L, "no rows lost, day-2 untouched")
  }

  test("expirePartitions drops only days older than the retention floor") {
    val out = tmpDir("lw-expire")
    val df = Seq((1L, "2024-01-01"), (2L, "2024-01-15"), (3L, "2024-02-01"))
      .toDF("id", "TRANSFERRED_DATE")
    LakeWriter.writePartitioned(df, out)
    val dropped = LakeWriter.expirePartitions(out, keepFrom = "2024-01-15")
    assert(dropped == Seq("2024-01-01"))
    val remaining = spark.read.parquet(out).select("id").as[Long].collect().toSet
    assert(remaining == Set(2L, 3L))
  }

  test("compact round-trips a mergeSchema read") {
    val src = tmpDir("lw-compact-src"); val dst = tmpDir("lw-compact-dst")
    Seq((1L, "a", "2024-01-01")).toDF("id", "v", "TRANSFERRED_DATE")
      .write.mode("append").parquet(src)
    Seq((2L, "2024-01-01")).toDF("id", "TRANSFERRED_DATE")
      .write.mode("append").parquet(src)
    LakeWriter.compact(spark, src, dst)
    val back = spark.read.parquet(dst)
    assert(back.count() == 2)
    assert(back.columns.toSet == Set("id", "v", "TRANSFERRED_DATE"))
  }
}
