package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Storing-zone parquet writer.
  *
  * Reference writes `repartition(1)` parquet per file into
  * `.../{table}/TRANSFERRED_DATE={date}` with gzip (DATALAKE_TRANSFORMATION
  * _S3_DAILY_JOB.PY:122–127,339–342) — one output file per ingest unit is
  * its single-DPU idiom and would serialize a cluster.
  *
  * Spark-first at 100 TB: write `partitionBy(date)` with dynamic partition
  * overwrite (idempotent re-ingest of a day without clobbering the table),
  * and size output files by repartitioning on the partition column so each
  * partition writes a bounded number of parquet files.
  */
object LakeWriter {
  val PartitionCol = "transferred_date"

  /** Derive the reference's TRANSFERRED_DATE partition column (L127,339). */
  def withTransferredDate(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn(PartitionCol, date_format(col(tsCol), "yyyy-MM-dd"))

  /** Partitioned write; `filesPerPartition` bounds small files (the scale
    * replacement for the reference's repartition(1)). */
  def writePartitioned(df: DataFrame, path: String,
                       mode: SaveMode = SaveMode.Overwrite,
                       filesPerPartition: Int = 4): Unit = {
    val sized =
      if (filesPerPartition == 1) df.repartition(col(PartitionCol))
      else df.repartition(col(PartitionCol), pmod(spark_partition_id(), lit(filesPerPartition)))
    sized.write
      .mode(mode)
      .option("compression", "gzip")
      .partitionBy(PartitionCol)
      .parquet(path)
  }

  /** Compaction pass for a layout-changed table (ref L237–248): mergeSchema
    * read → right-sized rewrite. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String, outPath: String,
              filesPerPartition: Int = 4): Unit = {
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    writePartitioned(df, outPath, SaveMode.Overwrite, filesPerPartition)
  }
}
