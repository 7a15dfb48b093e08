package tmpprobe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway measurement probe (deleted before round close): the C87
  * recall ladder + serve walls on the planted-blob scale corpora
  * (round-15 verdict item 1). Usage:
  *   SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  *     sbt -batch "runMain tmpprobe.Probe target/blob512k"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def wall(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"PROBE_WALL $name ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    // cold builds (self-healing artifact faces) — timed as cold
    wall("graph_cached_cold")(graft.ops.GraphAnn.simSearchGraphCached(spark, dir))
    wall("ivfpq_cached_cold")(graft.ops.IvfPq.simSearchIvfPqCached(spark, dir))
    wall("opq_cached_cold")(graft.ops.Opq.simSearchOpqCached(spark, dir))

    // recall ladders
    def ladder(name: String)(df: => DataFrame): Unit = {
      val rows = df.groupBy(col("method"))
        .agg(avg(col("recall_bp")).as("r"), count(lit(1)).as("q"))
        .orderBy(col("method")).collect()
      rows.foreach(r => println(
        f"PROBE_RECALL $name ${r.getString(0)}%-10s ${r.getDouble(1)}%.0f bp over ${r.getLong(2)} queries"))
    }
    ladder("audit")(graft.ops.VectorQueries.annRecallAudit(spark, dir))
    ladder("audit_cached")(graft.ops.VectorQueries.annRecallAuditCached(spark, dir))

    // warm serve walls, min of 2
    def warm(name: String)(df: => DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE_WALL $name ${ts.min}%.1f s (min of 2)")
    }
    warm("exact_topk")(graft.ops.VectorQueries.simSearchTopk(spark, dir))
    warm("graph_cached_warm")(graft.ops.GraphAnn.simSearchGraphCached(spark, dir))
    warm("ivfpq_cached_warm")(graft.ops.IvfPq.simSearchIvfPqCached(spark, dir))
    warm("opq_cached_warm")(graft.ops.Opq.simSearchOpqCached(spark, dir))
    warm("lsh_cached_warm")(graft.ops.VectorQueries.simSearchLshCached(spark, dir))
    warm("sq8_inline")(graft.ops.ScalarQuant.simSearchSq8(spark, dir))
    println("PROBE_DONE " + dir)
  }
}
