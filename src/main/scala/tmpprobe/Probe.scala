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

/** Skew-resilience measurement (round-14 verdict item 7): CC over the
  * pair spelling vs the star spelling on a planted mega-cluster
  * corpus, and the full dedup_split_leakage face. One mode per JVM. */
object ProbeSkew {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val mode = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.sources.Tables(spark, dir, "documents")
    val t0 = System.nanoTime()
    mode match {
      case "pairs" =>
        val edges = graft.ops.Dedup.minhashCandidates(d, "doc_id", "text")
          .select(col("doc_a"), col("doc_b"))
        val cc = graft.ops.Cluster.connectedComponentsAuto(
          d.select(col("doc_id")), edges, "doc_id")
        val sizes = cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc).limit(3).collect()
        println(s"PROBE_SKEW cc_pairs top clusters: ${sizes.mkString(" ")}")
      case "star" =>
        val edges = graft.ops.Dedup.minhashStarEdges(d, "doc_id", "text")
        val cc = graft.ops.Cluster.connectedComponentsAuto(
          d.select(col("doc_id")), edges, "doc_id")
        val sizes = cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc).limit(3).collect()
        println(s"PROBE_SKEW cc_star top clusters: ${sizes.mkString(" ")}")
      case "face" =>
        graft.ops.DedupQueries.dedupSplitLeakage(spark, dir)
          .write.format("noop").mode("overwrite").save()
    }
    println(f"PROBE_SKEW $mode $dir wall ${(System.nanoTime() - t0) / 1e9}%.1f s")
  }
}
