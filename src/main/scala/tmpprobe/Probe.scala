package tmpprobe

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Measurement probe (guide §1): runs one SparkEntry query with the bench
  * session config and prints every Spark job's wall time + task count, so
  * the per-job breakdown of multi-job queries is visible. Temporary —
  * deleted before the round closes. */
object Probe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = List.empty[(Int, Long, Long, Int, String)]
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(), j.stageInfos.map(_.numTasks).sum,
          Option(j.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.get(e.jobId)
        if (s != null)
          jobs ::= ((e.jobId, s._1, System.nanoTime() - s._1, s._2, s._3))
      }
    })

    names.foreach { name =>
      // warm-up at sf0.001 (bench methodology)
      graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      Thread.sleep(300)
      jobs = Nil
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val snap = jobs.sortBy(_._2)
      val jobSum = snap.map(_._3).sum / 1e9
      println(f"PROBE $name total=$total%.2fs jobs=${snap.size} jobSum=$jobSum%.2fs driverGap=${total - jobSum}%.2fs")
      snap.foreach { case (id, _, dur, nt, d) =>
        println(f"PROBE   job $id%4d ${dur / 1e9}%7.3f s tasks=$nt%5d ${d.take(90)}")
      }
    }
    spark.stop()
  }
}
