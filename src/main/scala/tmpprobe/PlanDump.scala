package tmpprobe

import org.apache.spark.sql.SparkSession

/** Writes .explain("formatted") of named SparkEntry queries to
  * plans/r15/<name>_<suffix>.txt (round-15 deliverable). Temporary. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val suffix = args(1)
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File("plans/r15").mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(s"plans/r15/${name}_$suffix.txt")
      try w.println(txt) finally w.close()
      println(s"PLANDUMP wrote plans/r15/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
