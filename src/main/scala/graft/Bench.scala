package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * Methodology: a warm-up pass first runs every query once at sf0.001 (or
  * the bench dir itself when sf0.001 is absent) so JVM/codegen/session
  * start-up is not charged to whichever query happens to run first; timed
  * queries materialize through a noop-format write so the full plan
  * (sorts, projections, limits) executes — `count()` would let Catalyst
  * prune work a real consumer pays for. Each query is timed
  * SPARK_GRAFT_REPS times (default 3) and the MINIMUM is reported —
  * the shared bench box shows 1.5–2x run-to-run noise, and min-of-N
  * measures the code, not the neighbors. Failures are reported in an
  * `errors` field, never recorded as a fake timing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(name: String, dir: String): Option[String] =
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        None
      } catch { case e: Throwable =>
        Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }

    // SPARK_GRAFT_ONLY=q1,q2 restricts the sweep — for iterating on one
    // query's plan without paying the full 80-query sweep each time.
    // Empty tokens are dropped (a trailing comma or an empty value must
    // not silently filter the sweep to zero queries), and unknown names
    // fail fast — a typo'd filter printing total=0.000 with exit 0 reads
    // like a real result to the tail-capturing harness.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    only.foreach { o =>
      val unknown = o -- SparkEntry.queries.keySet
      if (unknown.nonEmpty) {
        Console.err.println(
          s"SPARK_GRAFT_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
        sys.exit(2)
      }
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val warmDir = {
      val small = "/root/testdata/sf0.001"
      if (new java.io.File(small).isDirectory) small else sfDir
    }
    names.foreach(materialize(_, warmDir)) // warm-up: not timed
    // artifact warm-up: *_cached faces measure the SERVE path, so their
    // persisted models/indexes are built at the bench SF before timing
    // (invoking the face trains + persists eagerly; the plan is dropped)
    names.filter(_.endsWith("_cached"))
      .foreach(n => try SparkEntry.queries(n)(spark, sfDir)
        catch { case _: Throwable => () })

    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    for (rep <- 1 to reps; name <- names) {
      if (!errors.contains(name)) {
        val t0 = System.nanoTime()
        materialize(name, sfDir) match {
          case None =>
            val sec = (System.nanoTime() - t0) / 1e9
            timings(name) = timings.get(name).fold(sec)(math.min(_, sec))
          case Some(msg) => errors(name) = msg; timings.remove(name)
        }
      }
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    def fmt(v: Double): String = f"$v%.3f"
    def queriesJson(m: collection.Map[String, Double]): String =
      m.map { case (k, v) => s"${jstr(k)}:${fmt(v)}" }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = timings.values.sum
    def line(qs: String, omitted: Int): String = {
      val om = if (omitted > 0) s""","queries_omitted":$omitted""" else ""
      // A filtered (partial) sweep must be machine-distinguishable from a
      // full one — its total would otherwise be recorded as the benchmark.
      val filt = if (only.isDefined) s""","filtered":true""" else ""
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${timings.size},"queries":$qs$om$filt,"errors":$errs,"n_err":${errors.size},"sf":"$sfDir"}"""
    }
    val full = line(queriesJson(timings), 0)
    // Full per-query detail first (for humans / the repo log) ...
    println("BENCH_DETAIL " + full)
    // ... and as a first-class file artifact: the harness that records the
    // stdout line keeps only a bounded tail, so a 185-key map survives only
    // here. One JSON object, every per-query time, no truncation. Only a
    // FULL sweep may write it: a filtered iteration run overwriting the
    // round artifact with a 2-query map would silently shadow the real
    // surface (filtered runs are already marked in their stdout line).
    if (only.isEmpty) try {
      val dir = new java.io.File("target")
      dir.mkdirs()
      val w = new java.io.PrintWriter(new java.io.File(dir, "bench_queries_full.json"))
      try w.println(full) finally w.close()
    } catch { case e: Throwable =>
      Console.err.println(s"bench artifact write failed: ${e.getMessage}")
    }
    // ... then the machine-facing line LAST. The harness that records this
    // keeps only a bounded tail of stdout, so the final line must stay short:
    // if the full map would overflow, keep the slowest queries and count the rest.
    val out =
      if (full.length <= 1400) full
      else {
        val slowest = timings.toSeq.sortBy(-_._2).take(25).sortBy(_._1)
        line(queriesJson(collection.immutable.ListMap(slowest: _*)), timings.size - slowest.size)
      }
    // stop() before the final println so executor/shutdown log lines cannot
    // land after (and evict) the machine-facing line in a bounded tail capture.
    spark.stop()
    Console.err.flush()
    println(out)
    Console.out.flush()
    if (errors.nonEmpty) sys.exit(1)
  }
}
