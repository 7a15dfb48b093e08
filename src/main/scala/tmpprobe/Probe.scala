package graft.ops
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe14 {
  def time[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $tag ${(System.nanoTime()-t0)/1e9}%.1f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val v = Vectors.withNorm(graft.sources.Tables(spark, dir, "embeddings"), "embedding")
      .select(col("vec_id"), col("e"), col("nrm"))
    val n = time("count")(v.count())
    val k = KMeans.adaptiveK(n)
    println(s"n=$n k=$k")
    val fit = time("kmeans_fit")(KMeans.fit(v, k = k, iters = 3, rows = n))
    val assigned = SemanticPq.assignWith(v, fit.centroids)
    val res = time("residuals_materialize")({
      val r = SemanticPq.residualsOf(assigned, fit.centroids)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      r.count(); r
    })
    time("pq_fit")(ProductQuant.fit(
      res.select(col("vec_id"), col("e")), 16, 4, 64, iters = 2, rows = n)
      .localCheckpoint(true))
    res.unpersist()
    time("full_card")({
      SemanticPq.dedupSemanticPq(spark, dir).write.format("noop").mode("overwrite").save()
    })
    spark.stop()
  }
}
