package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZorderSpec extends SparkSpec {

  /** Mean per-file span of `c`, normalized by the global span — 1.0
    * means every file covers the whole range (no skipping possible),
    * small means filtered scans can prune most files. */
  private def meanSpan(dir: String, c: String): Double = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.toString)
    val global = spark.read.parquet(dir)
      .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head
    val g = global.getDouble(1) - global.getDouble(0)
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head
      (r.getDouble(1) - r.getDouble(0)) / g
    }
    spans.sum / spans.length
  }

  test("z-ordered files cover narrow ranges of BOTH cluster columns") {
    val orders = graft.sources.Tables(spark, sfDir, "orders")
    val base = Files.createTempDirectory("graft_zorder").toString
    val zDir = s"$base/z"
    val plainDir = s"$base/plain"
    LakeWriter.writeClustered(orders, zDir, "o_custkey", "o_totalprice", numFiles = 8)
    // baseline: same file count, no clustering
    orders.repartition(8).write.parquet(plainDir)

    assert(spark.read.parquet(zDir).count() == orders.count(), "no row loss")

    val zCust = meanSpan(zDir, "o_custkey")
    val zPrice = meanSpan(zDir, "o_totalprice")
    val pCust = meanSpan(plainDir, "o_custkey")
    val pPrice = meanSpan(plainDir, "o_totalprice")
    // unclustered files each span ~the full range of both columns
    assert(pCust > 0.8 && pPrice > 0.8, s"baseline sanity: $pCust / $pPrice")
    // z-ordered files must be substantially narrower on BOTH dimensions
    // (a plain sort would narrow only its leading column)
    assert(zCust < 0.75 && zCust < pCust, s"custkey span $zCust vs plain $pCust")
    assert(zPrice < 0.75 && zPrice < pPrice, s"totalprice span $zPrice vs plain $pPrice")
  }

  test("3-column z-order narrows the third dimension a 2-column layout ignores") {
    val orders = graft.sources.Tables(spark, sfDir, "orders")
    val base = Files.createTempDirectory("graft_zorder3").toString
    val z2Dir = s"$base/z2"; val z3Dir = s"$base/z3"
    LakeWriter.writeClustered(orders, z2Dir, "o_custkey", "o_totalprice", numFiles = 8)
    LakeWriter.writeClustered(orders, z3Dir,
      Seq("o_custkey", "o_totalprice", "o_orderkey"), numFiles = 8)
    assert(spark.read.parquet(z3Dir).count() == orders.count(), "no row loss")

    // the 2-col layout leaves o_orderkey unclustered (files span ~all of
    // it); the 3-col layout must narrow it, enabling min-max skipping on
    // a third predicate — at bounded cost on the first two dimensions
    val k2 = meanSpan(z2Dir, "o_orderkey")
    val k3 = meanSpan(z3Dir, "o_orderkey")
    assert(k2 > 0.8, s"2-col layout should not narrow o_orderkey: $k2")
    assert(k3 < 0.75 && k3 < k2, s"o_orderkey span $k3 vs 2-col $k2")
    for (c <- Seq("o_custkey", "o_totalprice"))
      assert(meanSpan(z3Dir, c) < 0.9,
        s"3-col layout must still cluster $c: ${meanSpan(z3Dir, c)}")
  }

  test("degenerate constant column does not break the z-map") {
    val df = spark.range(100).select(col("id"), lit(7.0).as("c"))
    val dir = Files.createTempDirectory("graft_zorder_const").toString
    LakeWriter.writeClustered(df, dir, "c", "id", numFiles = 4)
    assert(spark.read.parquet(dir).count() == 100)
  }
}
