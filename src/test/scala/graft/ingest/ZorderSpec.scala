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

  test("bloom-filter write: enabled column carries a working filter, others none") {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val orders = graft.sources.Tables(spark, sfDir, "orders")
    val dir = Files.createTempDirectory("graft_bloom").toString + "/t"
    LakeWriter.writeWithBloomFilters(orders.repartition(2), dir,
      bloomCols = Seq("o_orderkey"), expectedNdv = 10000L)

    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toString),
      spark.sessionState.newHadoopConf()))
    try {
      val rg = reader.getRowGroups.get(0)
      val cols = rg.getColumns.asScala
      val keyed = cols.find(_.getPath.toDotString == "o_orderkey").get
      val other = cols.find(_.getPath.toDotString == "o_custkey").get
      val bfReader = reader.getBloomFilterDataReader(rg)
      val bf = bfReader.readBloomFilter(keyed)
      assert(bf != null, "o_orderkey must carry a bloom filter")
      assert(bfReader.readBloomFilter(other) == null,
        "columns not listed must not pay for a filter")

      // every key actually present answers "maybe"; absent keys are
      // overwhelmingly rejected (that IS the row-group skip)
      val present = spark.read.parquet(file.toString)
        .select("o_orderkey").limit(200)
        .collect().map(_.getLong(0))
      assert(present.forall(k => bf.findHash(bf.hash(k))),
        "bloom filter must never reject a present key")
      val absent = (1 to 1000).map(i => 10000000L + i)
      val rejected = absent.count(k => !bf.findHash(bf.hash(k)))
      assert(rejected >= 900, s"only $rejected/1000 absent keys rejected")
    } finally reader.close()
  }

  test("degenerate constant column does not break the z-map") {
    val df = spark.range(100).select(col("id"), lit(7.0).as("c"))
    val dir = Files.createTempDirectory("graft_zorder_const").toString
    LakeWriter.writeClustered(df, dir, "c", "id", numFiles = 4)
    assert(spark.read.parquet(dir).count() == 100)
  }
}
