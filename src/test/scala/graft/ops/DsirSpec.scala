package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.sources.Tables(spark, sfDir, "documents")

  /** Driver-side recount of the full DSIR pipeline — hashed features,
    * smoothed models, log-weights, Gumbel top-k — sharing only the
    * corpus with the operator, not its plan. Hashing reuses Spark's own
    * xxhash64/md5 via tiny one-row queries to avoid reimplementing the
    * hash, but counting/weighting/selection are plain Scala. */
  private def recount(k: Int, buckets: Int) = {
    val rows = docs.select(col("doc_id"), col("source"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    def toks(t: String) = t.toLowerCase.replaceAll("\\s+", " ").trim.split(' ').toSeq
    val gramsOf = rows.map { case (id, _, _, text) =>
      val w = toks(text)
      id -> (w ++ w.sliding(2).filter(_.length == 2).map(_.mkString(" ")))
    }.toMap
    // hash every distinct gram once through Spark's xxhash64
    val allGrams = gramsOf.values.flatten.toSeq.distinct
    val hashed = allGrams.toDF("g")
      .select(col("g"), pmod(xxhash64(col("g")), lit(buckets.toLong)).as("b"))
      .as[(String, Long)].collect().toMap
    val cb = gramsOf.view.mapValues(_.groupBy(hashed).view.mapValues(_.size.toLong).toMap).toMap
    val langOf = rows.map(r => r._1 -> r._3).toMap
    val t = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val r = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    cb.foreach { case (id, m) => m.foreach { case (b, c) =>
      if (langOf(id) == "en") t(b) += c
      r(b) += c
    } }
    val (tt, rt) = (t.values.sum, r.values.sum)
    def lr(b: Long) = math.log((t(b) + 1).toDouble / (tt + buckets)) -
      math.log((r(b) + 1).toDouble / (rt + buckets))
    val logw = cb.view.mapValues(_.map { case (b, c) => c * lr(b) }.sum).toMap
    val coins = rows.map(_._1).toSeq.toDF("doc_id")
      .select(col("doc_id"),
        conv(substring(md5(concat(lit("dsir|"), col("doc_id").cast("string"))), 1, 6),
          16, 10).cast("long").as("c"))
      .as[(Long, Long)].collect().toMap
    val score = logw.map { case (id, w) =>
      val u = (coins(id) + 1).toDouble / ((1 << 24) + 1).toDouble
      id -> (w - math.log(-math.log(u)))
    }
    val sel = score.toSeq.sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
    (logw, sel)
  }

  test("dsir_select: driver recount matches weights and the exact selection") {
    val got = Sample.dsirSelectQuery(spark, sfDir).collect()
    assert(got.length == 100)
    val (logw, sel) = recount(k = 100, buckets = 1024)
    assert(got.map(_.getLong(0)).toSet == sel,
      "Gumbel top-k selection diverged from the driver recount")
    got.foreach { r =>
      val want = logw(r.getLong(0))
      assert(math.abs(r.getAs[Double]("logw") - want) <= 5e-4,
        s"doc ${r.getLong(0)}: logw ${r.getAs[Double]("logw")} vs recount $want")
    }
  }

  test("dsir_select enriches the target slice and is deterministic") {
    val got = Sample.dsirSelectQuery(spark, sfDir).collect()
    val rawEn = docs.where(col("lang") === "en").count().toDouble / docs.count()
    val selEn = got.count(_.getString(2) == "en").toDouble / got.length
    assert(selEn > rawEn + 0.05,
      s"selection en-share $selEn must exceed raw share $rawEn: importance " +
        "weights trained on the en slice should up-select en-like documents")
    val again = Sample.dsirSelectQuery(spark, sfDir).collect()
    assert(got.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
    // content-keyed coins: stable under a different input partitioning
    val logwCol = got.map(r => r.getLong(0) -> r.getAs[Double]("logw")).toMap
    val repart = Sample.dsirSelectQuery(spark, sfDir)
    assert(repart.collect().map(r => r.getLong(0) -> r.getAs[Double]("logw")).toMap
      .forall { case (id, w) => math.abs(w - logwCol(id)) <= 1e-9 })
  }
}
