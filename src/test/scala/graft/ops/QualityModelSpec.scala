package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C60 quality_classifier — learned quality gate. Rows-only CORRECTNESS
  * entry; this spec is its oracle: held-out discrimination (AUC),
  * class separation, split hygiene, determinism, and the query-face
  * contract. */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  test("train/test split is content-stable, disjoint, and both-sided") {
    val l = QualityModel.labeled(spark, sfDir)
    val counts = l.groupBy(col("split")).count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "test"))
    assert(counts("train") > counts("test"), "~80/20 split")
    // same doc never lands in both splits (split is a doc_id function)
    val both = l.groupBy(col("doc_id"))
      .agg(countDistinct(col("split")).as("k"))
      .where(col("k") > 1).count()
    assert(both == 0)
    // corruption actually corrupts: negatives lose their whitespace
    val neg = l.where(col("label") === 0.0)
      .select(max(size(split(col("text"), "\\s+")))).as[Int].collect()(0)
    assert(neg == 1, s"corrupted docs must fuse to one token, got max $neg")
  }

  test("held-out AUC is near-perfect and classes separate") {
    val sc = QualityModel.scored(spark, sfDir)
      .where(col("split") === "test")
      .select(col("label"), col("score")).as[(Double, Double)].collect()
    val pos = sc.filter(_._1 == 1.0).map(_._2)
    val neg = sc.filter(_._1 == 0.0).map(_._2)
    assert(pos.nonEmpty && neg.nonEmpty, "held-out set holds both classes")
    // AUC by pair counting (ties count half)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val auc = wins / (pos.length.toDouble * neg.length)
    info(s"held-out AUC=$auc pos=${pos.length} neg=${neg.length}")
    assert(auc >= 0.95, s"held-out AUC $auc")
    val sep = pos.sum / pos.length - neg.sum / neg.length
    assert(sep >= 0.5, s"mean natural-vs-junk score gap $sep")
  }

  test("scoring is deterministic within float-aggregation tolerance") {
    val a = QualityModel.scored(spark, sfDir)
      .select(col("doc_id"), col("score")).as[(Long, Double)].collect().toMap
    val b = QualityModel.scored(spark, sfDir)
      .select(col("doc_id"), col("score")).as[(Long, Double)].collect().toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, s) =>
      assert(math.abs(s - b(id)) < 1e-6, s"doc $id: $s vs ${b(id)}")
    }
  }

  test("query face: one row per source, sane gate shares") {
    val rows = QualityModel.qualityClassifier(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[String]("source")).distinct.length == rows.length)
    rows.foreach { r =>
      val bp = r.getAs[Long]("keep_bp")
      assert(bp >= 0L && bp <= 10000L, s"keep_bp $bp")
      val avg = r.getAs[Double]("avg_score")
      assert(avg >= 0.0 && avg <= 1.0)
    }
    // natural text should overwhelmingly clear the gate
    val overall = rows.map(r => r.getAs[Long]("keep_bp") * r.getAs[Long]("docs")).sum /
      rows.map(_.getAs[Long]("docs")).sum
    info(s"overall keep_bp=$overall")
    assert(overall >= 9000L, s"natural corpus keep share $overall bp")
  }
}
