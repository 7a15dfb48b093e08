package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: Seq[(Long, Seq[Double])]) =
    Vectors.withNorm(
      rows.toDF("vec_id", "embedding")
        .select($"vec_id", transform($"embedding", x => x.cast("float")).as("embedding")),
      "embedding").select($"vec_id", $"e", $"nrm")

  test("two obvious directional blobs separate at k=2") {
    val blobA = (0L until 10L).map(i => i -> Seq(1.0, 0.01 * i, 0.0, 0.0))
    val blobB = (10L until 20L).map(i => i -> Seq(0.0, 0.0, 1.0, 0.01 * i))
    val f = KMeans.fit(frame(scala.util.Random.shuffle(blobA ++ blobB)), k = 2, iters = 5)
    val got = f.assignments.as[(Long, Long)].collect().toMap
    val aClusters = blobA.map(b => got(b._1)).toSet
    val bClusters = blobB.map(b => got(b._1)).toSet
    assert(aClusters.size == 1 && bClusters.size == 1 && aClusters != bClusters,
      s"blobs must land in distinct clusters: $got")
  }

  test("mean-cosine objective is non-decreasing across rounds") {
    val f = KMeans.fit(
      Vectors.withNorm(graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
        .select($"vec_id", $"e", $"nrm"),
      k = 8, iters = 4, trackObjective = true)
    assert(f.objective.size == 4)
    f.objective.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"objective regressed: ${f.objective}")
    }
  }

  test("every vector sits in its nearest (cosine) centroid") {
    val f = KMeans.fit(frame((0L until 30L).map(i =>
      i -> Seq(math.sin(i * 0.7), math.cos(i * 0.7), math.sin(i * 0.3), 1.0))),
      k = 3, iters = 4)
    val cents = f.centroids.select($"cluster", $"ce").as[(Long, Seq[Double])].collect()
    val vecs = frame((0L until 30L).map(i =>
      i -> Seq(math.sin(i * 0.7), math.cos(i * 0.7), math.sin(i * 0.3), 1.0)))
      .select($"vec_id", $"e").as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val got = f.assignments.as[(Long, Long)].collect()
    got.foreach { case (vid, cl) =>
      val best = cents.maxBy(c => cos(vecs(vid), c._2))._1
      val bestCos = cents.map(c => cos(vecs(vid), c._2)).max
      val gotCos = cos(vecs(vid), cents.find(_._1 == cl).get._2)
      assert(math.abs(gotCos - bestCos) < 1e-12 || best == cl,
        s"vec $vid assigned $cl but nearest is $best")
    }
  }

  test("corpus topics: every cluster labeled, lift recounts, partition holds") {
    val rows = graft.ops.KMeans.corpusTopics(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // lift ranking can never empty a label set: all 8 clusters surface
    val byC = rows.groupBy(_._1)
    assert(byC.size == 8, s"clusters missing labels: ${byC.keySet}")
    byC.foreach { case (c, g) =>
      val sorted = g.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1 to sorted.length).toSeq, s"cluster $c ranks")
      assert(sorted.length <= 5)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._6 >= b._6, s"cluster $c lift rose with rank")
        case _ =>
      }
    }
    val texts = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    // cluster sizes partition the corpus
    assert(byC.map(_._2.head._2).sum == texts.length.toLong)
    // lift arithmetic recounts from the corpus df
    def toks(t: String): Set[String] =
      t.toLowerCase.replaceAll("\\s+", " ").trim.split(' ').toSet
    val df = texts.flatMap(t => toks(t._2)).groupBy(identity).view.mapValues(_.size).toMap
    rows.foreach { case (c, nd, _, term, cnt, lift) =>
      val want = math.floor(cnt.toDouble * texts.length * 10000 / (df(term) * nd) + 0.5).toLong
      assert(lift == want, s"cluster $c '$term' lift_bp $lift vs $want")
    }
  }

  test("duplicate-heavy input with k larger than distinct directions survives") {
    val rows = (0L until 12L).map(i => i -> Seq(1.0, 0.0)) // one direction only
    val f = KMeans.fit(frame(rows), k = 4, iters = 3)
    assert(f.assignments.count() == 12)
    assert(f.centroids.count() >= 1)
  }

  test("assignment stage plan is shuffle-free (broadcast argmax, no exchange)") {
    val v = Vectors.withNorm(graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
      .select($"vec_id", $"e", $"nrm")
    val f = KMeans.fit(v, k = 4, iters = 1)
    val plan = f.assignments.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"assignment must not exchange the corpus:\n$plan")
  }

  test("embed_kmeans query face: k clusters, sane tightness stats") {
    val rows = KMeans.embedKmeans(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 8)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vecs") >= 1)
      assert(r.getAs[Double]("avg_cos") >= r.getAs[Double]("min_cos"))
    }
  }
}
