package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-12 degenerate-input sweep for the streaming intake library —
  * the batch-face sweep (DegenerateExportSweepSpec) found 12 real
  * crashes; these are the streaming counterparts a brand-new or
  * misbehaving deployment hits on day one:
  *
  *  - an EMPTY standing index (the first intake ever) must admit
  *    every arrival — in particular the bloom pre-filter's
  *    `bloom_filter_agg` over zero rows yields a NULL bloom, and a
  *    bare `might_contain(NULL, x)` is NULL, which both filter
  *    branches would silently drop: the whole intake lost, no error;
  *  - NULL-text arrivals must flow through every gate as defined
  *    rows, never kill the query or vanish.
  */
class StreamingDegenerateSpec extends SparkSpec {
  import spark.implicits._

  private val emptyStanding =
    Seq.empty[(String, Long)].toDF("h", "fp")

  test("dedupBloomStream: an EMPTY standing index admits every arrival (null-bloom guard)") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val got = StreamingDocs.dedupBloomStream(docs, emptyStanding)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L),
      s"an empty index must admit the WHOLE intake, got $got")
  }

  test("dedupBloomStream: empty standing index admits a real micro-batched stream") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = StreamingDocs.dedupBloomStream(
        stream.toDF().toDF("doc_id", "text"), emptyStanding)
      .writeStream.format("memory").queryName("deg_bloom")
      .outputMode("append").start()
    try {
      stream.addData(Seq((10L, "one two three"), (11L, "four five six")))
      q.processAllAvailable()
      stream.addData(Seq((12L, "seven eight nine")))
      q.processAllAvailable()
      val got = spark.table("deg_bloom").select("doc_id").as[Long].collect().toSet
      assert(got == Set(10L, 11L, 12L), s"stream lost rows: $got")
    } finally q.stop()
  }

  test("dedupAgainstStream: empty standing index + null-text arrivals, nothing lost but null-dups collapse") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = StreamingDocs.dedupAgainstStream(
        stream.toDF().toDF("doc_id", "text", "ts"),
        emptyStanding.withColumnRenamed("fp", "fp"), "ts")
      .writeStream.format("memory").queryName("deg_exact")
      .outputMode("append").start()
    try {
      val t = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      stream.addData(Seq(
        (1L, "healthy document text", t),
        (2L, null.asInstanceOf[String], t),      // failed extraction
        (3L, "another healthy document", t)))
      q.processAllAvailable()
      val got = spark.table("deg_exact").select("doc_id").as[Long].collect().toSet
      // null text hashes to null; the anti-joins pass it through (null
      // never equals an index key) and the in-horizon dedup keeps the
      // FIRST null arrival — contentless docs collapse like exact dups
      assert(Set(1L, 3L).subsetOf(got) && got.contains(2L),
        s"healthy + first-null arrivals must all admit: $got")
    } finally q.stop()
  }

  test("decontaminateStream: an EMPTY benchmark and null-text docs give defined flags") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val noBench = Seq.empty[String].toDF("ngram")
    val got = StreamingDocs.decontaminateStream(docs, noBench).collect()
    assert(got.length == 2, "every arrival keeps its row")
    got.foreach { r =>
      assert(!r.getAs[Boolean]("contaminated") || r.isNullAt(r.fieldIndex("contaminated")),
        s"nothing can be contaminated by an empty benchmark: $r")
    }
  }

  test("spanRecycleStream: an EMPTY standing window set reads 0 bp per tokenized arrival") {
    // round-12 ADVICE: the guard must mirror the INDEXED path's null
    // semantics — a null-text arrival reads null total_tokens (ANSI
    // size(null)) and null recycled_bp, never a fabricated 0
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val noWins = Seq.empty[Tuple1[String]].toDF("h")
    val got = StreamingDocs.spanRecycleStream(docs, noWins)
      .select("doc_id", "recycled_bp").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got == Map(1L -> Some(0L), 2L -> None),
      s"empty index: 0 bp for tokenized text, null for null text: $got")
  }

  test("DSIR: an EMPTY fit corpus gives the neutral model; null-text arrivals keep rows") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val m = StreamingDsir.fit(empty, lit(true))
    assert(m.ratios.isEmpty && m.default == 0.0,
      s"empty fit must be the neutral model: $m")
    val docs = Seq((1L, "some arriving document text here"),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = StreamingDsir.scoreStream(docs, m)
      .select("doc_id", "logw").collect()
    assert(got.length == 2, "every arrival keeps its row")
    val w1 = got.find(_.getLong(0) == 1L).get
    assert(!w1.isNullAt(1) && w1.getDouble(1) == 0.0,
      s"neutral model scores every document logw 0: $w1")
  }

  test("anomaly flagStream: an EMPTY fence table flags nothing and loses nothing") {
    val events = Seq((1L, "click", 5.0), (2L, "view", 1e12),
      (3L, "click", Double.NaN)).toDF("event_id", "event_type", "value")
    val noFences = Seq.empty[(String, Double)].toDF("event_type", "fence")
    val got = StreamingAnomaly.flagStream(events, noFences)
      .select("event_id", "is_anomaly").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> false, 3L -> false),
      s"no fence, no anomaly: $got")
    assert(StreamingAnomaly.gateStream(events, noFences).count() == 3)
  }

  test("volume monitorStream: an EMPTY baseline reports windows un-flagged, not lost") {
    val t = java.sql.Timestamp.valueOf("2026-01-01 10:15:00")
    val events = Seq(("click", t), ("click", t), ("view", t))
      .toDF("event_type", "ts")
    val noBase = Seq.empty[(String, Long)].toDF("event_type", "base_x2")
    val got = StreamingVolume.monitorStream(events, noBase).collect()
    assert(got.length == 2, s"both (hour, type) windows must report: ${got.toSeq}")
    got.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("ratio_bp")), "no baseline → null ratio")
      assert(r.getAs[Int]("is_spike") == 0, "a new type is a schema question, not a spike")
    }
  }

  test("qualityDriftStream: EMPTY baseline + null-text arrivals report drifting, defined") {
    val t = java.sql.Timestamp.valueOf("2026-01-01 10:15:00")
    val docs = Seq(("web", "good document text here", t),
      ("web", null.asInstanceOf[String], t)).toDF("source", "text", "ts")
    val noBase = Seq.empty[(String, Double)].toDF("source", "base_q")
    val got = StreamingDrift.qualityDriftStream(docs, noBase, "ts").collect()
    assert(got.length == 1, s"one (window, source) row: ${got.toSeq}")
    assert(got.head.getAs[Long]("n_docs") == 2, "null-text arrivals still count")
    assert(got.head.getAs[Boolean]("drifting"), "a source with no baseline is novel")
  }

  test("shareDriftStream: EMPTY baseline + null-text arrivals report drifted, defined") {
    val t = java.sql.Timestamp.valueOf("2026-01-01 10:15:00")
    val docs = Seq(("web", "five whole tokens right here now", t),
      ("pdf", null.asInstanceOf[String], t)).toDF("source", "text", "ts")
    val noBase = Seq.empty[(String, Long)].toDF("source", "base_bp")
    val got = StreamingMixture.shareDriftStream(docs, noBase, "ts")
      .orderBy("source").collect()
    assert(got.length == 2, s"both sources report: ${got.toSeq}")
    got.foreach(r => assert(r.getAs[Boolean]("drifted"),
      "sources with no baseline are novel by definition"))
  }

  test("retrieval scoreStream/gateStream: an EMPTY benchmark model flags nothing") {
    val docs = Seq((1L, "what is the capital of france"),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val m = StreamingRetrieval.Bm25Model(Seq.empty, avgdl = 1.0)
    val got = StreamingRetrieval.gateStream(docs, m, cut = 1.0).collect()
    assert(got.length == 2, "every arrival keeps its row")
    got.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Any]]("scores").isEmpty)
      assert(r.isNullAt(r.fieldIndex("best_score")))
      assert(!r.getAs[Boolean]("retrieval_flagged"),
        "an empty benchmark can leak nothing")
    }
  }

  private val emptyCents = Seq.empty[(Long, Seq[Double], Double)]
    .toDF("cluster", "ce", "cn")
  private val emptyCb = Seq.empty[(Int, Long, Seq[Double])]
    .toDF("m", "code", "cv")

  test("nearDupStream: an EMPTY vector index admits every arrival unflagged, zero-norm survives") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = java.sql.Timestamp.valueOf("2026-01-01 10:15:00")
    val emptyCodes = Seq.empty[(Long, Long, Seq[Int])]
      .toDF("vec_id", "cluster", "codes")
    val emptyStandingVecs = Seq.empty[(Long, Seq[Double], Double)]
      .toDF("vec_id", "e", "nrm")
    val stream = MemoryStream[(Long, Seq[Double], Double, java.sql.Timestamp)]
    val q = StreamingVectors.nearDupStream(
        stream.toDF().toDF("vec_id", "e", "nrm", "ts"),
        emptyCents, emptyCb, emptyCodes, emptyStandingVecs, "ts",
        numSub = 2, subDim = 2)
      .writeStream.format("memory").queryName("deg_neardup")
      .outputMode("append").start()
    try {
      stream.addData(Seq((1L, Seq(1.0, 0.0, 0.0, 0.0), 1.0, t),
        (2L, Seq(0.0, 0.0, 0.0, 0.0), 0.0, t)))    // failed encoder
      q.processAllAvailable()
      val got = spark.table("deg_neardup").collect()
      assert(got.isEmpty, s"an empty index can near-duplicate nothing: ${got.toSeq}")
    } finally q.stop()
  }

  test("decontaminateSemanticStream: an EMPTY benchmark flags nothing, zero-norm survives") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = java.sql.Timestamp.valueOf("2026-01-01 10:15:00")
    val noItems = Seq.empty[(Long, Seq[Double], Double)].toDF("vec_id", "e", "nrm")
    val stream = MemoryStream[(Long, Seq[Double], Double, java.sql.Timestamp)]
    val q = StreamingVectors.decontaminateSemanticStream(
        stream.toDF().toDF("vec_id", "e", "nrm", "ts"), noItems, "ts")
      .writeStream.format("memory").queryName("deg_semdecon")
      .outputMode("append").start()
    try {
      stream.addData(Seq((1L, Seq(1.0, 0.0), 1.0, t), (2L, Seq(0.0, 0.0), 0.0, t)))
      q.processAllAvailable()
      val got = spark.table("deg_semdecon").collect()
      assert(got.isEmpty, s"an empty benchmark can leak nothing: ${got.toSeq}")
    } finally q.stop()
  }

  test("vector driftStream: an EMPTY model + baseline reports stale windows, not a crash") {
    val t = java.sql.Timestamp.valueOf("2026-01-01 10:15:00")
    val vecs = Seq((1L, Seq(1.0, 0.0, 0.0, 0.0), 1.0, t))
      .toDF("vec_id", "e", "nrm", "ts")
    val noBase = Seq.empty[(Long, Double)].toDF("cluster", "base_qerr")
    val got = StreamingVectors.driftStream(vecs, emptyCents, emptyCb, noBase,
      "ts", numSub = 2, subDim = 2).collect()
    assert(got.length == 1, s"the window must report: ${got.toSeq}")
    assert(got.head.getAs[Boolean]("stale"),
      "arrivals assigning against an empty model are by definition novel")
  }
}
