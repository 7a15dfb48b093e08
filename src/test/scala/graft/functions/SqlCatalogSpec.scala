package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The SQL-catalog face of the native kernel set: every expression
  * GraftExtensions registers is callable from plain SQL over the
  * registered zone tables, and each SQL spelling returns EXACTLY what
  * its DataFrame face returns — one implementation, two spellings (the
  * reference's Athena-style SQL users keep their language). */
class SqlCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ready: Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    graft.GraftExtensions.functions.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
    graft.sources.Tables.registerAll(spark, sfDir)
  }

  /** SQL projection == DataFrame projection, both over the registered
    * `documents` view, compared row-for-row in doc_id order. */
  private def sameOverDocs(sqlExpr: String, dfCol: org.apache.spark.sql.Column): Unit = {
    ready
    val viaSql = spark.sql(
      s"SELECT doc_id, $sqlExpr AS v FROM documents ORDER BY doc_id").collect()
    val viaDf = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), dfCol.as("v")).orderBy(col("doc_id")).collect()
    assert(viaSql.length == viaDf.length && viaSql.nonEmpty)
    viaSql.zip(viaDf).foreach { case (a, b) =>
      assert(a.get(1) == b.get(1), s"doc ${a.get(0)}: SQL ${a.get(1)} != DF ${b.get(1)}")
    }
  }

  test("word_shingles SQL == DataFrame") {
    sameOverDocs("word_shingles(text, 3)", WordShingles(col("text"), 3))
  }

  test("minhashes SQL == DataFrame (the per-shingle kernel, composable via transform)") {
    // minhashes is the PER-SHINGLE kernel (the dedup pipeline explodes
    // shingles first); over one string both spellings must agree —
    sameOverDocs("minhashes(text, 16)", MinHashes(col("text"), 16))
    // — and it composes element-wise over word_shingles in plain SQL
    sameOverDocs("transform(word_shingles(text, 3), s -> minhashes(s, 4)[0])",
      transform(WordShingles(col("text"), 3),
        s => MinHashes(s, 4).getItem(0)))
  }

  test("simhash64 SQL == DataFrame") {
    sameOverDocs("simhash64(text)", SimHash64(col("text")))
  }

  test("token_marker_stats SQL == DataFrame") {
    sameOverDocs("token_marker_stats(text)", TokenMarkerStats(col("text")))
  }

  test("byte_histogram SQL == DataFrame") {
    sameOverDocs("byte_histogram(cast(text AS binary))",
      ByteHistogram(col("text").cast("binary")))
  }

  test("vector_dot and nearest_centroids SQL == DataFrame over embeddings") {
    ready
    val sql = spark.sql(
      """SELECT vec_id,
        |  vector_dot(cast(embedding AS array<double>),
        |             cast(embedding AS array<double>)) AS dot,
        |  nearest_centroids(cast(embedding AS array<double>), array(
        |    named_struct('cluster', 0L, 'ce', array_repeat(1.0d, 64), 'cn', 8.0d),
        |    named_struct('cluster', 1L, 'ce', array_repeat(-1.0d, 64), 'cn', 8.0d)),
        |    1)[0] AS nearest
        |FROM embeddings ORDER BY vec_id LIMIT 50""".stripMargin).collect()
    val e = col("embedding").cast("array<double>")
    val cents = array(
      struct(lit(0L).as("cluster"), array_repeat(lit(1.0), lit(64)).as("ce"),
        lit(8.0).as("cn")),
      struct(lit(1L).as("cluster"), array_repeat(lit(-1.0), lit(64)).as("ce"),
        lit(8.0).as("cn")))
    val df = graft.sources.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), VectorDot(e, e).as("dot"),
        NearestCentroids(e, cents, 1).getItem(0).as("nearest"))
      .orderBy(col("vec_id")).limit(50).collect()
    assert(sql.length == 50)
    sql.zip(df).foreach { case (a, b) =>
      assert(a.getDouble(1) == b.getDouble(1))
      assert(a.getLong(2) == b.getLong(2))
    }
    // non-vacuous: both centroid buckets are actually chosen somewhere
    assert(sql.map(_.getLong(2)).distinct.length == 2)
  }

  test("a non-literal scalar argument is rejected with a clear error") {
    ready
    val e = intercept[Exception](
      spark.sql("SELECT word_shingles(text, CAST(n_chars AS int)) FROM documents").collect())
    assert(e.getMessage.contains("word_shingles"))
  }

  test("bloom_filter_agg + might_contain: members always hit, non-members mostly miss") {
    ready
    // no false negatives: every member key probes true
    val misses = spark.sql(
      """WITH b AS (SELECT bloom_filter_agg(xxhash64(text), 4096) f FROM documents)
        |SELECT count(*) FROM documents
        |WHERE NOT might_contain((SELECT f FROM b), xxhash64(text))""".stripMargin)
      .collect()(0).getLong(0)
    assert(misses == 0L, s"a bloom false-negatived $misses member keys")
    // false positives are rare at this sizing: probe disjoint keys
    val fps = spark.sql(
      """WITH b AS (SELECT bloom_filter_agg(xxhash64(text), 4096) f FROM documents)
        |SELECT count(*) FROM documents
        |WHERE might_contain((SELECT f FROM b), xxhash64(concat(text, '!')))""".stripMargin)
      .collect()(0).getLong(0)
    val n = spark.table("documents").count()
    assert(fps <= math.max(2L, n / 20), s"implausible FP rate: $fps of $n")
  }
}
