package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unicode degenerate sweep: the testdata corpus is ASCII, but a real
  * 100 TB crawl is not — pin that the text kernels stay defined and
  * deterministic on multibyte/astral input (CJK, emoji, combining
  * accents, NBSP), and document the one locale trap (Java lower-casing
  * is locale-INDEPENDENT in Spark's `lower`, so 'İ' does not explode
  * into dotted-i-plus-combining-dot surprises across JVMs). */
class UnicodeEdgeSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, "Der schnelle Fuß läuft ÜBER die Straße"),     // latin + diacritics
    (2L, "数据湖 每天 摄取 一百 太字节 的 数据"),            // CJK, space-separated
    (3L, "emoji 🎉🎉 and astral 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 stay intact"),   // surrogate pairs
    (4L, "non breaking spaces and\ttabs\nand newlines"),
    (5L, "İstanbul I ı İ"))                             // the Turkish-I trap
    .toDF("doc_id", "text")

  test("normalize/tokens/hash are defined, deterministic, and whitespace-collapsing") {
    val a = rows.select($"doc_id", Text.normalized($"text").as("n"),
      Text.tokens($"text").as("t"), Text.contentHash($"text").as("h")).collect()
    val b = rows.select($"doc_id", Text.normalized($"text").as("n"),
      Text.tokens($"text").as("t"), Text.contentHash($"text").as("h")).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq, "deterministic")
    a.foreach { r =>
      assert(r.getAs[String]("n") != null && r.getAs[String]("h").length == 32)
      assert(r.getAs[scala.collection.Seq[String]]("t").nonEmpty)
    }
    // \s matches tab/newline; NBSP is NOT \s in Java regex — pinned so
    // a future "fix" knows it changes every stored content hash
    val n4 = a.find(_.getLong(0) == 4L).get.getAs[String]("n")
    assert(!n4.contains("\t") && !n4.contains("\n"))
    assert(n4.contains(" "), "NBSP survives normalization (documented)")
    // surrogate pairs survive lower/trim/split round trips
    val t3 = a.find(_.getLong(0) == 3L).get.getAs[scala.collection.Seq[String]]("t")
    assert(t3.contains("🎉🎉"))
  }

  test("quality/token kernels and redaction survive multibyte input") {
    val st = rows.select($"doc_id",
        graft.functions.TokenMarkerStats($"text").as("st"))
      .select($"doc_id", Text.qualityScoreFromStats($"st").as("q"),
        $"st.ws_tokens".as("ws")).collect()
    st.foreach { r =>
      val q = r.getAs[Double]("q")
      assert(!q.isNaN && q >= 0.0 && q <= 1.0, s"quality out of range: $r")
      assert(r.getAs[Long]("ws") > 0L)
    }
    // redaction next to multibyte text: the ASCII address is caught even
    // when a CJK word touches it; an address whose ENTIRE local part is
    // multibyte is outside the (ASCII) contract and passes through —
    // both behaviors pinned so the contract is explicit
    val redacted = rows
      .withColumn("t2", concat($"text", lit(" 数据联系 user@example.com 数据@example.com")))
      .select(regexp_replace($"t2",
        "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>").as("r"))
      .as[String].collect()
    assert(redacted.forall(_.contains("数据联系 <EMAIL>")))
    assert(redacted.forall(_.contains("数据@example.com")),
      "a fully-multibyte local part is outside the ASCII contract — passthrough")
  }

  test("BPE and perplexity survive a multibyte corpus (defined, deterministic)") {
    val dir = tmpDir("unibpe")
    // duplicate the CJK doc so the corpus has learnable pair statistics
    rows.union(rows).union(rows)
      .withColumn("lang", lit("xx")).withColumn("source", lit("u"))
      .withColumn("n_chars", length($"text"))
      .withColumn("doc_id", monotonically_increasing_id())
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // BPE: train on the multibyte word histogram, then encode with it —
    // merges must be byte-stable across two full runs
    val m1 = Bpe.textBpeMerges(spark, dir).collect().map(_.toString).toSeq
    val m2 = Bpe.textBpeMerges(spark, dir).collect().map(_.toString).toSeq
    assert(m1 == m2, "multibyte merge table must be deterministic")
    assert(m1.nonEmpty, "repeated multibyte words must yield merges")
    val enc = Bpe.textBpeEncode(spark, dir).collect()
    assert(enc.nonEmpty)
    enc.foreach(r => assert(r.getAs[Long]("count") > 0L &&
      r.getAs[String]("piece").nonEmpty))
    // unigram perplexity: defined, finite scores on the CJK/emoji corpus
    val px = TextQueries.textPerplexity(spark, dir).collect()
    assert(px.length == 1)
    val r = px.head
    assert(r.getAs[Long]("docs") > 0)
    Seq("avg_xent", "min_xent", "max_xent").foreach { c =>
      val v = r.getAs[Double](c)
      assert(!v.isNaN && !v.isInfinite && v >= 0.0, s"$c = $v")
    }
  }

  test("exact dedup of identical unicode docs is byte-stable") {
    val dir = tmpDir("uni")
    rows.union(rows.where($"doc_id" === 2L).withColumn("doc_id", lit(99L)))
      .withColumn("lang", lit("xx")).withColumn("source", lit("u"))
      .withColumn("n_chars", length($"text"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val card = TextQueries.dedupExact(spark, dir).collect()
    assert(card.length == 1 && card.head.getAs[Long]("dup_docs") == 1L,
      s"the duplicated CJK doc must hash equal: ${card.toSeq}")
  }
}
