package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Text

class TokenMarkerStatsSpec extends SparkSpec {
  import spark.implicits._

  test("all fields match the built-in spellings on real documents") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val toks = Text.tokens(col("text"))
    val norm = Text.normalized(col("text"))
    val builtin = struct(
      size(toks).cast("long").as("ws_tokens"),
      length(regexp_replace(norm, " ", "")).cast("long").as("alpha_len"),
      Text.regexTokenCount(col("text")).cast("long").as("re_tokens"),
      Text.markerCount(toks, Text.langMarkers(0)._2).cast("long").as("en"),
      Text.markerCount(toks, Text.langMarkers(1)._2).cast("long").as("es"),
      Text.markerCount(toks, Text.langMarkers(2)._2).cast("long").as("de"),
      Text.markerCount(toks, Text.langMarkers(3)._2).cast("long").as("fr"),
      Text.markerCount(toks, Text.stopwords).cast("long").as("stop"))
    val mismatch = docs
      .select(TokenMarkerStats(col("text")).as("a"), builtin.as("b"))
      .where(not(col("a") === col("b")))
      .count()
    assert(mismatch == 0)
  }

  test("edge cases: empty, whitespace-only, punctuation") {
    val df = Seq("", "   ", "the, the!", "a\tb\nc").toDF("text")
    val r = df.select(TokenMarkerStats(col("text")).as("st"))
      .select("st.ws_tokens", "st.alpha_len", "st.re_tokens", "st.en", "st.stop")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(r(0) == ((1L, 0L, 0L, 0L, 0L)), "empty: split('') -> ['']")
    assert(r(1) == ((1L, 0L, 0L, 0L, 0L)), "whitespace-only trims to ''")
    // "the, the!" -> tokens ["the,", "the!"]; re pieces: the , the ! = 4;
    // markers count exact-token matches only ("the," is not "the")
    assert(r(2) == ((2L, 8L, 4L, 0L, 0L)))
    // tokens [a, b, c]: 'a' is both an en marker and a stopword
    assert(r(3) == ((3L, 3L, 3L, 1L, 1L)), "tabs/newlines delimit tokens")
  }
}
