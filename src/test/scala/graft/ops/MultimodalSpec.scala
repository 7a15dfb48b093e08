package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("content id is a stable sha2-256 of the payload bytes") {
    val df = Seq(("doc", "hello world")).toDF("id", "text")
      .withColumn("payload", Multimodal.asBinary("text"))
    val r = Multimodal.withContentId(df, "payload")
      .select("byte_len", "content_id").head()
    assert(r.getLong(0) == 11L)
    assert(r.getString(1) ==
      "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9")
  }

  test("decodePartitions plumbing matches the columnar stub decode") {
    val d = graft.sources.Tables(spark, sfDir, "documents").limit(20)
      .select(col("doc_id"), col("text"))
      .withColumn("payload", Multimodal.asBinary("text"))
    val viaBatch = Multimodal.decodePartitions(d, "doc_id", "payload")(Multimodal.stubDecoder)
      .select("doc_id", "byte_len", "fmt", "width", "height")
      .as[(Long, Long, String, Long, Long)].collect().toSet
    val viaColumns = Multimodal.withStubDecode(Multimodal.withContentId(d, "payload"))
      .select("doc_id", "byte_len", "fmt", "width", "height")
      .as[(Long, Long, String, Long, Long)].collect().toSet
    assert(viaBatch == viaColumns,
      "mapPartitions decoder and columnar stub must emit identical metadata")
  }
}
