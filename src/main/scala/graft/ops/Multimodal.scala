package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing (SURVEY §2.C C12).
  *
  * Media assets (image/audio/video) travel the lake as opaque `binary`
  * columns plus typed metadata — the pattern that scales to 100 TB because
  * the bytes never leave the executor and every metadata derivation is a
  * narrow projection. The *decode* step is environment-dependent (codec
  * libraries are not in this container), so it is STUBBED with a
  * deterministic fake keyed off byte length; the surrounding plumbing —
  * binary schema, content addressing, per-partition batch iteration — is
  * real and is what a production decoder would plug into.
  */
object Multimodal {

  /** Text → opaque binary payload (stand-in for real media bytes). */
  def asBinary(textCol: String): org.apache.spark.sql.Column =
    encode(col(textCol), "UTF-8")

  /** Content-addressed metadata: byte length + sha2-256 content id. */
  def withContentId(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("byte_len", octet_length(col(binCol)).cast("long"))
      .withColumn("content_id", sha2(col(binCol), 256))

  /** STUB decoder — deterministic fake dimensions/format derived from the
    * byte length. A real deployment replaces exactly this projection with
    * a codec call (see [[decodePartitions]] for the batch plug point). */
  def withStubDecode(df: DataFrame): DataFrame =
    df.withColumn("fmt",
        when(col("byte_len") % 3 === 0, "jpeg")
          .when(col("byte_len") % 3 === 1, "png")
          .otherwise("webp"))
      .withColumn("width", lit(64) + col("byte_len") % 960)
      .withColumn("height", lit(64) + (col("byte_len") * 7) % 960)

  /** Decoded media metadata record (what a real decoder emits). */
  final case class MediaMeta(doc_id: Long, byte_len: Long, fmt: String,
                             width: Long, height: Long)

  /** The real-decoder plug point: per-partition batch iteration over
    * (id, payload) pairs. `decoder` sees raw bytes and returns typed
    * metadata; partitioning/encoders/batching are the production shape —
    * only the default decoder body is a stub. */
  def decodePartitions(df: DataFrame, idCol: String, binCol: String)
                      (decoder: (Long, Array[Byte]) => MediaMeta): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decoder(id, bytes) })
      .toDF()
  }

  /** Deterministic stub decoder matching [[withStubDecode]]. */
  def stubDecoder(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    val fmt = (n % 3) match { case 0 => "jpeg"; case 1 => "png"; case _ => "webp" }
    MediaMeta(id, n, fmt, 64 + n % 960, 64 + (n * 7) % 960)
  }

  /** Frame sampling: slice an opaque payload into `frameBytes` blocks
    * and keep every `everyN`-th — the video-frame-subsample shape
    * (explode plumbing is real; real codecs would decode each block).
    * Emits (idCol, frame_idx, frame_bytes, frame_len). */
  def frameSample(df: DataFrame, idCol: String, binCol: String,
                  frameBytes: Int = 256, everyN: Int = 4): DataFrame = {
    val step = frameBytes * everyN
    val total = octet_length(col(binCol))
    val lastFrame = greatest(floor((total - 1) / step).cast("long"), lit(0L))
    val frames = when(total.isNull || total === 0, array().cast("array<binary>"))
      .otherwise(transform(sequence(lit(0L), lastFrame),
        i => col(binCol).substr((i * step + 1).cast("int"), lit(frameBytes))))
    df.select(col(idCol), posexplode(frames).as(Seq("frame_idx", "frame_bytes")))
      .withColumn("frame_len", octet_length(col("frame_bytes")).cast("long"))
  }

  /** Feature extraction: 16-bin l1-normalized byte histogram per payload
    * ([[graft.functions.ByteHistogram]], one native scan) — codec-free
    * features that plug straight into the §2.C vector operators. */
  def byteFeatures(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("features", graft.functions.ByteHistogram(col(binCol)))

  /** C15 query: per-source mean byte-histogram profile — feature
    * extraction aggregated into a per-source fingerprint. */
  def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
      .select(col("source"), asBinary("text").as("payload"))
    byteFeatures(d, "payload")
      .select(col("source"), posexplode(col("features")).as(Seq("bin", "share")))
      .groupBy(col("source"), col("bin"))
      .agg(round(avg(col("share")), 4).as("avg_share"),
        count(lit(1)).as("docs"))
      .orderBy(col("source"), col("bin"))
  }

  /** C12 query: binary ingestion metadata aggregated per (source, fmt). */
  def mmMetadata(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
      .select(col("source"), asBinary("text").as("payload"))
    withStubDecode(withContentId(d, "payload"))
      .groupBy(col("source"), col("fmt"))
      .agg(count(lit(1)).as("n"),
        sum(col("byte_len")).as("total_bytes"),
        round(avg(col("width")), 4).as("avg_width"),
        round(avg(col("height")), 4).as("avg_height"),
        min(col("content_id")).as("min_cid"))
      .orderBy(col("source"), col("fmt"))
  }
}
