package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing (SURVEY §2.C C12).
  *
  * Media assets (image/audio/video) travel the lake as opaque `binary`
  * columns plus typed metadata — the pattern that scales to 100 TB because
  * the bytes never leave the executor and every metadata derivation is a
  * narrow projection. PIXEL decode is environment-dependent (codec
  * libraries are not in this container) and stays STUBBED with a
  * deterministic fake keyed off byte length; header-level decode is REAL
  * ([[headerDecoder]] parses PNG/GIF/BMP/JPEG container magic in pure
  * JVM code), and the surrounding plumbing — binary schema, content
  * addressing, per-partition batch iteration — is what a production
  * codec call plugs into.
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
    * only the default decoder body is a stub. NULL payloads (failed
    * fetches — guaranteed in a real binary corpus) normalize to empty
    * bytes HERE, so every plugged decoder inherits the guard instead of
    * each one NPE-ing its task on the first missing object (probed;
    * MultimodalSpec pins it). */
  def decodePartitions(df: DataFrame, idCol: String, binCol: String)
                      (decoder: (Long, Array[Byte]) => MediaMeta): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decoder(id, if (bytes == null) Array.empty else bytes) })
      .toDF()
  }

  /** Deterministic stub decoder matching [[withStubDecode]]. */
  def stubDecoder(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    val fmt = (n % 3) match { case 0 => "jpeg"; case 1 => "png"; case _ => "webp" }
    MediaMeta(id, n, fmt, 64 + n % 960, 64 + (n * 7) % 960)
  }

  /** A REAL decoder for the [[decodePartitions]] plug point: parses
    * actual container magic — PNG IHDR, GIF logical screen descriptor,
    * BMP info header, JPEG SOF marker walk — out of the payload bytes in
    * pure JVM code, no codec library. Pixel decode stays out of scope
    * (the libs are not in this container), but header-level metadata is
    * the part an ingest pipeline needs (format routing, dimension
    * filters), and this proves the plug point carries genuine byte-level
    * decoding, not only the deterministic stub. Unknown payloads fall
    * back to ("bin", 0, 0) instead of failing the batch. */
  def headerDecoder(id: Long, bytes: Array[Byte]): MediaMeta = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Long = (u8(i) << 8 | u8(i + 1)).toLong
    def le16(i: Int): Long = (u8(i) | u8(i + 1) << 8).toLong
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    val n = bytes.length.toLong
    if (n >= 24 && u8(0) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
        bytes(3) == 'G')
      MediaMeta(id, n, "png", be32(16), be32(20))
    else if (n >= 10 && bytes.take(4).sameElements("GIF8".getBytes))
      MediaMeta(id, n, "gif", le16(6), le16(8))
    else if (n >= 26 && bytes(0) == 'B' && bytes(1) == 'M')
      MediaMeta(id, n, "bmp", le32(18), le32(22))
    else if (n >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk the marker chain to the first frame header (SOF0-15,
      // minus the non-frame C4/C8/CC), which carries height then width
      var i = 2
      var out = MediaMeta(id, n, "jpeg", 0, 0)
      var done = false
      while (!done && i + 8 < bytes.length) {
        if (u8(i) != 0xff) i += 1
        else u8(i + 1) match {
          case 0xff => i += 1
          case m if m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
            out = MediaMeta(id, n, "jpeg", be16(i + 7), be16(i + 5)); done = true
          case m if m >= 0xd0 && m <= 0xd9 => i += 2 // standalone markers
          case _ => i += 2 + be16(i + 2).toInt       // segment with length
        }
      }
      out
    } else MediaMeta(id, n, "bin", 0, 0)
  }

  /** One decoded image: row-major RGB triples (3 bytes/pixel). */
  final case class PixelImage(doc_id: Long, fmt: String, width: Long,
                              height: Long, pixels: Array[Byte])

  /** A REAL image codec through the mapPartitions plug point: the JDK's
    * `javax.imageio` (PNG/GIF/BMP/JPEG readers ship with every JVM — no
    * external codec library needed, so this one is NOT a stub). Full
    * pixel decode on the executor; unknown payloads degrade to an empty
    * pixel array instead of failing the batch, exactly like
    * [[headerDecoder]]. */
  def imageIoDecoder(id: Long, bytes: Array[Byte]): PixelImage = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) PixelImage(id, "bin", 0, 0, Array.empty)
    else {
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Byte](w * h * 3)
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          out(i) = ((rgb >> 16) & 0xff).toByte
          out(i + 1) = ((rgb >> 8) & 0xff).toByte
          out(i + 2) = (rgb & 0xff).toByte
          i += 3; x += 1
        }
        y += 1
      }
      PixelImage(id, "img", w.toLong, h.toLong, out)
    }
  }

  /** Pixel-level twin of [[decodePartitions]]: per-partition batch decode
    * emitting (doc_id, fmt, width, height, pixels). The pixels column is
    * an ordinary binary column, so the decoded output feeds straight back
    * into the same plumbing ([[byteFeatures]], [[frameSample]], content
    * addressing). */
  def decodePixels(df: DataFrame, idCol: String, binCol: String)
                  (decoder: (Long, Array[Byte]) => PixelImage = imageIoDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decoder(id, bytes) })
      .toDF()
  }

  /** Nearest-neighbor resize over decoded pixel frames (the standard
    * thumbnail/normalize step between decode and feature extraction).
    * Operates on [[decodePixels]] output — plain executor-side loop over
    * the RGB buffer, no codec round-trip, so a decode→resize→featurize
    * chain is one narrow mapPartitions pipeline per partition. Rows
    * whose decode degraded (empty pixels) stay degraded instead of
    * failing the batch. */
  def resizePixels(df: DataFrame, toWidth: Int, toHeight: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[PixelImage].mapPartitions(_.map { p =>
      if (p.pixels.isEmpty || p.width <= 0 || p.height <= 0)
        p.copy(width = 0, height = 0, pixels = Array.empty)
      else {
        val w = p.width.toInt; val h = p.height.toInt
        val out = new Array[Byte](toWidth * toHeight * 3)
        var i = 0
        var y = 0
        while (y < toHeight) {
          val sy = (y.toLong * h / toHeight).toInt
          var x = 0
          while (x < toWidth) {
            val sx = (x.toLong * w / toWidth).toInt
            val s = (sy * w + sx) * 3
            out(i) = p.pixels(s); out(i + 1) = p.pixels(s + 1)
            out(i + 2) = p.pixels(s + 2)
            i += 3; x += 1
          }
          y += 1
        }
        PixelImage(p.doc_id, p.fmt, toWidth.toLong, toHeight.toLong, out)
      }
    }).toDF()
  }

  /** 64-bit average hash (aHash) of a decoded image: resize to 8×8
    * (caller runs [[resizePixels]] first or passes any frame whose
    * pixel count is 64), luma per cell, one bit per cell = luma above
    * the image's mean. The standard cheap perceptual fingerprint —
    * brightness/scale/format shifts move few bits, so near-identical
    * images land within a small Hamming distance. Degraded rows (empty
    * pixels) hash to 0 and are dropped by [[imageNearDups]]. */
  def aHash64(p: PixelImage): Long = {
    if (p.pixels.length != 64 * 3) 0L
    else {
      val luma = new Array[Int](64)
      var i = 0
      while (i < 64) {
        val r = p.pixels(i * 3) & 0xff
        val g = p.pixels(i * 3 + 1) & 0xff
        val b = p.pixels(i * 3 + 2) & 0xff
        // integer Rec.601 luma — deterministic, no doubles
        luma(i) = (299 * r + 587 * g + 114 * b) / 1000
        i += 1
      }
      val mean = luma.sum / 64
      var h = 0L
      i = 0
      while (i < 64) {
        if (luma(i) > mean) h |= (1L << i)
        i += 1
      }
      h
    }
  }

  /** (doc_id, ahash) over a decoded-pixels frame: resize to 8×8 inside
    * the same narrow mapPartitions chain as the decode, then the
    * integer aHash — the whole decode→thumbnail→fingerprint pipeline
    * never shuffles. */
  def aHashFrame(decoded: DataFrame): DataFrame = {
    val spark = decoded.sparkSession
    import spark.implicits._
    resizePixels(decoded, 8, 8).as[PixelImage]
      .map(p => (p.doc_id, aHash64(p)))
      .toDF("doc_id", "ahash")
  }

  /** 64-bit DCT perceptual hash (pHash) of a decoded 32×32 image: luma
    * plane → 2D DCT-II (separable, row then column passes) → the
    * top-left 8×8 low-frequency block → one bit per coefficient above
    * the block's median. Robust where aHash is not: a gamma/contrast
    * shift moves every luma value relative to the MEAN (aHash bits flip
    * wholesale) but barely reorders the low-frequency coefficients
    * against their own MEDIAN — the structure, not the brightness, is
    * hashed. The DC coefficient rides as an always-set constant bit
    * (standard practice; it carries no discriminating structure).
    * Degraded rows (empty pixels) hash to 0 and are excluded by
    * [[imageNearDups]]. Pure per-row executor arithmetic — determinism
    * across retries/partitions is IEEE, no cross-engine oracle needed
    * (library row, spec-covered). */
  def pHash64(p: PixelImage): Long = {
    val n = 32
    if (p.pixels.length != n * n * 3) 0L
    else {
      val luma = new Array[Double](n * n)
      var i = 0
      while (i < n * n) {
        val r = p.pixels(i * 3) & 0xff
        val g = p.pixels(i * 3 + 1) & 0xff
        val b = p.pixels(i * 3 + 2) & 0xff
        luma(i) = (299 * r + 587 * g + 114 * b) / 1000.0
        i += 1
      }
      // separable DCT-II with a precomputed cosine table
      val cosT = Array.tabulate(n, n)((k, x) =>
        math.cos((2 * x + 1) * k * math.Pi / (2.0 * n)))
      val rows = Array.ofDim[Double](n, n)
      var y = 0
      while (y < n) {
        var k = 0
        while (k < 8) { // only the first 8 frequencies are ever read
          var s = 0.0; var x = 0
          while (x < n) { s += luma(y * n + x) * cosT(k)(x); x += 1 }
          rows(y)(k) = s; k += 1
        }
        y += 1
      }
      val block = new Array[Double](64)
      var v = 0
      while (v < 8) {
        var u = 0
        while (u < 8) {
          var s = 0.0; var yy = 0
          while (yy < n) { s += rows(yy)(u) * cosT(v)(yy); yy += 1 }
          block(v * 8 + u) = s; u += 1
        }
        v += 1
      }
      val med = {
        val sorted = block.sorted
        (sorted(31) + sorted(32)) / 2.0
      }
      var h = 0L
      i = 0
      while (i < 64) {
        if (block(i) > med) h |= (1L << i)
        i += 1
      }
      h
    }
  }

  /** (doc_id, phash) over a decoded-pixels frame: resize to 32×32 in
    * the same narrow mapPartitions chain, then the DCT hash — like
    * [[aHashFrame]], the decode→thumbnail→fingerprint pipeline never
    * shuffles. */
  def pHashFrame(decoded: DataFrame): DataFrame = {
    val spark = decoded.sparkSession
    import spark.implicits._
    resizePixels(decoded, 32, 32).as[PixelImage]
      .map(p => (p.doc_id, pHash64(p)))
      .toDF("doc_id", "phash")
  }

  /** Image near-duplicate pairs by perceptual hash: 4 bands of 16 bits
    * block the candidates (pigeonhole: Hamming <= 3 of 64 bits shares
    * at least one band), exact `bit_count` Hamming filters — the
    * [[Dedup.simhashCandidates]] architecture applied to pixels, so the
    * join is band-equi, never all-pairs, and scales like the text
    * SimHash face. Rows that failed to decode (hash 0) are excluded.
    * `hashCol` selects the fingerprint family — "ahash" (cheap,
    * brightness-sensitive) or "phash" (DCT, gamma/contrast-robust). */
  def imageNearDups(hashes: DataFrame, maxHamming: Int = 3,
                    hashCol: String = "ahash"): DataFrame = {
    val live = hashes.where(col(hashCol) =!= 0L)
    val banded = live.select(col("doc_id"), col(hashCol).as("__h"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col(hashCol), b * 16).bitwiseAND(0xFFFF).as(s"b$b")): _*))
        .as(Seq("band_idx", "band_val")))
    val a = banded.select(col("doc_id").as("doc_a"), col("__h").as("h_a"),
      col("band_idx"), col("band_val"))
    val b = banded.select(col("doc_id").as("doc_b"), col("__h").as("h_b"),
      col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val")).where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
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
