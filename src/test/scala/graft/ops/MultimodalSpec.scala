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

  test("byte histogram is l1-normalized and matches a hand computation") {
    val df = Seq("aaab").toDF("text")  // 'a'=0x61 bin 6 x3, 'b'=0x62 bin 6 x1
      .withColumn("payload", Multimodal.asBinary("text"))
    val h = Multimodal.byteFeatures(df, "payload")
      .select("features").as[Seq[Double]].head()
    assert(h.length == 16)
    assert(h(6) == 1.0 && h.sum == 1.0)
    val mixed = Seq(" a!").toDF("text")  // 0x20 bin 2, 0x61 bin 6, 0x21 bin 2
      .withColumn("payload", Multimodal.asBinary("text"))
    val h2 = Multimodal.byteFeatures(mixed, "payload")
      .select("features").as[Seq[Double]].head()
    assert(h2(2) == 2.0 / 3 && h2(6) == 1.0 / 3)
  }

  test("frameSample slices payloads into strided fixed-size frames") {
    val text = "x" * 1000  // 1000 bytes; frame 100, stride x2 => frames at 0,200,...,800
    val df = Seq((1L, text)).toDF("doc_id", "text")
      .withColumn("payload", Multimodal.asBinary("text"))
    val frames = Multimodal.frameSample(df, "doc_id", "payload",
      frameBytes = 100, everyN = 2)
      .select("frame_idx", "frame_len").as[(Int, Long)].collect().sortBy(_._1)
    assert(frames.length == 5)
    assert(frames.forall(_._2 == 100L))
    // short payload: one (truncated) frame
    val short = Seq((2L, "tiny")).toDF("doc_id", "text")
      .withColumn("payload", Multimodal.asBinary("text"))
    val f2 = Multimodal.frameSample(short, "doc_id", "payload", 100, 2)
      .select("frame_len").as[Long].collect()
    assert(f2.toSeq == Seq(4L))
    // empty payload: zero frames, not one phantom empty frame
    val empty = Seq((3L, "")).toDF("doc_id", "text")
      .withColumn("payload", Multimodal.asBinary("text"))
    assert(Multimodal.frameSample(empty, "doc_id", "payload", 100, 2).count() == 0)
    // NULL payload: also zero frames
    val nul = Seq(4L).toDF("doc_id")
      .withColumn("payload", lit(null).cast("binary"))
    assert(Multimodal.frameSample(nul, "doc_id", "payload", 100, 2).count() == 0)
  }

  test("headerDecoder parses real PNG/GIF/BMP/JPEG container headers") {
    def png(w: Int, h: Int): Array[Byte] = {
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      val ihdr = Array[Byte](0, 0, 0, 13) ++ "IHDR".getBytes ++
        Array((w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte, w.toByte,
          (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte, h.toByte) ++
        Array[Byte](8, 6, 0, 0, 0)
      sig ++ ihdr
    }
    def gif(w: Int, h: Int): Array[Byte] =
      "GIF89a".getBytes ++ Array((w & 0xff).toByte, (w >> 8).toByte,
        (h & 0xff).toByte, (h >> 8).toByte) ++ Array.fill[Byte](4)(0)
    def bmp(w: Int, h: Int): Array[Byte] =
      "BM".getBytes ++ Array.fill[Byte](16)(0) ++
        Array((w & 0xff).toByte, (w >> 8 & 0xff).toByte, (w >> 16 & 0xff).toByte,
          (w >> 24).toByte, (h & 0xff).toByte, (h >> 8 & 0xff).toByte,
          (h >> 16 & 0xff).toByte, (h >> 24).toByte) ++ Array.fill[Byte](4)(0)
    def jpeg(w: Int, h: Int): Array[Byte] =
      Array(0xff, 0xd8).map(_.toByte) ++                         // SOI
        (Array(0xff, 0xe0, 0x00, 0x10).map(_.toByte) ++          // APP0 len 16
          Array.fill[Byte](14)(0)) ++
        Array(0xff, 0xc0, 0x00, 0x11, 0x08).map(_.toByte) ++     // SOF0 len 17
        Array((h >> 8).toByte, h.toByte, (w >> 8).toByte, w.toByte) ++
        Array.fill[Byte](10)(0)

    val rows = Seq(
      (1L, png(640, 480)), (2L, gif(320, 200)), (3L, bmp(123, 77)),
      (4L, jpeg(800, 600)), (5L, "not an image at all".getBytes))
    val df = rows.toDF("doc_id", "payload")
    val got = Multimodal.decodePartitions(df, "doc_id", "payload")(Multimodal.headerDecoder)
      .select("doc_id", "fmt", "width", "height")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == (("png", 640L, 480L)))
    assert(got(2L) == (("gif", 320L, 200L)))
    assert(got(3L) == (("bmp", 123L, 77L)))
    assert(got(4L) == (("jpeg", 800L, 600L)))
    assert(got(5L) == (("bin", 0L, 0L)))
  }

  test("null/empty/garbage payloads decode to fallbacks, never kill the batch") {
    import spark.implicits._
    // a failed fetch (null), a zero-byte object, a one-byte object, junk
    val bins = Seq(
      (1L, null.asInstanceOf[Array[Byte]]),
      (2L, Array.empty[Byte]),
      (3L, Array[Byte](0x42)),
      (4L, "totally not an image".getBytes("UTF-8")))
      .toDF("media_id", "content")
    val metas = Multimodal.decodePartitions(bins, "media_id", "content")(
        Multimodal.headerDecoder)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("byte_len"), r.getAs[String]("fmt")))).toMap
    assert(metas.keySet == Set(1L, 2L, 3L, 4L), "every row survives")
    assert(metas(1L) == ((0L, "bin")), "null payload normalizes to empty -> fallback")
    assert(metas(2L) == ((0L, "bin")))
    assert(metas(3L)._2 == "bin" && metas(4L)._2 == "bin",
      "unknown magic falls back instead of failing the task")
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

  test("real codec: javax.imageio decodes a real PNG's pixels through the plug point") {
    // craft REAL PNGs with known pixel patterns: 2x2 RGB quadrants and a
    // solid red 4x3 — encoded by the actual PNG writer, not a stub
    def png(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val quad = png(2, 2) {
      case (0, 0) => 0xff0000; case (1, 0) => 0x00ff00
      case (0, 1) => 0x0000ff; case _ => 0xffffff
    }
    val red = png(4, 3)((_, _) => 0xff0000)
    val d = Seq((1L, quad), (2L, red), (3L, "not an image".getBytes))
      .toDF("doc_id", "payload")

    val got = Multimodal.decodePixels(d, "doc_id", "payload")()
      .as[Multimodal.PixelImage].collect().map(p => p.doc_id -> p).toMap

    // exact pixel values back out of the real decoder, row-major RGB
    assert(got(1L).width == 2 && got(1L).height == 2)
    assert(got(1L).pixels.toSeq == Seq(
      0xff, 0x00, 0x00,  0x00, 0xff, 0x00,   // row 0: red, green
      0x00, 0x00, 0xff,  0xff, 0xff, 0xff    // row 1: blue, white
    ).map(_.toByte))
    assert(got(2L).pixels.toSeq == Seq.fill(4 * 3)(Seq(0xff, 0x00, 0x00)).flatten.map(_.toByte))
    assert(got(3L).fmt == "bin" && got(3L).pixels.isEmpty, "non-image degrades, not fails")

    // the header decoder and the full codec agree on dimensions
    val hdr = Multimodal.decodePartitions(d.limit(2), "doc_id", "payload")(Multimodal.headerDecoder)
      .select("doc_id", "fmt", "width", "height")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(hdr(1L) == ((1L, "png", 2L, 2L)) && hdr(2L) == ((2L, "png", 4L, 3L)))

    // decoded pixels feed the mm_features profiling unchanged: the solid
    // red image's l1-normalized byte histogram is 2/3 zeros (G,B) and
    // 1/3 0xff (R) — bins 0 and 15
    val prof = Multimodal.byteFeatures(
      Multimodal.decodePixels(d, "doc_id", "payload")().where(col("doc_id") === 2L),
      "pixels")
      .select(posexplode(col("features")).as(Seq("bin", "share")))
      .as[(Int, Double)].collect().toMap
    assert(math.abs(prof(0) - 2.0 / 3) < 1e-9, s"zero-byte share: ${prof(0)}")
    assert(math.abs(prof(15) - 1.0 / 3) < 1e-9, s"0xff share: ${prof(15)}")
    assert((1 to 14).forall(b => prof(b) == 0.0))
  }

  test("resizePixels: nearest-neighbor up/downscale with exact pixel values") {
    def png(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val quad = png(2, 2) {
      case (0, 0) => 0xff0000; case (1, 0) => 0x00ff00
      case (0, 1) => 0x0000ff; case _ => 0xffffff
    }
    val red = png(4, 3)((_, _) => 0xff0000)
    val d = Seq((1L, quad), (2L, red), (3L, "not an image".getBytes))
      .toDF("doc_id", "payload")
    val decoded = Multimodal.decodePixels(d, "doc_id", "payload")()

    // 2x upscale: each source pixel becomes a 2x2 block of its own color
    val up = Multimodal.resizePixels(decoded.where(col("doc_id") === 1L), 4, 4)
      .as[Multimodal.PixelImage].head()
    assert(up.width == 4 && up.height == 4 && up.pixels.length == 4 * 4 * 3)
    def rgbAt(p: Multimodal.PixelImage, x: Int, y: Int): Seq[Int] = {
      val i = (y * p.width.toInt + x) * 3
      p.pixels.slice(i, i + 3).map(_ & 0xff).toSeq
    }
    assert(rgbAt(up, 0, 0) == Seq(0xff, 0, 0) && rgbAt(up, 1, 1) == Seq(0xff, 0, 0))
    assert(rgbAt(up, 2, 0) == Seq(0, 0xff, 0) && rgbAt(up, 3, 1) == Seq(0, 0xff, 0))
    assert(rgbAt(up, 0, 2) == Seq(0, 0, 0xff) && rgbAt(up, 1, 3) == Seq(0, 0, 0xff))
    assert(rgbAt(up, 2, 2) == Seq(0xff, 0xff, 0xff) && rgbAt(up, 3, 3) == Seq(0xff, 0xff, 0xff))

    // downscale a solid image: still solid, exact target dims
    val down = Multimodal.resizePixels(decoded.where(col("doc_id") === 2L), 2, 2)
      .as[Multimodal.PixelImage].head()
    assert(down.width == 2 && down.height == 2)
    assert(down.pixels.toSeq == Seq.fill(4)(Seq(0xff, 0x00, 0x00)).flatten.map(_.toByte))

    // degraded decodes stay degraded (no crash, no phantom pixels)
    val bad = Multimodal.resizePixels(decoded.where(col("doc_id") === 3L), 2, 2)
      .as[Multimodal.PixelImage].head()
    assert(bad.width == 0 && bad.pixels.isEmpty)

    // resized output feeds featurize unchanged: solid red 2x2 histogram
    val prof2 = Multimodal.byteFeatures(
      Multimodal.resizePixels(decoded.where(col("doc_id") === 2L), 2, 2), "pixels")
      .select(posexplode(col("features")).as(Seq("bin", "share")))
      .as[(Int, Double)].collect().toMap
    assert(math.abs(prof2(0) - 2.0 / 3) < 1e-9 && math.abs(prof2(15) - 1.0 / 3) < 1e-9)
  }

  test("perceptual-hash dedup: near-identical PNGs pair, distinct ones do not") {
    def png(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // base: left half dark, right half bright (32x32; the 8x8 resize
    // samples pixels at (4x, 4y))
    val base = png(32, 32)((x, _) => if (x < 16) 0x101010 else 0xf0f0f0)
    // near-dup: flip two SAMPLED pixels — at most 2 aHash bits move
    val near = png(32, 32) { (x, y) =>
      if ((x, y) == (0, 0) || (x, y) == (4, 4)) 0xf0f0f0
      else if (x < 16) 0x101010 else 0xf0f0f0
    }
    // same scene at double resolution: scale invariance, 0 bits move
    val scaled = png(64, 64)((x, _) => if (x < 32) 0x101010 else 0xf0f0f0)
    // distinct: checkerboard at the sampling grid — far in Hamming
    val other = png(32, 32)((x, y) =>
      if (((x / 4) + (y / 4)) % 2 == 0) 0x101010 else 0xf0f0f0)
    val d = Seq((1L, base), (2L, near), (3L, scaled), (4L, other),
      (5L, "junk bytes".getBytes)).toDF("doc_id", "payload")

    val hashes = Multimodal.aHashFrame(
      Multimodal.decodePixels(d, "doc_id", "payload")())
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(5L) == 0L, "a failed decode must hash to 0")
    assert(hs(1L) == hs(3L), "aHash must be resize-invariant for the same scene")

    val pairs = Multimodal.imageNearDups(hashes).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2).toLong)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) <= 3,
      s"perturbed twin not found: $pairs")
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) == 0)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L },
      s"the checkerboard paired with something: $pairs")
    assert(!pairs.keySet.exists { case (a, b) => a == 5L || b == 5L },
      "a degraded row leaked into the pair set")
  }

  test("pHash pairs a gamma-shifted twin that aHash misses") {
    def png(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = px(x, y); img.setRGB(x, y, v << 16 | v << 8 | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // a realistic aHash failure mode: low-contrast texture + one bright
    // blob. Gamma compression rescales the blob against the background,
    // dragging the global MEAN across much of the texture — aHash bits
    // flip wholesale — while the DCT low-frequency structure (what
    // pHash quantizes) barely reorders against its own median.
    val amps = Seq(
      (10.7153, 0.4307, 0.3660, 5.4830), (13.6691, 0.8901, 0.7531, 2.3013),
      (15.9744, 0.7764, 0.9812, 3.9695), (17.5895, 0.6394, 0.3550, 0.8990))
    def scene(x: Int, y: Int): Int = {
      val v = 105.0 + amps.map { case (a, wx, wy, ph) =>
        a * math.sin(wx * x + ph) * math.cos(wy * y + ph) }.sum
      val lit = (x - 27) * (x - 27) + (y - 14) * (y - 14) < 25
      math.max(0, math.min(255, if (lit) 250 else v.toInt))
    }
    def gammaShift(v: Int): Int =
      math.min(255, (255.0 * math.pow(v / 255.0, 0.5)).toInt)
    val base = png(32, 32)(scene)
    val shifted = png(32, 32)((x, y) => gammaShift(scene(x, y)))
    val checker = png(32, 32)((x, y) =>
      if (((x / 4) + (y / 4)) % 2 == 0) 0x10 else 0xf0)
    val d = Seq((1L, base), (2L, shifted), (3L, checker), (4L, "junk".getBytes))
      .toDF("doc_id", "payload")
    val decoded = Multimodal.decodePixels(d, "doc_id", "payload")()

    // aHash misses the twin (the gap pHash exists to close)
    val aPairs = Multimodal.imageNearDups(Multimodal.aHashFrame(decoded))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!aPairs.contains((1L, 2L)),
      s"expected aHash to miss the gamma twin (the pHash motivation): $aPairs")

    // pHash pairs it, keeps the checkerboard unpaired, drops the junk row
    val ph = Multimodal.pHashFrame(decoded)
    val hs = ph.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(4L) == 0L, "a failed decode must pHash to 0")
    val pPairs = Multimodal.imageNearDups(ph, hashCol = "phash")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pPairs.contains((1L, 2L)) && pPairs((1L, 2L)) <= 3,
      s"gamma twin must pair under pHash: $pPairs")
    assert(!pPairs.keySet.exists { case (a, b) => a == 3L || b == 3L },
      s"the checkerboard paired under pHash: $pPairs")
    assert(!pPairs.keySet.exists { case (a, b) => a == 4L || b == 4L },
      "a degraded row leaked into the pHash pair set")

    // scale invariance: the same scene at 2x resolution hashes identically
    // (nearest-neighbor 64->32 picks exactly the original pixels)
    val scaled = png(64, 64)((x, y) => scene(x / 2, y / 2))
    val hs2 = Multimodal.pHashFrame(Multimodal.decodePixels(
        Seq((10L, base), (11L, scaled)).toDF("doc_id", "payload"),
        "doc_id", "payload")())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs2(10L) == hs2(11L), "pHash must be resize-invariant for the same scene")
  }
}
