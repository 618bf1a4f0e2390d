package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.util.Base64
import javax.imageio.ImageIO

import graft.operators.Multimodal

/** Container-header decode: REAL dimensions out of real PNG / JPEG / GIF
  * bytes (r6 verdict #2), stub fallback pinned for opaque payloads.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def encoded(fmt: String, w: Int, h: Int): Array[Byte] = {
    // a JDK-encoder-produced file, not a hand-built byte sketch: ImageIO
    // ships PNG/JPEG/GIF writers in the bare JRE
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x336699)
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"no $fmt writer in this JRE")
    bos.toByteArray
  }

  test("decodeHeader: real PNG byte literal (encoder-produced 1x1) decodes to its true size") {
    val png1x1 = Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    assert(Multimodal.decodeHeader(png1x1) === Some(("png", 1, 1)))
  }

  test("decodeHeader: ImageIO-encoded PNG / JPEG / GIF round-trip to true dimensions") {
    assert(Multimodal.decodeHeader(encoded("png", 7, 5)) === Some(("png", 7, 5)))
    // JPEG exercises the marker scan: APP0 + DQT + DHT segments sit before SOF0
    assert(Multimodal.decodeHeader(encoded("jpg", 320, 240)) === Some(("jpeg", 320, 240)))
    assert(Multimodal.decodeHeader(encoded("gif", 9, 4)) === Some(("gif", 9, 4)))
  }

  test("decodeHeader: ImageIO round-trips true dimensions across a sweep of sizes") {
    Seq((1, 1), (2, 7), (123, 457), (640, 480), (1920, 1080)).foreach { case (w, h) =>
      assert(Multimodal.decodeHeader(encoded("png", w, h)) === Some(("png", w, h)))
      assert(Multimodal.decodeHeader(encoded("jpg", w, h)) === Some(("jpeg", w, h)))
    }
  }

  test("decodeHeader: WebP VP8X canvas and VP8 lossy frame headers (hand-built per spec)") {
    def le24(v: Int) = Array[Byte]((v & 255).toByte, ((v >> 8) & 255).toByte, ((v >> 16) & 255).toByte)
    def vp8x(w: Int, h: Int): Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ Array[Byte](22, 0, 0, 0) ++
        "WEBP".getBytes("US-ASCII") ++ "VP8X".getBytes("US-ASCII") ++
        Array[Byte](10, 0, 0, 0) ++ // chunk size
        Array[Byte](0, 0, 0, 0) ++ // flags + reserved
        le24(w - 1) ++ le24(h - 1)
    assert(Multimodal.decodeHeader(vp8x(550, 368)) === Some(("webp", 550, 368)))
    assert(Multimodal.decodeHeader(vp8x(16384, 1)) === Some(("webp", 16384, 1)))
    def vp8(w: Int, h: Int): Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ Array[Byte](22, 0, 0, 0) ++
        "WEBP".getBytes("US-ASCII") ++ "VP8 ".getBytes("US-ASCII") ++
        Array[Byte](10, 0, 0, 0) ++
        Array[Byte](0, 0, 0) ++ // frame tag
        Array[Byte](0x9D.toByte, 0x01, 0x2A) ++ // sync code
        Array[Byte]((w & 255).toByte, ((w >> 8) & 0x3F).toByte,
          (h & 255).toByte, ((h >> 8) & 0x3F).toByte)
    assert(Multimodal.decodeHeader(vp8(320, 240)) === Some(("webp", 320, 240)))
    // corrupt sync code → None, stub path
    val bad = vp8(320, 240); bad(23) = 0x00
    assert(Multimodal.decodeHeader(bad) === None)
  }

  test("pixelStats: hand-built 2x1 image yields exact channel means and luma extrema") {
    val img = new BufferedImage(2, 1, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, (10 << 16) | (20 << 8) | 30)   // luma 17.15
    img.setRGB(1, 0, (200 << 16) | (100 << 8) | 50) // luma 124.2
    val s = Multimodal.pixelStats(img)
    assert(s(0) === 105.0 && s(1) === 60.0 && s(2) === 40.0) // channel means
    assert(s(3) === (0.299 * 210 + 0.587 * 120 + 0.114 * 80) / 2.0)
    assert(s(4) === 0.299 * 10 + 0.587 * 20 + 0.114 * 30)
    assert(s(5) === 0.299 * 200 + 0.587 * 100 + 0.114 * 50)
    assert(s(6) === 1.0)                            // both lumas < 128
    assert(s(7) === 2.0)                            // aspect 2:1
  }

  test("decode: real PNG payload yields REAL pixel statistics, not byte arithmetic") {
    // uniform-color image → channel means ARE the color; byte-fold could
    // never produce these from the compressed container bytes
    val img = new BufferedImage(6, 3, BufferedImage.TYPE_INT_RGB)
    (0 until 3).foreach(y => (0 until 6).foreach(x => img.setRGB(x, y, 0x336699)))
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", bos))
    val (fmt, w, h, feat) = Multimodal.decode(bos.toByteArray)
    assert(fmt === "png" && w === 6 && h === 3)
    assert(feat(0) === 0x33.toDouble && feat(1) === 0x66.toDouble && feat(2) === 0x99.toDouble)
    assert(feat(7) === 2.0)
  }

  /** LSB-first bit packer — the WebP lossless bitstream's bit order. */
  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0; private var nBits = 0
    def put(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nBits
        nBits += 1
        if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
        i += 1
      }
    }
    def bytes: Array[Byte] = {
      val tail = if (nBits > 0) Array(cur.toByte) else Array.empty[Byte]
      buf.toArray ++ tail
    }
  }

  private def le32(v: Int) = Array.tabulate(4)(i => ((v >> (8 * i)) & 255).toByte)

  /** COMPLETE spec-valid WebP lossless (VP8L) file for a solid-ARGB w×h
    * image, assembled per the public bitstream layout: no transforms, no
    * color cache, no meta-huffman, then five simple huffman codes — G, R,
    * B, A as 1-symbol 8-bit codes and distance as a 1-symbol 1-bit code.
    * One-symbol codes cost zero bits per pixel, so the pixel section is
    * empty and any compliant decoder renders the solid color.
    */
  private def vp8lSolid(w: Int, h: Int, a: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val bw = new BitWriter
    bw.put(0, 1) // no transforms
    bw.put(0, 1) // no color cache
    bw.put(0, 1) // no meta-huffman
    Seq(g, r, b, a).foreach { sym => // alphabet order: green, red, blue, alpha
      bw.put(1, 1); bw.put(0, 1); bw.put(1, 1); bw.put(sym, 8)
    }
    bw.put(1, 1); bw.put(0, 1); bw.put(0, 1); bw.put(0, 1) // distance: symbol 0
    val dims = (w - 1) | ((h - 1) << 14) // then 1-bit alpha hint + 3-bit version, all 0
    val payload = Array[Byte](0x2F) ++ le32(dims) ++ bw.bytes
    val padded = payload ++ (if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    "RIFF".getBytes("US-ASCII") ++ le32(4 + 8 + padded.length) ++
      "WEBP".getBytes("US-ASCII") ++ "VP8L".getBytes("US-ASCII") ++
      le32(payload.length) ++ padded
  }

  test("realFeature: a complete spec-valid VP8L file (decodable image, not a bare header) " +
      "yields the pinned NULL feature — the JRE ships no WebP codec") {
    // r8 verdict #2a: the null-feature contract must be a TESTED promise on
    // a real WebP FILE, not an accident of a truncated fixture. A compliant
    // decoder renders this file as 4x4 solid #336699; the JRE cannot, and
    // the honest answer is null — never byte-fold arithmetic.
    val file = vp8lSolid(4, 4, 0xFF, 0x33, 0x66, 0x99)
    assert(Multimodal.decodeHeader(file) === Some(("webp", 4, 4)))
    assert(Multimodal.realFeature(file) === null)
    val (fmt, w, h, feat) = Multimodal.decode(file)
    assert(fmt === "webp" && w === 4 && h === 4 && feat === null)
  }

  test("decode: real container without a JRE codec (WebP) yields a NULL feature, never fabricated") {
    def le24(v: Int) = Array[Byte]((v & 255).toByte, ((v >> 8) & 255).toByte, ((v >> 16) & 255).toByte)
    val webp = "RIFF".getBytes("US-ASCII") ++ Array[Byte](22, 0, 0, 0) ++
      "WEBP".getBytes("US-ASCII") ++ "VP8X".getBytes("US-ASCII") ++
      Array[Byte](10, 0, 0, 0) ++ Array[Byte](0, 0, 0, 0) ++ le24(549) ++ le24(367)
    val (fmt, w, h, feat) = Multimodal.decode(webp)
    assert(fmt === "webp" && w === 550 && h === 368 && feat === null)
    // truncated PNG past its header: header decodes, pixels can't → null
    val full = encoded("png", 16, 16)
    val truncated = full.take(40)
    assert(Multimodal.decodeHeader(truncated) === Some(("png", 16, 16)))
    assert(Multimodal.decode(truncated)._4 === null)
  }

  test("syntheticPng round-trips its generating formula through encode → ImageIO decode") {
    Seq(0L, 7L, 123L).foreach { d =>
      val (fmt, w, h, feat) = Multimodal.decode(Multimodal.syntheticPng(d))
      assert(fmt === "png" && w === 8 + (d % 9).toInt && h === 8 + ((d * 3) % 9).toInt)
      // recompute channel sums straight from the formula
      var sr = 0L; var sg = 0L; var sb = 0L
      (0 until h).foreach(y => (0 until w).foreach { x =>
        sr += (31L * x + 17L * y + d) % 256
        sg += (7L * x + 13L * y + 2L * d) % 256
        sb += (3L * x + 29L * y + 5L * d) % 256
      })
      val n = (w * h).toDouble
      assert(feat(0) === sr / n && feat(1) === sg / n && feat(2) === sb / n)
      assert(feat(3) === (0.299 * sr + 0.587 * sg + 0.114 * sb) / n)
    }
  }

  test("decodeHeader: opaque bytes fall through to None and decode() keeps stub arithmetic") {
    val text = "not an image at all".getBytes("UTF-8")
    assert(Multimodal.decodeHeader(text) === None)
    val (fmt, w, h, feat) = Multimodal.decode(text)
    val n = text.length
    assert(w === 64 + n % 512 && h === 64 + (n * 7) % 512)
    assert(Seq("jpeg", "png", "webp").contains(fmt) && feat.length === 8)
    // truncated signatures must not crash or match
    assert(Multimodal.decodeHeader(Array[Byte](0x89.toByte, 'P', 'N')) === None)
    assert(Multimodal.decodeHeader(Array[Byte](0xFF.toByte, 0xD8.toByte)) === None)
    assert(Multimodal.decodeHeader(Array.empty[Byte]) === None)
  }

  test("decodeMeta: real payloads get real dimensions, synthetic ones keep the stub path") {
    val rows = Seq(
      (1L, encoded("png", 33, 17)),
      (2L, encoded("jpg", 40, 30)),
      (3L, "plain synthetic text".getBytes("UTF-8")))
    val df = rows.toDF("doc_id", "payload")
    val out = Multimodal.decodeMeta(spark, df, "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.getInt(3), r.getInt(4)))).toMap
    assert(out(1L) === (("png", 33, 17)))
    assert(out(2L) === (("jpeg", 40, 30)))
    val n = "plain synthetic text".getBytes("UTF-8").length
    assert(out(3L)._2 === 64 + n % 512 && out(3L)._3 === 64 + (n * 7) % 512)
  }

  /** The oracle's independent dHash recomputation from the synthetic-PNG
    * generating formula — no BufferedImage anywhere. */
  private def formulaDHash(docId: Long): (Long, Long) = {
    val w = 8 + (docId % 9); val h = 8 + ((docId * 3) % 9)
    def lum(gx: Long, gy: Long): Long = {
      val x = ((2 * gx + 1) * w) / 18; val y = ((2 * gy + 1) * h) / 16
      299 * ((31 * x + 17 * y + docId) % 256) +
        587 * ((7 * x + 13 * y + 2 * docId) % 256) +
        114 * ((3 * x + 29 * y + 5 * docId) % 256)
    }
    var hi = 0L; var lo = 0L
    for (i <- 0 until 64) {
      val bit = if (lum(i % 8 + 1, i / 8) > lum(i % 8, i / 8)) 1L else 0L
      if (i < 32) lo |= bit << i else hi |= bit << (i - 32)
    }
    (hi, lo)
  }

  test("dHash: decoded-raster hash equals the formula recomputation, bit for bit") {
    for (id <- Seq(0L, 1L, 7L, 13L, 100L, 12345L)) {
      val img = ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.syntheticPng(id)))
      assert(Multimodal.dHash(img) === formulaDHash(id), s"doc $id")
    }
  }

  test("phashNearDupPairs: pigeonhole candidates, popcount verify, nulls never pair") {
    import spark.implicits._
    // A=0, B flips 1 bit, C flips 3 bits (ham A-C=3, B-C=2); D flips a
    // whole 16-bit chunk (ham 16 — candidate via the other chunks, must be
    // verified away); E is undecodable (null hash) and must never pair
    val hashed = Seq(
      (1L, Some(0L), Some(0L)), (2L, Some(0L), Some(1L)),
      (3L, Some(0L), Some(11L)), (4L, Some(0xFFFFL), Some(0L)),
      (5L, None: Option[Long], None: Option[Long]))
      .toDF("doc_id", "phash_hi", "phash_lo")
    val out = Multimodal.phashNearDupPairs(hashed)
      .orderBy($"doc_id_a", $"doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq === Seq((1L, 2L, 1), (1L, 3L, 3), (2L, 3L, 2)))
  }

  test("phashMeta: real payloads hash, undecodable payloads get honest nulls") {
    val rows = Seq(
      (5L, Multimodal.syntheticPng(5L)),
      (6L, "not an image at all".getBytes("UTF-8")))
    val df = spark.createDataFrame(rows).toDF("doc_id", "payload")
    val out = Multimodal.phashMeta(spark, df, "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    val (hi, lo) = formulaDHash(5L)
    assert(out(5L).getLong(3) === hi && out(5L).getLong(4) === lo)
    assert(out(5L).getInt(1) === 13 && out(5L).getInt(2) === 14) // 8+5%9, 8+15%9
    assert(out(6L).isNullAt(1) && out(6L).isNullAt(3) && out(6L).isNullAt(4))
  }

  test("frameStats: every GIF frame decodes to its formula sums; opaque payloads get one null row") {
    val rows = Seq(
      (7L, Multimodal.syntheticGif(7L)),   // 2 + 7%3 = 3 frames, 10x9
      (11L, Multimodal.syntheticGif(11L)), // 2 + 11%3 = 4 frames, 9x13
      (8L, "definitely not a container".getBytes("UTF-8")))
    val df = spark.createDataFrame(rows).toDF("doc_id", "payload")
    val out = Multimodal.frameStats(spark, df, "doc_id")
      .orderBy($"doc_id", $"frame_idx").collect()
    // reference sums straight from the generating formula
    def ref(d: Long, f: Int): (Long, Long, Long) = {
      val w = 8 + (d % 5).toInt; val h = 8 + ((d * 3) % 5).toInt
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val i = ((31L * x + 17L * y + 53L * f + d) % 256).toInt
        sr += (7 * i) % 256; sg += (13 * i + 5) % 256; sb += (29 * i + 11) % 256
      }
      (sr, sg, sb)
    }
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc(7L).length === 3 && byDoc(11L).length === 4)
    for (r <- byDoc(7L) ++ byDoc(11L)) {
      val (sr, sg, sb) = ref(r.getLong(0), r.getInt(2))
      assert((r.getLong(5), r.getLong(6), r.getLong(7)) === ((sr, sg, sb)),
        s"frame ${r.getInt(2)} of doc ${r.getLong(0)}")
    }
    assert(byDoc(8L).length === 1 && byDoc(8L)(0).isNullAt(1) && byDoc(8L)(0).isNullAt(5))
  }

  test("wavStats: PCM decode equals the generator's closed form, both channel counts") {
    import spark.implicits._
    // 14 → mono, 7 → stereo (1 + id % 2)
    val ids = Seq(7L, 14L, 21L, 28L)
    val payloads = Multimodal.withSyntheticWavs(
      spark, ids.toDF("doc_id"), "doc_id")
    val out = Multimodal.wavStats(spark, payloads, "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- ids) {
      val n = 64 + (id % 64).toInt; val ch = 1 + (id % 2).toInt
      val samples = (0 until n).map(i =>
        (((id * 31 + i * 7) % 65536) - 32768).toInt)
      val r = out(id)
      assert(r.getInt(1) === 8000 + ((id % 4) * 4000).toInt)
      assert(r.getInt(2) === ch && r.getInt(3) === 16)
      assert(r.getLong(4) === n.toLong)
      assert(r.getLong(5) === samples.map(_.toLong).sum)
      assert(r.getInt(6) === samples.min && r.getInt(7) === samples.max)
      if (ch == 2)
        assert(r.getLong(8) === (0 until n).map(i =>
          (((id * 31 + i * 7 + 13) % 65536) - 32768).toLong).sum)
      else assert(r.isNullAt(8))
    }
  }

  test("wavStats: chunk walking skips extra chunks and honors odd-size padding") {
    import spark.implicits._
    // hand-build: RIFF [LIST(3 bytes, padded)] [fmt] [data 2 frames mono]
    val bb = java.nio.ByteBuffer.allocate(200)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(0).put("WAVE".getBytes)
    bb.put("LIST".getBytes).putInt(3).put(Array[Byte](1, 2, 3, 0)) // pad
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(44100).putInt(88200).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(4).putShort(1000).putShort(-2000)
    val wav = java.util.Arrays.copyOf(bb.array(), bb.position())
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, wav),
        org.apache.spark.sql.Row(2L, "not audio at all".getBytes),
        org.apache.spark.sql.Row(3L, wav.take(20)))), // truncated mid-chunk
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType))))
    val out = Multimodal.wavStats(spark, df, "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) === 44100 && out(1L).getLong(4) === 2L)
    assert(out(1L).getLong(5) === -1000L) // 1000 + (-2000)
    assert(out(1L).getInt(6) === -2000 && out(1L).getInt(7) === 1000)
    assert(out(1L).isNullAt(8))
    assert(out(2L).isNullAt(1) && out(3L).isNullAt(1)) // honest nulls
  }

  test("wavWindows: windowed energy/zero-cross/peak equal the closed form; partial last window") {
    import spark.implicits._
    val ids = Seq(3L, 10L, 17L, 31L) // 64+id%64 frames: 67, 74, 81, 95
    val payloads = Multimodal.withSyntheticWavs(spark, ids.toDF("doc_id"), "doc_id")
    val out = Multimodal.wavWindows(spark, payloads, "doc_id", winLen = 32)
      .orderBy($"doc_id", $"win_idx").collect()
    val byDoc = out.groupBy(_.getLong(0))
    for (id <- ids) {
      val n = 64 + (id % 64).toInt
      val v = (0 until n).map(i => (((id * 31 + i * 7) % 65536) - 32768).toInt)
      val wins = v.grouped(32).toSeq
      val rows = byDoc(id)
      assert(rows.length === wins.length)
      for ((w, k) <- wins.zipWithIndex) {
        val r = rows(k)
        assert(r.getInt(1) === k && r.getInt(2) === w.length)
        assert(r.getLong(3) === w.map(x => x.toLong * x).sum)
        assert(r.getInt(4) === w.sliding(2).count(p =>
          p.length == 2 && ((p(0) < 0) != (p(1) < 0))))
        assert(r.getInt(5) === w.map(math.abs).max)
      }
    }
    // honest null row on a non-WAV payload
    val junk = spark.createDataFrame(Seq((5L, "nope".getBytes))).toDF("doc_id", "payload")
    val nr = Multimodal.wavWindows(spark, junk, "doc_id").collect()
    assert(nr.length === 1 && nr(0).isNullAt(1) && nr(0).isNullAt(3))
  }

  test("aviFrameSample: demux counts ALL frames, decodes only the strided ones, exact sums") {
    val rows = Seq(
      (13L, Multimodal.syntheticAvi(13L)), // 4 + 13%5 = 7 frames, 11x12
      (15L, Multimodal.syntheticAvi(15L)), // 4 + 15%5 = 4 frames, 8x13
      (9L, "not a riff container".getBytes("UTF-8")))
    val df = spark.createDataFrame(rows).toDF("doc_id", "payload")
    val out = Multimodal.aviFrameSample(spark, df, "doc_id", stride = 2)
      .orderBy($"doc_id", $"frame_idx").collect()
    def ref(d: Long, f: Int): (Long, Long, Long) = {
      val w = 8 + (d % 5).toInt; val h = 8 + ((d * 3) % 5).toInt
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val i = ((31L * x + 17L * y + 53L * f + d) % 256).toInt
        sr += (7 * i) % 256; sg += (13 * i + 5) % 256; sb += (29 * i + 11) % 256
      }
      (sr, sg, sb)
    }
    val byDoc = out.groupBy(_.getLong(0))
    // stride-2 over 7 frames -> idx 0,2,4,6; over 4 frames -> idx 0,2
    assert(byDoc(13L).map(_.getInt(2)).toSeq === Seq(0, 2, 4, 6))
    assert(byDoc(15L).map(_.getInt(2)).toSeq === Seq(0, 2))
    assert(byDoc(13L).forall(_.getInt(1) === 7)) // n_frames = TRUE demux count
    assert(byDoc(15L).forall(_.getInt(1) === 4))
    for (r <- byDoc(13L) ++ byDoc(15L)) {
      val (sr, sg, sb) = ref(r.getLong(0), r.getInt(2))
      assert((r.getLong(5), r.getLong(6), r.getLong(7)) === ((sr, sg, sb)),
        s"frame ${r.getInt(2)} of doc ${r.getLong(0)}")
      assert(r.getInt(3) === 8 + (r.getLong(0) % 5).toInt)
      assert(r.getInt(4) === 8 + ((r.getLong(0) * 3) % 5).toInt)
    }
    assert(byDoc(9L).length === 1 && byDoc(9L)(0).isNullAt(1) && byDoc(9L)(0).isNullAt(5))
    // stride 1 degenerates to the full frameStats contract: every frame
    val all = Multimodal.aviFrameSample(spark, df.filter($"doc_id" === 13L),
      "doc_id", stride = 1).collect()
    assert(all.map(_.getInt(2)).sorted.toSeq === (0 until 7).toSeq)
  }

  test("aviFrameSample: walker survives a foreign LIST, odd-size chunks, and a truncated movi") {
    // graft a junk odd-size chunk + foreign LIST ahead of the real AVI body
    val real = Multimodal.syntheticAvi(26L) // 4 + 26%5 = 5 frames
    def le32(v: Int) = Array((v & 255).toByte, ((v >> 8) & 255).toByte,
      ((v >> 16) & 255).toByte, ((v >> 24) & 255).toByte)
    val junk = "JUNK".getBytes ++ le32(3) ++ Array[Byte](9, 9, 9, 0) // padded
    val foreign = "LIST".getBytes ++ le32(7) ++ "INFOxyz".getBytes ++ Array[Byte](0)
    val innerOld = java.util.Arrays.copyOfRange(real, 12, real.length)
    val inner = junk ++ foreign ++ innerOld
    val grafted = "RIFF".getBytes ++ le32(inner.length + 4) ++ "AVI ".getBytes ++ inner
    val truncated = java.util.Arrays.copyOf(real, real.length / 2)
    val df = spark.createDataFrame(Seq(
      (26L, grafted), (27L, truncated))).toDF("doc_id", "payload")
    val out = Multimodal.aviFrameSample(spark, df, "doc_id", stride = 2)
      .orderBy($"doc_id", $"frame_idx").collect()
    val byDoc = out.groupBy(_.getLong(0))
    // grafted junk must not disturb the demux: 5 frames, sampled 0,2,4
    assert(byDoc(26L).map(_.getInt(2)).toSeq === Seq(0, 2, 4))
    assert(byDoc(26L).forall(_.getInt(1) === 5))
    // truncation mid-movi: fewer complete frames or the honest null row,
    // never a crash or a fabricated full count
    assert(byDoc(27L).forall(r => r.isNullAt(1) || r.getInt(1) < 5))
  }

  test("corrupt chunk sizes terminate the RIFF walks (no infinite loop) and yield the honest null row") {
    // a size like 0xFFFFFFF8 reads as -8 via u32(...).toInt, so the naive
    // `off += 8 + sz + (sz & 1)` step is ZERO — the try/catch honest-null
    // contract cannot catch a non-terminating loop, so the walkers must
    // detect a non-advancing next offset and abort. These payloads hang
    // forever without that guard.
    def le32(v: Int) = Array((v & 255).toByte, ((v >> 8) & 255).toByte,
      ((v >> 16) & 255).toByte, ((v >> 24) & 255).toByte)
    // WAV: corrupt-size chunk ahead of fmt/data -> walk aborts -> null row
    val badWav = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ le32(0xFFFFFFF8) ++ Array.fill[Byte](40)(7)
    val wavDf = spark.createDataFrame(Seq((1L, badWav))).toDF("doc_id", "payload")
    val ws = Multimodal.wavStats(spark, wavDf, "doc_id").collect()
    assert(ws.length === 1 && ws(0).isNullAt(1))
    val ww = Multimodal.wavWindows(spark, wavDf, "doc_id").collect()
    assert(ww.length === 1 && ww(0).isNullAt(1))
    // AVI outer walk: corrupt top-level chunk size -> abort -> null row
    val badAviOuter = "RIFF".getBytes ++ le32(100) ++ "AVI ".getBytes ++
      "JUNK".getBytes ++ le32(0xFFFFFFF0) ++ Array.fill[Byte](40)(7)
    // AVI inner walk: corrupt ##dc size INSIDE a real movi list — the walk
    // must abort the movi scan, keeping any frames demuxed before it
    val real = Multimodal.syntheticAvi(28L)
    val corruptInner = real.clone()
    val moviAt = (12 until real.length - 12).find(o =>
      new String(real, o, 4, "US-ASCII") == "LIST" &&
        new String(real, o + 8, 4, "US-ASCII") == "movi").get
    // first chunk header sits at moviAt+12; poison its size field
    System.arraycopy(le32(0xFFFFFFF8), 0, corruptInner, moviAt + 16, 4)
    val df = spark.createDataFrame(Seq(
      (2L, badAviOuter), (3L, corruptInner))).toDF("doc_id", "payload")
    val out = Multimodal.aviFrameSample(spark, df, "doc_id", stride = 1)
      .collect().groupBy(_.getLong(0))
    assert(out(2L).length === 1 && out(2L)(0).isNullAt(1))
    // inner corruption at the FIRST chunk leaves zero demuxed frames
    assert(out(3L).forall(r => r.isNullAt(1) || r.getInt(1) < 4))
  }
}
