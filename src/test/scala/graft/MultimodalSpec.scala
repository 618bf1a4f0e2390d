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
}
