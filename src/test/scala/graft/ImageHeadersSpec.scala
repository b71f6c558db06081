package graft

import graft.media.{ImageHeaders, MediaGen}
import org.scalatest.funsuite.AnyFunSuite

class ImageHeadersSpec extends AnyFunSuite {

  test("round-trip: every generator's dims decode back exactly") {
    val cases = Seq(
      ("png", MediaGen.png(640, 480), 640, 480),
      ("jpeg", MediaGen.jpeg(1024, 768), 1024, 768),
      ("gif", MediaGen.gif(320, 200), 320, 200),
      ("bmp", MediaGen.bmp(800, 600), 800, 600),
      ("tiff", MediaGen.tiff(2048, 1536), 2048, 1536))
    cases.foreach { case (fmt, bytes, w, h) =>
      assert(ImageHeaders.decode(bytes) == Some(ImageHeaders.Dims(fmt, w, h)), fmt)
    }
  }

  test("extreme and 1-pixel dimensions") {
    assert(ImageHeaders.decode(MediaGen.png(1, 1)) == Some(ImageHeaders.Dims("png", 1, 1)))
    assert(ImageHeaders.decode(MediaGen.jpeg(65535, 1)) == Some(ImageHeaders.Dims("jpeg", 65535, 1)))
    assert(ImageHeaders.decode(MediaGen.gif(65535, 65535)) == Some(ImageHeaders.Dims("gif", 65535, 65535)))
    assert(ImageHeaders.decode(MediaGen.bmp(1 << 20, 3)) == Some(ImageHeaders.Dims("bmp", 1 << 20, 3)))
  }

  test("bmp: negative (top-down) height is reported as absolute") {
    val b = MediaGen.bmp(100, 50)
    // Negate the i32 height at offset 22 (little-endian two's complement).
    val neg = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-50).array()
    System.arraycopy(neg, 0, b, 22, 4)
    assert(ImageHeaders.decode(b) == Some(ImageHeaders.Dims("bmp", 100, 50)))
  }

  test("jpeg: SOF found after multiple non-SOF segments; none → None") {
    val withSegments = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0xff, 0xd8).map(_.toByte))
      // Two COM segments before the SOF-carrying remainder.
      (1 to 2).foreach { _ =>
        out.write(Array(0xff, 0xfe).map(_.toByte))
        out.write(Array[Byte](0, 6, 'a', 'b', 'c', 'd'))
      }
      val full = MediaGen.jpeg(300, 222)
      out.write(full, 2, full.length - 2) // skip the SOI, keep APP0+SOF
      out.toByteArray
    }
    assert(ImageHeaders.decode(withSegments) == Some(ImageHeaders.Dims("jpeg", 300, 222)))
    // SOS before SOF → None (dims unreadable without full scan).
    val sosFirst = Array(0xff, 0xd8, 0xff, 0xda, 0, 4, 1, 2).map(_.toByte)
    assert(ImageHeaders.decode(sosFirst).isEmpty)
  }

  test("adversarial inputs never throw, return None") {
    val bad = Seq(
      Array.emptyByteArray,
      Array[Byte](0x89.toByte, 'P', 'N'),                  // truncated sig
      MediaGen.png(10, 10).take(20),                       // truncated IHDR
      MediaGen.jpeg(10, 10).take(3),
      MediaGen.gif(10, 10).take(7),
      MediaGen.bmp(10, 10).take(17),
      MediaGen.tiff(10, 10).take(9),
      "GIF89a".getBytes("US-ASCII"),                       // header only
      Array.fill[Byte](64)(0x7f),
      "%PDF-1.4".getBytes("US-ASCII"),
      "<html><body>x</body></html>".getBytes("UTF-8"))
    bad.foreach(b => assert(ImageHeaders.decode(b).isEmpty))
    // Zero dims rejected.
    assert(ImageHeaders.decode(MediaGen.png(0, 5)).isEmpty)
    assert(ImageHeaders.decode(MediaGen.gif(0, 0)).isEmpty)
    // Seeded fuzz: random byte soup.
    val rnd = new scala.util.Random(0xBEEF)
    (1 to 500).foreach { _ =>
      val b = Array.fill[Byte](rnd.nextInt(80))(rnd.nextInt().toByte)
      ImageHeaders.decode(b) // must not throw
    }
  }

  test("x46 kernel: image rows carry true header dimensions") {
    val (fmt, bytes) = MediaGen.imageFor(0L)
    val meta = graft.queries.PipelineOps.decodeMedia("u", bytes)
    assert(meta.magic == fmt && meta.media_kind == "image")
    assert(meta.width >= 16 && meta.height >= 16)
    val doc = graft.queries.PipelineOps.decodeMedia("u", "%PDF-1.4 x".getBytes("ISO-8859-1"))
    assert(doc.magic == "pdf" && doc.media_kind == "document" && doc.width == 0)
  }
}
