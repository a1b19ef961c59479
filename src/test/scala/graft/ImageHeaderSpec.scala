package graft

import org.scalatest.funsuite.AnyFunSuite

/** Golden byte-vector tests for the round-14 image header parser
  * (operators/Multimodal.parseImageHeader): hand-built PNG and JFIF
  * headers with KNOWN dimensions, independent of synthImagePayload —
  * so the synth and the parse cannot share a compensating bug and the
  * q_image_dims oracle's closed forms rest on a parser verified
  * against the public container formats themselves.
  */
class ImageHeaderSpec extends AnyFunSuite {

  import operators.Multimodal.{parseImageHeader, synthImagePayload}

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // hand-assembled 1x1 PNG IHDR (the spec's canonical smallest image):
  // signature, len=13, "IHDR", w=1, h=1, depth 8, color 6, 0,0,0, crc
  private val png1x1 = b(
    0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
    0x00, 0x00, 0x00, 0x0D, 0x49, 0x48, 0x44, 0x52,
    0x00, 0x00, 0x00, 0x01, 0x00, 0x00, 0x00, 0x01,
    0x08, 0x06, 0x00, 0x00, 0x00, 0x1F, 0x15, 0xC4, 0x89)

  test("PNG: 1x1 golden header parses to (png, 1, 1)") {
    assert(parseImageHeader(png1x1) == (("png", 1L, 1L)))
  }

  test("PNG: IHDR behind another chunk is still found by the walk") {
    // a (non-standard but walkable) 4-byte junk chunk before IHDR
    val junk = b(0x00, 0x00, 0x00, 0x04, 0x6A, 0x75, 0x6E, 0x6B,
      1, 2, 3, 4, 0, 0, 0, 0)
    val p = png1x1.take(8) ++ junk ++ png1x1.drop(8)
    assert(parseImageHeader(p) == (("png", 1L, 1L)))
  }

  test("JPEG: SOF0 found through APP0 + COM at a non-fixed offset") {
    // SOI, APP0 (len 16), COM (len 7: 5 comment bytes), SOF0 with
    // height 0x0140 = 320, width 0x01E0 = 480
    val p = b(0xFF, 0xD8,
      0xFF, 0xE0, 0x00, 0x10, 0x4A, 0x46, 0x49, 0x46, 0x00,
      0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
      0xFF, 0xFE, 0x00, 0x07, 0x68, 0x65, 0x6C, 0x6C, 0x6F,
      0xFF, 0xC0, 0x00, 0x11, 0x08, 0x01, 0x40, 0x01, 0xE0,
      0x03, 0x01, 0x11, 0x00, 0x02, 0x11, 0x00, 0x03, 0x11, 0x00)
    assert(parseImageHeader(p) == (("jpeg", 480L, 320L)))
  }

  test("JPEG: progressive SOF2 also carries the dims") {
    val p = b(0xFF, 0xD8,
      0xFF, 0xC2, 0x00, 0x11, 0x08, 0x00, 0x64, 0x00, 0xC8,
      0x03, 0x01, 0x11, 0x00, 0x02, 0x11, 0x00, 0x03, 0x11, 0x00)
    assert(parseImageHeader(p) == (("jpeg", 200L, 100L)))
  }

  test("JPEG: DHT (C4) is not mistaken for a frame header") {
    val p = b(0xFF, 0xD8,
      0xFF, 0xC4, 0x00, 0x05, 0x00, 0x01, 0x02, // DHT, skipped
      0xFF, 0xC0, 0x00, 0x11, 0x08, 0x00, 0x10, 0x00, 0x20,
      0x03, 0x01, 0x11, 0x00, 0x02, 0x11, 0x00, 0x03, 0x11, 0x00)
    assert(parseImageHeader(p) == (("jpeg", 32L, 16L)))
  }

  test("truncation and garbage hit the declared error paths") {
    assert(parseImageHeader(png1x1.take(3)) == (("unknown", -1L, -1L)))
    assert(parseImageHeader(png1x1.take(20)) == (("png", -1L, -1L)),
      "IHDR cut mid-dims -> recognized but unparseable")
    assert(parseImageHeader(b(0xFF, 0xD8, 0xFF, 0xC0, 0x00, 0x11, 0x08))
      == (("jpeg", -1L, -1L)), "SOF cut mid-dims")
    assert(parseImageHeader(b(0x00, 0x01, 0x02, 0x03))
      == (("unknown", -1L, -1L)))
    assert(parseImageHeader(Array.emptyByteArray)
      == (("unknown", -1L, -1L)))
  }

  test("synth -> parse roundtrip matches the oracle's closed forms " +
    "across the doc_id classes") {
    val text = "the quick brown fox jumps over the lazy dog padding".getBytes("UTF-8")
    Seq(0L, 2L, 4L, 13L, 26L, 1L, 3L, 7L, 9L, 15L, 39L, 100001L).foreach { id =>
      val p = synthImagePayload(id, text)
      val (fmt, w, h) = parseImageHeader(p)
      if (id % 13 == 0) {
        assert(p.length == 3 && fmt == "unknown" && w == -1L && h == -1L,
          s"corrupt class at $id")
      } else {
        assert(fmt == (if (id % 2 == 0) "png" else "jpeg"), s"fmt at $id")
        assert(w == 16 + id % 2048, s"width at $id")
        assert(h == 16 + (id * 7) % 2048, s"height at $id")
        val expectBytes =
          if (id % 2 == 0) 33 + math.min(text.length, 64)
          else 39 + (id % 17).toInt +
            (if (id % 3 == 0) 5 + (id % 5).toInt else 0) +
            math.min(text.length, 64)
        assert(p.length == expectBytes, s"n_bytes at $id")
      }
    }
  }
}
