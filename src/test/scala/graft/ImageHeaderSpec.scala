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

  test("GIF: golden 640x480 logical screen parses, both signatures") {
    // GIF89a, width 640 = 0x0280 LE, height 480 = 0x01E0 LE
    val p89 = "GIF89a".getBytes("US-ASCII") ++
      b(0x80, 0x02, 0xE0, 0x01, 0x00, 0x00, 0x00)
    assert(parseImageHeader(p89) == (("gif", 640L, 480L)))
    val p87 = "GIF87a".getBytes("US-ASCII") ++
      b(0x01, 0x00, 0xFF, 0xFF, 0x00, 0x00, 0x00)
    assert(parseImageHeader(p87) == (("gif", 1L, 65535L)))
  }

  test("WebP: VP8 sync-coded dims, VP8L bit-packed dims, VP8X u24 " +
    "canvas — all found through the RIFF chunk walk") {
    def riff(chunk: Array[Byte]): Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++
        b(chunk.length + 4, 0, 0, 0) ++ "WEBP".getBytes("US-ASCII") ++
        chunk
    // VP8 lossy: 550x368 (the RFC 6386 example geometry)
    val vp8 = riff("VP8 ".getBytes("US-ASCII") ++ b(10, 0, 0, 0) ++
      b(0x00, 0x00, 0x00, 0x9D, 0x01, 0x2A, 0x26, 0x02, 0x70, 0x01))
    assert(parseImageHeader(vp8) == (("webp", 550L, 368L)))
    // VP8L: w-1=0x0FF (w=256), h-1=0x03F (h=64):
    // bits = 0x0FF | 0x03F<<14 = 0x000FC0FF
    val vp8l = riff("VP8L".getBytes("US-ASCII") ++ b(5, 0, 0, 0) ++
      b(0x2F, 0xFF, 0xC0, 0x0F, 0x00))
    assert(parseImageHeader(vp8l) == (("webp", 256L, 64L)))
    // VP8X behind a junk chunk (odd size -> pad byte) proves the walk
    val vp8x = riff(
      "JUNK".getBytes("US-ASCII") ++ b(3, 0, 0, 0) ++ b(1, 2, 3, 0) ++
      "VP8X".getBytes("US-ASCII") ++ b(10, 0, 0, 0) ++
        b(0x00, 0x00, 0x00, 0x00, 0xFF, 0x01, 0x00, 0x2B, 0x01, 0x00))
    assert(parseImageHeader(vp8x) == (("webp", 512L, 300L)))
    // corrupted VP8 sync code -> recognized but unparseable
    val badSync = riff("VP8 ".getBytes("US-ASCII") ++ b(10, 0, 0, 0) ++
      b(0x00, 0x00, 0x00, 0x9D, 0x01, 0x2B, 0x26, 0x02, 0x70, 0x01))
    assert(parseImageHeader(badSync) == (("webp", -1L, -1L)))
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
    "across the doc_id classes (PNG/JPEG/GIF87a+89a/VP8+VP8L+VP8X + " +
    "corrupt)") {
    val text = "the quick brown fox jumps over the lazy dog padding".getBytes("UTF-8")
    val bodyLen = math.min(text.length, 64)
    Seq(0L, 4L, 8L, 13L, 26L, // png + corrupt
      1L, 5L, 9L, 21L, 33L, // jpeg (with/without COM, varied pad)
      2L, 6L, 10L, 30L, // gif (10, 30 -> GIF87a)
      3L, 7L, 11L, 15L, 19L, 23L, 100003L // webp, all three variants
    ).foreach { id =>
      val p = synthImagePayload(id, text)
      val (fmt, w, h) = parseImageHeader(p)
      if (id % 13 == 0) {
        assert(p.length == 3 && fmt == "unknown" && w == -1L && h == -1L,
          s"corrupt class at $id")
      } else {
        val wantFmt = (id % 4) match {
          case 0 => "png"
          case 1 => "jpeg"
          case 2 => "gif"
          case _ => "webp"
        }
        assert(fmt == wantFmt, s"fmt at $id: got $fmt")
        assert(w == 16 + id % 2048, s"width at $id")
        assert(h == 16 + (id * 7) % 2048, s"height at $id")
        val expectBytes = (id % 4) match {
          case 0 => 33 + bodyLen
          case 1 => 39 + (id % 17).toInt +
            (if (id % 3 == 0) 5 + (id % 5).toInt else 0) + bodyLen
          case 2 => 13 + bodyLen
          case _ => (if ((id / 4) % 3 == 1) 25 else 30) + bodyLen
        }
        assert(p.length == expectBytes, s"n_bytes at $id")
        // the GIF signature variant is part of the byte contract
        if (id % 4 == 2)
          assert(new String(p, 0, 6, "US-ASCII") ==
            (if (id % 5 == 0) "GIF87a" else "GIF89a"), s"gif sig at $id")
      }
    }
  }
}
