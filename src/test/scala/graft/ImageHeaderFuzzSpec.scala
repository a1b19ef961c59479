package graft

import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz properties for the round-14 image-header parser: an ingest
  * header sniffer faces ADVERSARIAL bytes (truncated crawls, random
  * binary mislabeled as images), so the parser must never throw — on
  * ANY input — and must classify everything into the declared result
  * space. Writing this spec found a real bug: a crafted PNG chunk
  * length with the high bit set decoded negative and walked the int
  * offset BACKWARDS into the array (ArrayIndexOutOfBounds) — fixed
  * with the long accumulator + sign guard in parseImageHeader.
  */
class ImageHeaderFuzzSpec extends AnyFunSuite {

  import operators.Multimodal.{parseImageHeader, synthImagePayload}

  private val seed = rng.Seed(20260815L)

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.iterate((g.pureApply(Gen.Parameters.default, seed), seed.next)) {
      case (_, s) => (g.pureApply(Gen.Parameters.default, s), s.next)
    }.map(_._1).take(n).toSeq

  private val rawBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
        .map(_.toArray))

  // random bytes BEHIND a valid magic — forces the walkers, not just
  // the signature check, to face garbage
  private val pngish: Gen[Array[Byte]] = rawBytes.map(b =>
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte) ++ b)
  private val jpegish: Gen[Array[Byte]] = rawBytes.map(b =>
    Array(0xFF, 0xD8).map(_.toByte) ++ b)
  private val gifish: Gen[Array[Byte]] = rawBytes.map(b =>
    "GIF89a".getBytes("US-ASCII") ++ b)
  private val webpish: Gen[Array[Byte]] = rawBytes.map(b =>
    ("RIFF".getBytes("US-ASCII") ++
      Array[Byte](16, 0, 0, 0) ++ "WEBP".getBytes("US-ASCII") ++ b))

  private val fmts = Set("png", "jpeg", "gif", "webp", "unknown")

  test("parser total on arbitrary bytes: never throws, classifies " +
    "into the declared result space") {
    val cases = sample(rawBytes, 300) ++ sample(pngish, 300) ++
      sample(jpegish, 300) ++ sample(gifish, 300) ++
      sample(webpish, 300)
    cases.foreach { p =>
      val (fmt, w, h) = parseImageHeader(p) // must not throw
      assert(fmts.contains(fmt))
      assert(w >= -1L && h >= -1L)
      assert((w == -1L) == (h == -1L),
        "dims are reported together or not at all")
    }
  }

  test("crafted huge RIFF chunk sizes terminate the WebP walk as " +
    "unparseable (the PNG OOB class applied to the new format)") {
    def riff(size: Int): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(24)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(16)
      buf.put("WEBP".getBytes("US-ASCII"))
      buf.put("JUNK".getBytes("US-ASCII")).putInt(size)
      buf.putInt(0)
      buf.array()
    }
    // 0xFFFFFFFF decodes to -1 as a signed int: an int accumulator
    // would walk BACKWARDS; the u32-in-Long read must walk forward
    // off the end and classify as recognized-but-unparseable
    for (size <- Seq(-1, Int.MinValue, Int.MaxValue, 0))
      assert(parseImageHeader(riff(size)) == (("webp", -1L, -1L)),
        s"size=$size must classify as unparseable, not crash")
  }

  test("parser total on truncations of every valid synth payload " +
    "prefix length (all four formats + both GIF signatures + all " +
    "three WebP variants)") {
    val text = "lorem ipsum dolor sit amet".getBytes("UTF-8")
    // ids chosen per the doc_id%4 class map: PNG (4), JPEG (21),
    // GIF89a (2), GIF87a (10), WebP VP8 (3), VP8L (7), VP8X (11)
    Seq(4L, 21L, 2L, 10L, 3L, 7L, 11L).foreach { id =>
      val p = synthImagePayload(id, text)
      (0 to p.length).foreach { k =>
        val (fmt, _, _) = parseImageHeader(p.take(k)) // must not throw
        assert(fmts.contains(fmt))
      }
    }
  }

  test("crafted negative/huge PNG chunk lengths terminate the walk " +
    "as unparseable (the pre-fix OOB crash class)") {
    def chunk(len: Int): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(20)
      buf.put(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
        .map(_.toByte))
      buf.putInt(len)
      buf.put("junk".getBytes("US-ASCII"))
      buf.putInt(0)
      buf.array()
    }
    for (len <- Seq(Int.MinValue, -1, Int.MaxValue, Int.MaxValue - 11))
      assert(parseImageHeader(chunk(len)) == (("png", -1L, -1L)),
        s"len=$len must classify as unparseable, not crash")
  }

}
