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

  test("parser total on arbitrary bytes: never throws, classifies " +
    "into the declared result space") {
    val cases = sample(rawBytes, 300) ++ sample(pngish, 300) ++
      sample(jpegish, 300)
    cases.foreach { p =>
      val (fmt, w, h) = parseImageHeader(p) // must not throw
      assert(Set("png", "jpeg", "unknown").contains(fmt))
      assert(w >= -1L && h >= -1L)
      assert((w == -1L) == (h == -1L),
        "dims are reported together or not at all")
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

  test("parser total on truncations of every valid synth payload " +
    "prefix length") {
    val text = "lorem ipsum dolor sit amet".getBytes("UTF-8")
    Seq(2L, 7L, 12L, 21L).foreach { id =>
      val p = synthImagePayload(id, text)
      (0 to p.length).foreach { k =>
        val (fmt, _, _) = parseImageHeader(p.take(k)) // must not throw
        assert(Set("png", "jpeg", "unknown").contains(fmt))
      }
    }
  }
}
