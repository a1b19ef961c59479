package graft

import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Golden byte-vector + fuzz coverage for the round-18 video-header
  * parser (the MP4/WebM sibling of AudioHeaderSpec): hand-built
  * headers pin the parser independently of synthVideoPayload so synth
  * and parse cannot share a compensating bug, and the fuzz block holds
  * the parser total (never throws, classifies into the declared result
  * space) on adversarial bytes — including huge box sizes and
  * truncated vints.
  */
class VideoHeaderSpec extends AnyFunSuite {

  import operators.Multimodal.{parseVideoHeader, synthVideoPayload}

  // ---- golden vectors (hand-built, NOT via synthVideoPayload) ----

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + payload.length)
    buf.putInt(8 + payload.length)
    buf.put(typ.getBytes("US-ASCII"))
    buf.put(payload)
    buf.array()
  }

  private def mvhdPayload(ts: Int, dur: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(100)
    buf.putInt(0).putInt(0).putInt(0) // version/flags, ctime, mtime
    buf.putInt(ts).putInt(dur)
    buf.putInt(0x00010000).putShort(0x0100.toShort)
    buf.put(Array.fill(10 + 36 + 24)(0.toByte))
    buf.putInt(2)
    buf.array()
  }

  private def tkhdPayload(w: Int, h: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(84)
    buf.putInt(7).putInt(0).putInt(0) // version/flags, ctime, mtime
    buf.putInt(1).putInt(0).putInt(0) // track_ID, reserved, duration
    buf.put(Array.fill(8)(0.toByte))
    buf.putShort(0.toShort).putShort(0.toShort)
    buf.putShort(0.toShort).putShort(0.toShort)
    buf.put(Array.fill(36)(0.toByte))
    buf.putInt(w << 16).putInt(h << 16)
    buf.array()
  }

  private def goldenMp4(w: Int, h: Int, ts: Int, dur: Int,
      preMoov: Option[Array[Byte]] = None): Array[Byte] = {
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0) ++
        "iso2".getBytes("US-ASCII"))
    val moov = box("moov",
      box("mvhd", mvhdPayload(ts, dur)) ++
        box("trak", box("tkhd", tkhdPayload(w, h))))
    ftyp ++ preMoov.getOrElse(Array.emptyByteArray) ++ moov ++
      box("mdat", "xx".getBytes("US-ASCII"))
  }

  private def vint2(n: Int): Array[Byte] =
    Array((0x40 | (n >> 8)).toByte, (n & 0xFF).toByte)

  private def el(id: Array[Byte], payload: Array[Byte],
      size: Option[Array[Byte]] = None): Array[Byte] =
    id ++ size.getOrElse(vint2(payload.length)) ++ payload

  private def goldenWebm(w: Int, h: Int, tcs: Int, durTc: Long,
      unknownSeg: Boolean = false,
      oneByteVints: Boolean = false): Array[Byte] = {
    def sz(n: Int): Option[Array[Byte]] =
      if (oneByteVints && n < 0x7F) Some(Array((0x80 | n).toByte))
      else None // default 2-byte form via el()
    def be(n: Long, len: Int): Array[Byte] =
      (0 until len).map(i => ((n >>> (8 * (len - 1 - i))) & 0xFF)
        .toByte).toArray
    val dims = el(Array(0xB0.toByte), be(w, 2), sz(2)) ++
      el(Array(0xBA.toByte), be(h, 2), sz(2))
    val video = el(Array(0xE0.toByte), dims, sz(dims.length))
    val trackEntry = el(Array(0xAE.toByte), video)
    val tracks = el(Array[Byte](0x16, 0x54, 0xAE.toByte, 0x6B),
      trackEntry)
    val durBits = java.lang.Double.doubleToLongBits(durTc.toDouble)
    val info = el(Array[Byte](0x15, 0x49, 0xA9.toByte, 0x66),
      el(Array[Byte](0x2A, 0xD7.toByte, 0xB1.toByte), be(tcs, 4)) ++
        el(Array[Byte](0x44, 0x89.toByte), be(durBits, 8)))
    val ebml = el(Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte),
      el(Array[Byte](0x42, 0x82.toByte), "webm".getBytes("US-ASCII")))
    val content = info ++ tracks
    val segSize =
      if (unknownSeg)
        Some(Array(0x01.toByte) ++ Array.fill(7)(0xFF.toByte))
      else None
    ebml ++ el(Array[Byte](0x18, 0x53, 0x80.toByte, 0x67), content,
      segSize)
  }

  test("golden MP4: the fields live two box levels deep and parse") {
    assert(parseVideoHeader(goldenMp4(1920, 1080, 90000, 180000)) ==
      (("mp4", 1920L, 1080L, 90000L, 2000L)))
  }

  test("golden MP4: moov found behind a variable-size free box (the " +
    "walk, not a fixed offset, is load-bearing)") {
    val free = box("free", Array.fill(13)('f'.toByte))
    assert(parseVideoHeader(
      goldenMp4(640, 360, 600, 1500, Some(free))) ==
      (("mp4", 640L, 360L, 600L, 2500L)))
  }

  test("golden MP4: truncation before moov and absurd box sizes are " +
    "recognized but unparseable, never a crash") {
    val g = goldenMp4(1280, 720, 1000, 5000)
    assert(parseVideoHeader(g.take(20)) ==
      (("mp4", -1L, -1L, -1L, -1L)))
    // a top-level box whose u32 size runs past the payload
    val huge = g.clone()
    huge(0) = 0x7F.toByte // ftyp size becomes ~2^31
    assert(parseVideoHeader(huge) == (("mp4", -1L, -1L, -1L, -1L)))
    // size < 8 would loop forever without the guard
    val tiny = g.clone()
    tiny(0) = 0; tiny(1) = 0; tiny(2) = 0; tiny(3) = 4
    assert(parseVideoHeader(tiny) == (("mp4", -1L, -1L, -1L, -1L)))
  }

  test("golden WebM: EBML vint walk recovers dims, timescale, and " +
    "the integral float64 duration") {
    assert(parseVideoHeader(goldenWebm(1280, 720, 1000000, 42000L)) ==
      (("webm", 1280L, 720L, 1000000L, 42000L)))
  }

  test("golden WebM: the unknown-size Segment (live-stream spelling) " +
    "parses by walking children to end of payload") {
    assert(parseVideoHeader(
      goldenWebm(320, 240, 100000, 7500L, unknownSeg = true)) ==
      (("webm", 320L, 240L, 100000L, 750L)))
  }

  test("golden WebM: 1-byte size vints parse the same as the 2-byte " +
    "spelling (non-minimal encodings are legal EBML)") {
    assert(parseVideoHeader(
      goldenWebm(800, 600, 1000000, 9L, oneByteVints = true)) ==
      (("webm", 800L, 600L, 1000000L, 9L)))
  }

  test("golden WebM: truncation inside the element tree classifies " +
    "as recognized-but-unparseable") {
    val g = goldenWebm(1280, 720, 1000000, 42000L)
    assert(parseVideoHeader(g.take(6)) ==
      (("webm", -1L, -1L, -1L, -1L)))
    assert(parseVideoHeader(g.take(30)) ==
      (("webm", -1L, -1L, -1L, -1L)))
  }

  // ---- synth/parse roundtrip vs the independent closed form ----

  test("parse(synth(id)) matches the closed-form field map for a " +
    "dense id range (the oracle's formula, recomputed here)") {
    val text = "the quick brown fox".getBytes("UTF-8")
    (0L to 400L).foreach { id =>
      val got = parseVideoHeader(synthVideoPayload(id, text))
      val expected =
        if (id % 17 == 0) ("unknown", -1L, -1L, -1L, -1L)
        else if (id % 2 == 0) {
          val ts = Array(600L, 1000L, 24000L, 90000L)(
            ((id / 2) % 4).toInt)
          ("mp4", 640L + id % 1280, 360L + (id / 2) % 720, ts,
            (1000L + id % 100000) * 1000L / ts)
        } else {
          val tcs = Array(100000L, 1000000L)(((id / 2) % 2).toInt)
          ("webm", 320L + id % 1280, 240L + (id / 2) % 720, tcs,
            (500L + id % 50000) * tcs / 1000000L)
        }
      assert(got == expected, s"id=$id")
    }
  }

  test("synth payload length matches the closed-form n_bytes map") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
      .getBytes("UTF-8")
    val body = math.min(text.length, 64)
    (0L to 400L).foreach { id =>
      val n = synthVideoPayload(id, text).length.toLong
      val expected =
        if (id % 17 == 0) 3L
        else if (id % 2 == 0)
          244L + 4 * (id % 3) +
            (if ((id / 2) % 2 == 1) 8 + id % 7 else 0L) + body
        else 67L + (if ((id / 2) % 3 == 0) 8L else 2L) + body
      assert(n == expected, s"id=$id")
    }
  }

  // ---- fuzz: the parser is total on adversarial bytes ----

  private val seed = rng.Seed(20260817L)

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.iterate(
      (g.pureApply(Gen.Parameters.default, seed), seed.next)) {
      case (_, s) => (g.pureApply(Gen.Parameters.default, s), s.next)
    }.map(_._1).take(n).toSeq

  private val rawBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
        .map(_.toArray))

  // garbage BEHIND a valid signature — forces the walkers past the
  // magic check into adversarial structure
  private val mp4ish: Gen[Array[Byte]] = rawBytes.map(b =>
    Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes("US-ASCII") ++ b)
  private val ebmlish: Gen[Array[Byte]] = rawBytes.map(b =>
    Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte) ++ b)

  test("fuzz: parser is total and closed over the declared result " +
    "space on raw, mp4-magic, and ebml-magic byte strings") {
    val fmts = Set("mp4", "webm", "unknown")
    for (g <- Seq(rawBytes, mp4ish, ebmlish); p <- sample(g, 300)) {
      val (fmt, w, h, ts, dur) = parseVideoHeader(p)
      assert(fmts.contains(fmt), s"fmt=$fmt len=${p.length}")
      if (fmt == "unknown")
        assert((w, h, ts, dur) == ((-1L, -1L, -1L, -1L)))
      // parsed-ok implies all fields present; partial never leaks
      if (ts > 0) assert(w >= 0 && h >= 0 && dur >= 0)
    }
  }
}
