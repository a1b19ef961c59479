package graft

import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Golden byte-vector + fuzz coverage for the round-16 audio-header
  * parser (the WAV/MP3 sibling of ImageHeaderSpec/ImageHeaderFuzzSpec):
  * hand-built headers pin the parser independently of synthAudioPayload
  * so synth and parse cannot share a compensating bug, and the fuzz
  * block holds the parser total (never throws, classifies into the
  * declared result space) on adversarial bytes — including the crafted
  * huge RIFF chunk sizes that crashed the pre-fix PNG walk.
  */
class AudioHeaderSpec extends AnyFunSuite {

  import operators.Multimodal.{parseAudioHeader, synthAudioPayload}

  // ---- golden vectors (hand-built, NOT via synthAudioPayload) ----

  private def goldenWav(rate: Int, ch: Int, bits: Int,
      preFmtChunk: Option[Array[Byte]] = None): Array[Byte] = {
    val extra = preFmtChunk.map(_.length).getOrElse(0)
    val buf = java.nio.ByteBuffer.allocate(12 + extra + 24 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + extra + 24 + 8)
    buf.put("WAVE".getBytes("US-ASCII"))
    preFmtChunk.foreach(buf.put)
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1.toShort).putShort(ch.toShort)
    buf.putInt(rate).putInt(rate * ch * bits / 8)
    buf.putShort((ch * bits / 8).toShort).putShort(bits.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(0)
    buf.array()
  }

  private def goldenMp3(bitrateIdx: Int, srIdx: Int, mode: Int,
      id3Size: Int = -1): Array[Byte] = {
    val id3 = if (id3Size < 0) Array.emptyByteArray
    else "ID3".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0,
        ((id3Size >> 21) & 0x7F).toByte, ((id3Size >> 14) & 0x7F).toByte,
        ((id3Size >> 7) & 0x7F).toByte, (id3Size & 0x7F).toByte) ++
      Array.fill(id3Size)('t'.toByte)
    id3 ++ Array(0xFF.toByte, 0xFB.toByte,
      ((bitrateIdx << 4) | (srIdx << 2)).toByte, (mode << 6).toByte)
  }

  test("golden WAV: canonical 44.1k stereo 16-bit header parses") {
    assert(parseAudioHeader(goldenWav(44100, 2, 16)) ==
      (("wav", 44100L, 2L, 44100L * 2 * 16)))
  }

  test("golden WAV: fmt chunk found behind an odd-size padded LIST " +
    "chunk (the walk, not a fixed offset, is load-bearing)") {
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte]('x', 'y', 'z', 0)
    assert(parseAudioHeader(goldenWav(8000, 1, 8, Some(list))) ==
      (("wav", 8000L, 1L, 8000L * 8)))
  }

  test("golden WAV: truncated before the fmt chunk is recognized " +
    "but unparseable") {
    assert(parseAudioHeader(goldenWav(22050, 1, 24).take(16)) ==
      (("wav", -1L, -1L, -1L)))
  }

  test("golden MP3: bare MPEG-1 L3 frame header decodes the tables") {
    // idx 9 -> 128 kbps, sr idx 0 -> 44100, mode 0 -> stereo
    assert(parseAudioHeader(goldenMp3(9, 0, 0)) ==
      (("mp3", 44100L, 2L, 128000L)))
    // idx 14 -> 320 kbps, sr idx 2 -> 32000, mode 3 -> mono
    assert(parseAudioHeader(goldenMp3(14, 2, 3)) ==
      (("mp3", 32000L, 1L, 320000L)))
  }

  test("golden MP3: frame found behind a multi-byte syncsafe ID3v2 " +
    "tag (size 300 spans two syncsafe bytes)") {
    assert(parseAudioHeader(goldenMp3(1, 1, 3, id3Size = 300)) ==
      (("mp3", 48000L, 1L, 32000L)))
  }

  test("golden MP3: free/bad bitrate and reserved sample-rate " +
    "indices parse to -1, not a table OOB") {
    for ((b, s) <- Seq((0, 0), (15, 0), (9, 3)))
      assert(parseAudioHeader(goldenMp3(b, s, 0)) ==
        (("mp3", -1L, -1L, -1L)), s"bitrateIdx=$b srIdx=$s")
  }

  test("golden MP3: MPEG-2 / non-Layer-III frames are recognized " +
    "but unparsed (version/layer gate)") {
    // version bits 10 (MPEG-2): byte1 = 0xF3; layer bits 11
    // (Layer I): byte1 = 0xFF
    for (b1 <- Seq(0xF3, 0xFF)) {
      val p = Array(0xFF.toByte, b1.toByte, 0x94.toByte, 0x00.toByte)
      assert(parseAudioHeader(p) == (("mp3", -1L, -1L, -1L)))
    }
  }

  private def goldenFlac(rate: Long, ch: Int, bits: Int,
      blockType: Int = 0, blockLen: Int = 34): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + 34) // big-endian
    buf.put("fLaC".getBytes("US-ASCII"))
    buf.put((0x80 | blockType).toByte)
    buf.put(((blockLen >> 16) & 0xFF).toByte)
      .put(((blockLen >> 8) & 0xFF).toByte)
      .put((blockLen & 0xFF).toByte)
    buf.putShort(4096.toShort).putShort(4096.toShort)
    buf.put(Array.fill(6)(0.toByte)) // min/max framesize u24s
    buf.putLong((rate << 44) | ((ch - 1).toLong << 41) |
      ((bits - 1).toLong << 36) | 12345L)
    buf.put(Array.fill(16)(0.toByte))
    buf.array()
  }

  private def goldenOggVorbis(rate: Int, ch: Int, nominal: Int,
      nsegs: Int = 1, packetType: Int = 1): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(27 + nsegs + 30)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("OggS".getBytes("US-ASCII"))
    buf.put(0.toByte).put(2.toByte)
    buf.putLong(0L).putInt(7).putInt(0).putInt(0)
    buf.put(nsegs.toByte).put(Array.fill(nsegs)(30.toByte))
    buf.put(packetType.toByte).put("vorbis".getBytes("US-ASCII"))
    buf.putInt(0).put(ch.toByte).putInt(rate)
    buf.putInt(0).putInt(nominal).putInt(0)
    buf.put(0xB8.toByte).put(1.toByte)
    buf.array()
  }

  test("golden FLAC: STREAMINFO 20-bit rate / 3-bit ch / 5-bit bps " +
    "unpack (96k stereo 24-bit exercises the high rate bits)") {
    assert(parseAudioHeader(goldenFlac(96000L, 2, 24)) ==
      (("flac", 96000L, 2L, 96000L * 2 * 24)))
    assert(parseAudioHeader(goldenFlac(8000L, 1, 8)) ==
      (("flac", 8000L, 1L, 8000L * 8)))
  }

  test("golden FLAC: a non-STREAMINFO first block or a truncated " +
    "STREAMINFO is recognized but unparseable (spec mandates type 0 " +
    "first)") {
    assert(parseAudioHeader(goldenFlac(44100L, 2, 16, blockType = 4))
      == (("flac", -1L, -1L, -1L)))
    assert(parseAudioHeader(goldenFlac(44100L, 2, 16).take(20)) ==
      (("flac", -1L, -1L, -1L)))
  }

  test("golden Ogg/Vorbis: id header found behind a 3-entry segment " +
    "table (the count-skip, not a fixed offset, is load-bearing)") {
    assert(parseAudioHeader(goldenOggVorbis(44100, 2, 128000)) ==
      (("ogg", 44100L, 2L, 128000L)))
    assert(parseAudioHeader(goldenOggVorbis(8000, 1, 64000, nsegs = 3))
      == (("ogg", 8000L, 1L, 64000L)))
  }

  test("golden Ogg: wrong packet type, wrong version, or truncation " +
    "before the id header classify as recognized-but-unparseable") {
    assert(parseAudioHeader(
      goldenOggVorbis(44100, 2, 128000, packetType = 3)) ==
      (("ogg", -1L, -1L, -1L)))
    val badVer = goldenOggVorbis(44100, 2, 128000)
    badVer(4) = 9
    assert(parseAudioHeader(badVer) == (("ogg", -1L, -1L, -1L)))
    assert(parseAudioHeader(
      goldenOggVorbis(44100, 2, 128000).take(30)) ==
      (("ogg", -1L, -1L, -1L)))
  }

  // ---- synth/parse roundtrip vs the independent closed form ----

  test("parse(synth(id)) matches the closed-form field map for a " +
    "dense id range (the oracle's formula, recomputed here)") {
    val kbps = Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
      224, 256, 320)
    val wavRates = Array(8000L, 16000L, 22050L, 44100L, 48000L)
    val flacRates = Array(8000L, 16000L, 22050L, 24000L, 44100L, 48000L)
    val mp3Rates = Array(44100L, 48000L, 32000L)
    val vorbisKbps = Array(64L, 80L, 96L, 112L, 128L, 160L, 192L,
      224L, 256L, 320L)
    val text = "the quick brown fox".getBytes("UTF-8")
    (1L to 400L).foreach { id =>
      val got = parseAudioHeader(synthAudioPayload(id, text))
      val expected =
        if (id % 11 == 0) {
          if (id % 4 == 1 && id % 3 != 0) ("mp3", -1L, -1L, -1L)
          else ("unknown", -1L, -1L, -1L)
        } else (id % 4) match {
          case 0 =>
            val rate = wavRates((id % 5).toInt)
            val ch = if (id % 3 == 0) 2L else 1L
            val bits = 8L * (1 + (id % 7) % 3)
            ("wav", rate, ch, rate * ch * bits)
          case 1 =>
            val ch = if ((id / 4) % 4 == 3) 1L else 2L
            ("mp3", mp3Rates((id % 3).toInt), ch,
              kbps((id % 14).toInt) * 1000L)
          case 2 =>
            val rate = flacRates((id % 6).toInt)
            val ch = 1L + (id / 4) % 2
            val bits = 8L * (1 + (id % 7) % 3)
            ("flac", rate, ch, rate * ch * bits)
          case _ =>
            ("ogg", wavRates((id % 5).toInt), 1L + (id / 4) % 2,
              vorbisKbps(((id / 4) % 10).toInt) * 1000L)
        }
      assert(got == expected, s"id=$id")
    }
  }

  // ---- fuzz: the parser is total on adversarial bytes ----

  private val seed = rng.Seed(20260816L)

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.iterate((g.pureApply(Gen.Parameters.default, seed), seed.next)) {
      case (_, s) => (g.pureApply(Gen.Parameters.default, s), s.next)
    }.map(_._1).take(n).toSeq

  private val rawBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
        .map(_.toArray))

  // random bytes BEHIND a valid magic — forces the walkers to face
  // garbage past the signature check
  private val wavish: Gen[Array[Byte]] = rawBytes.map(b =>
    "RIFF".getBytes("US-ASCII") ++ Array[Byte](16, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++ b)
  private val id3ish: Gen[Array[Byte]] = rawBytes.map(b =>
    "ID3".getBytes("US-ASCII") ++ b)
  private val mp3ish: Gen[Array[Byte]] = rawBytes.map(b =>
    Array(0xFF.toByte, 0xFA.toByte) ++ b)
  private val flacish: Gen[Array[Byte]] = rawBytes.map(b =>
    "fLaC".getBytes("US-ASCII") ++ b)
  private val oggish: Gen[Array[Byte]] = rawBytes.map(b =>
    "OggS".getBytes("US-ASCII") ++ b)

  private val fmts = Set("wav", "mp3", "flac", "ogg", "unknown")

  test("parser total on arbitrary bytes: never throws, classifies " +
    "into the declared result space, fields reported together") {
    val cases = sample(rawBytes, 300) ++ sample(wavish, 300) ++
      sample(id3ish, 300) ++ sample(mp3ish, 300) ++
      sample(flacish, 300) ++ sample(oggish, 300)
    cases.foreach { p =>
      val (fmt, rate, ch, bps) = parseAudioHeader(p) // must not throw
      assert(fmts.contains(fmt))
      assert(rate >= -1L && ch >= -1L && bps >= -1L)
      assert((rate == -1L) == (ch == -1L) &&
        (ch == -1L) == (bps == -1L),
        "audio fields are reported together or not at all")
    }
  }

  test("crafted huge RIFF chunk sizes terminate the WAV walk as " +
    "unparseable (the PNG OOB class applied to the new format)") {
    def riff(size: Int): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(24)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(16)
      buf.put("WAVE".getBytes("US-ASCII"))
      buf.put("JUNK".getBytes("US-ASCII")).putInt(size)
      buf.putInt(0)
      buf.array()
    }
    for (size <- Seq(-1, Int.MinValue, Int.MaxValue, 0))
      assert(parseAudioHeader(riff(size)) ==
        (("wav", -1L, -1L, -1L)),
        s"size=$size must classify as unparseable, not crash")
  }

  test("crafted ID3 tag sizes (max syncsafe, overshooting the " +
    "buffer) classify as recognized-but-unparseable") {
    def id3(b6: Int, b7: Int, b8: Int, b9: Int): Array[Byte] =
      "ID3".getBytes("US-ASCII") ++
        Array[Byte](3, 0, 0, b6.toByte, b7.toByte, b8.toByte,
          b9.toByte) ++ Array.fill(4)(0.toByte)
    for (sz <- Seq((0x7F, 0x7F, 0x7F, 0x7F), (0, 0, 1, 0)))
      assert(parseAudioHeader(id3(sz._1, sz._2, sz._3, sz._4)) ==
        (("mp3", -1L, -1L, -1L)))
  }

  test("parser total on truncations of every synth payload prefix " +
    "length (all four container families, with/without the optional " +
    "chunks, plus every truncated class)") {
    val text = "lorem ipsum dolor sit amet".getBytes("UTF-8")
    // ids per the %4 class map: WAV plain (8), WAV+LIST odd len (12),
    // WAV+LIST even len (4), MP3 bare (1), MP3+ID3 (9, 93), FLAC
    // mono/stereo (2, 6), OGG 1-3 segs (3, 7, 23), truncated wav (44),
    // truncated mp3+ID3 (33), truncated bare mp3 (77), truncated
    // flac (22), truncated ogg (55)
    Seq(8L, 12L, 4L, 1L, 9L, 93L, 2L, 6L, 3L, 7L, 23L,
        44L, 33L, 77L, 22L, 55L).foreach { id =>
      val p = synthAudioPayload(id, text)
      (0 to p.length).foreach { k =>
        val (fmt, _, _, _) = parseAudioHeader(p.take(k)) // no throw
        assert(fmts.contains(fmt))
      }
    }
  }
}
