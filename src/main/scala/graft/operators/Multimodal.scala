package graft.operators

import graft.QueryModule
import graft.Det._
import graft.Tables.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for LLM training-data pipelines: image / audio /
  * video treated as opaque `binary` payloads with typed metadata, plus a
  * partition-batched decode / feature-extract stage.
  *
  * The synthetic media corpus is derived deterministically from the
  * `documents` table (payload = UTF-8 bytes of the text, standing in for
  * image bytes; media_type cycles image/audio/video by doc_id), which
  * keeps every stage DuckDB-oracle-checkable byte-for-byte. The DECODE
  * step is a deterministic stub — this container has no codec/model
  * libraries — but the Spark-side plumbing is the real 100 TB shape:
  *
  *   - binary payload column + scalar metadata columns, so metadata-only
  *     queries prune the payload at the Parquet scan (never deserialize
  *     gigabytes of pixels to count files by type);
  *   - a typed `Dataset[MediaRow]` -> `mapPartitions` decode that groups
  *     rows into fixed-size batches (the GPU/codec-friendly batch shape:
  *     one model call per batch, not per row) and emits typed features;
  *   - frame sampling as a generator (`explode(sequence(...))`) so frame
  *     rows are produced distributively, never collected.
  */
object Multimodal extends QueryModule {

  /** One media row entering the decode stage. */
  final case class MediaRow(doc_id: Long, media_type: String,
      payload: Array[Byte])

  /** Stub-decoded features (deterministic fake: a real build would call
    * an image/audio codec here; the batch shape and schema would not
    * change).
    */
  final case class DecodedRow(doc_id: Long, media_type: String,
      width: Long, height: Long, n_frames: Long)

  /** GPU-ish decode batch size: one "model call" per batch. */
  private val DecodeBatchSize = 32

  /** Single-row decode, exposed for batch-independence tests. */
  private[graft] def decodeOne(m: MediaRow): DecodedRow =
    decodeBatch(Seq(m)).head

  /** Deterministic stand-in for a codec call on a batch of payloads.
    * The fake "dimensions" come from the first/last CODE POINT of the
    * payload decoded as UTF-8 — code points, not raw bytes, because the
    * DuckDB oracle's `ord(substring(text, ...))` is code-point based and
    * the two must agree for non-ASCII payloads too.
    */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[DecodedRow] =
    batch.map { m =>
      val text = new String(m.payload, java.nio.charset.StandardCharsets.UTF_8)
      val first = if (text.nonEmpty) text.codePointAt(0).toLong else 0L
      val last =
        if (text.nonEmpty) text.codePointBefore(text.length).toLong else 0L
      DecodedRow(m.doc_id, m.media_type,
        width = 64L + first % 64L,
        height = 64L + last % 64L,
        n_frames =
          if (m.media_type == "video") m.payload.length.toLong / 256L + 1L
          else 1L)
    }

  // ---- round 14 (r13 ask #8): REAL image-header parsing. The decode
  // stub above stands in for codec work this container cannot run, but
  // header geometry needs no codec — it is pure byte arithmetic over
  // public container formats (PNG: 8-byte signature + IHDR chunk,
  // big-endian int32 dims at data offsets 0/4; JPEG/JFIF: marker-
  // segment walk from SOI to an SOF marker, big-endian int16 dims at
  // segment offsets 5/7). synthImagePayload builds a structurally real
  // header around deterministic dims; parseImageHeader recovers them
  // from the BYTES alone. The JPEG SOF offset VARIES per doc (padded
  // APP0, optional COM segment), so a fixed-offset shortcut cannot
  // pass — the marker walk is load-bearing, exactly like a real
  // ingest's header sniffer. Golden byte-vector tests pin the parser
  // against hand-built headers (ImageHeaderSpec).

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def le24(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16)

  // unsigned: RIFF chunk sizes are u32 — a Long keeps a crafted
  // high-bit size from walking the offset backwards (the round-14
  // PNG fuzz lesson applied to the new format up front)
  private def le32u(b: Array[Byte], off: Int): Long =
    (le16(b, off).toLong) | (le16(b, off + 2).toLong << 16)

  /** Deterministic synthetic image payload with a REAL container
    * header, doc_id % 4 selecting the format (round 15 widened the
    * round-14 PNG/JPEG pair — real multimodal crawls are not two
    * formats): 0 → PNG (signature + IHDR + 64B body); 1 → JPEG (SOI +
    * APP0 padded by doc_id%17 + COM of 1+doc_id%5 bytes when
    * doc_id%3==0 + SOF0 + body); 2 → GIF (87a when doc_id%5==0 else
    * 89a; logical-screen u16 LE dims); 3 → WebP, sub-variant
    * (doc_id/4)%3: VP8 lossy (sync-coded 14-bit LE dims), VP8L
    * lossless (bit-packed w-1/h-1), VP8X extended (u24 LE canvas-1).
    * doc_id%13==0 → the first 3 bytes only (a truncated crawl
    * artifact — the error path every header sniffer needs).
    */
  private[graft] def synthImagePayload(docId: Long,
      textBytes: Array[Byte]): Array[Byte] = {
    val w = (16 + docId % 2048).toInt
    val h = (16 + (docId * 7) % 2048).toInt
    val body = textBytes.take(64)
    val full: Array[Byte] =
      if (docId % 4 == 0) {
        val buf = java.nio.ByteBuffer.allocate(33 + body.length)
        buf.put(Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
          .map(_.toByte))
        buf.putInt(13) // IHDR data length
        buf.put("IHDR".getBytes("US-ASCII"))
        buf.putInt(w)
        buf.putInt(h)
        // bit depth 8, color type 2 (truecolor), compression/filter/
        // interlace 0; CRC not validated by header sniffers
        buf.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte)
          .put(0.toByte)
        buf.putInt(0)
        buf.put(body)
        buf.array()
      } else if (docId % 4 == 2) {
        // GIF: 6-byte signature + logical screen descriptor (u16 LE
        // width/height, packed/bg/aspect zero) = 13-byte header
        val buf = java.nio.ByteBuffer.allocate(13 + body.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val sig = if (docId % 5 == 0) "GIF87a" else "GIF89a"
        buf.put(sig.getBytes("US-ASCII"))
        buf.putShort(w.toShort).putShort(h.toShort)
        buf.put(0.toByte).put(0.toByte).put(0.toByte)
        buf.put(body)
        buf.array()
      } else if (docId % 4 == 3) {
        // WebP: RIFF("WEBP") + one dims-bearing chunk + body-as-
        // bitstream-tail; variant cycles so the parser's chunk
        // dispatch (not one lucky layout) is what the oracle pins
        val variant = ((docId / 4) % 3).toInt
        val payloadLen = if (variant == 1) 5 else 10
        val buf = java.nio.ByteBuffer
          .allocate(12 + 8 + payloadLen + body.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put("RIFF".getBytes("US-ASCII"))
        buf.putInt(4 + 8 + payloadLen + body.length) // RIFF size
        buf.put("WEBP".getBytes("US-ASCII"))
        variant match {
          case 0 => // VP8 lossy: frame tag, 9D 01 2A sync, 14-bit LE dims
            buf.put("VP8 ".getBytes("US-ASCII"))
            buf.putInt(payloadLen + body.length)
            buf.put(0.toByte).put(0.toByte).put(0.toByte)
            buf.put(0x9D.toByte).put(0x01.toByte).put(0x2A.toByte)
            buf.putShort(w.toShort).putShort(h.toShort)
          case 1 => // VP8L lossless: 2F sig + bit-packed (w-1, h-1)
            buf.put("VP8L".getBytes("US-ASCII"))
            buf.putInt(payloadLen + body.length)
            buf.put(0x2F.toByte)
            buf.putInt((w - 1) | ((h - 1) << 14))
          case _ => // VP8X extended: flags + reserved + u24 LE canvas-1
            buf.put("VP8X".getBytes("US-ASCII"))
            buf.putInt(payloadLen + body.length)
            buf.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
            buf.put((w - 1).toByte).put((((w - 1) >> 8) & 0xFF).toByte)
              .put((((w - 1) >> 16) & 0xFF).toByte)
            buf.put((h - 1).toByte).put((((h - 1) >> 8) & 0xFF).toByte)
              .put((((h - 1) >> 16) & 0xFF).toByte)
        }
        buf.put(body)
        buf.array()
      } else {
        val pad = (docId % 17).toInt
        val hasCom = docId % 3 == 0
        val comLen = (1 + docId % 5).toInt
        val size = 2 + (18 + pad) + (if (hasCom) 4 + comLen else 0) +
          19 + body.length
        val buf = java.nio.ByteBuffer.allocate(size)
        buf.put(0xFF.toByte).put(0xD8.toByte) // SOI
        buf.put(0xFF.toByte).put(0xE0.toByte) // APP0
        buf.putShort((16 + pad).toShort)
        buf.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
        buf.put(1.toByte).put(1.toByte) // version 1.1
        buf.put(0.toByte) // units
        buf.putShort(1.toShort).putShort(1.toShort) // density
        buf.put(0.toByte).put(0.toByte) // no thumbnail
        buf.put(Array.fill(pad)(0.toByte))
        if (hasCom) {
          buf.put(0xFF.toByte).put(0xFE.toByte)
          buf.putShort((2 + comLen).toShort)
          buf.put(Array.fill(comLen)('c'.toByte))
        }
        buf.put(0xFF.toByte).put(0xC0.toByte) // SOF0, baseline
        buf.putShort(17.toShort) // 2 len + 1 precision + 2 h + 2 w + 1 nc + 3*3
        buf.put(8.toByte) // precision
        buf.putShort(h.toShort)
        buf.putShort(w.toShort)
        buf.put(3.toByte) // components
        (1 to 3).foreach { c =>
          buf.put(c.toByte).put(0x11.toByte).put(0.toByte)
        }
        buf.put(body)
        buf.array()
      }
    if (docId % 13 == 0) full.take(3) else full
  }

  /** Header-only image parse from bytes alone: PNG chunk walk to IHDR,
    * JPEG marker-segment walk to the first SOF{0-3,5-7,9-11,13-15},
    * GIF logical-screen descriptor, or RIFF/WEBP chunk walk to the
    * first VP8 /VP8L/VP8X (round 15 — the two formats a real crawl
    * adds first). Returns (format, width, height); unparseable →
    * ("unknown",-1,-1), recognized-but-truncated → (fmt,-1,-1).
    */
  private[graft] def parseImageHeader(p: Array[Byte])
      : (String, Long, Long) = {
    val isPng = p.length >= 8 && (p(0) & 0xFF) == 0x89 && p(1) == 'P' &&
      p(2) == 'N' && p(3) == 'G' && (p(4) & 0xFF) == 0x0D &&
      (p(5) & 0xFF) == 0x0A && (p(6) & 0xFF) == 0x1A &&
      (p(7) & 0xFF) == 0x0A
    if (isPng) {
      var off = 8L
      while (off + 8 <= p.length) {
        val len = be32(p, off.toInt)
        val typ = new String(p, off.toInt + 4, 4, "US-ASCII")
        if (typ == "IHDR")
          return if (off + 16 <= p.length)
            ("png", be32(p, off.toInt + 8).toLong,
              be32(p, off.toInt + 12).toLong)
          else ("png", -1L, -1L)
        // 4 len + 4 type + data + 4 crc. A crafted length with the
        // high bit set decodes negative, and an int accumulator could
        // overflow BACKWARDS into the array — a fuzzable OOB crash on
        // adversarial bytes (found by the round-14 fuzz spec). The
        // long accumulator + sign guard make any malformed length
        // terminate the walk as "recognized but unparseable".
        if (len < 0) return ("png", -1L, -1L)
        off += 12L + len
      }
      ("png", -1L, -1L)
    } else if (p.length >= 4 && (p(0) & 0xFF) == 0xFF &&
        (p(1) & 0xFF) == 0xD8) {
      var off = 2
      while (off + 4 <= p.length && (p(off) & 0xFF) == 0xFF) {
        val m = p(off + 1) & 0xFF
        // SOF0-15 minus DHT(C4)/JPG(C8)/DAC(CC) carry the frame dims
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 &&
            m != 0xCC)
          return if (off + 9 <= p.length)
            ("jpeg", be16(p, off + 7).toLong, be16(p, off + 5).toLong)
          else ("jpeg", -1L, -1L)
        off += 2 + be16(p, off + 2)
      }
      ("jpeg", -1L, -1L)
    } else if (p.length >= 6 && p(0) == 'G' && p(1) == 'I' &&
        p(2) == 'F' && p(3) == '8' && (p(4) == '7' || p(4) == '9') &&
        p(5) == 'a') {
      // GIF87a/89a: logical screen descriptor immediately follows the
      // signature — u16 LITTLE-endian width at 6, height at 8
      if (p.length >= 10) ("gif", le16(p, 6).toLong, le16(p, 8).toLong)
      else ("gif", -1L, -1L)
    } else if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' &&
        p(2) == 'F' && p(3) == 'F' && p(8) == 'W' && p(9) == 'E' &&
        p(10) == 'B' && p(11) == 'P') {
      // RIFF/WEBP chunk walk to the first dims-bearing chunk. Sizes
      // are u32 LE read into a Long (never negative — the PNG fuzz
      // lesson); chunks pad to even length per RIFF.
      var off = 12L
      while (off + 8 <= p.length) {
        val o = off.toInt
        val fourcc = new String(p, o, 4, "US-ASCII")
        val size = le32u(p, o + 4)
        val data = o + 8
        if (fourcc == "VP8 ") {
          // lossy: 3-byte frame tag, 9D 01 2A sync, 14-bit LE dims
          return if (data + 10 <= p.length && (p(data + 3) & 0xFF) == 0x9D &&
              (p(data + 4) & 0xFF) == 0x01 && (p(data + 5) & 0xFF) == 0x2A)
            ("webp", (le16(p, data + 6) & 0x3FFF).toLong,
              (le16(p, data + 8) & 0x3FFF).toLong)
          else ("webp", -1L, -1L)
        } else if (fourcc == "VP8L") {
          // lossless: 2F signature + 14-bit-packed (w-1, h-1)
          return if (data + 5 <= p.length && (p(data) & 0xFF) == 0x2F) {
            val bits = le32u(p, data + 1)
            ("webp", (bits & 0x3FFF) + 1L, ((bits >> 14) & 0x3FFF) + 1L)
          } else ("webp", -1L, -1L)
        } else if (fourcc == "VP8X") {
          // extended: flags + 3 reserved + u24 LE canvas dims minus one
          return if (data + 10 <= p.length)
            ("webp", le24(p, data + 4) + 1L, le24(p, data + 7) + 1L)
          else ("webp", -1L, -1L)
        }
        off += 8L + size + (size & 1L)
      }
      ("webp", -1L, -1L)
    } else ("unknown", -1L, -1L)
  }

  // ---- round 16 (r15 ask #6): audio-container headers. Real
  // multimodal corpora carry audio next to images; the sibling of the
  // image walk is a WAV RIFF-chunk walk (fmt chunk: PCM sample rate /
  // channels / bits) and an MP3 frame-header decode (bitrate and
  // sample-rate INDEX tables, with an ID3v2 tag skip in front — the
  // syncsafe-size arithmetic every real sniffer needs). Same
  // discipline as the image family: synthAudioPayload builds a
  // structurally real container around closed-form fields,
  // parseAudioHeader recovers them from the BYTES alone, golden
  // byte-vector + fuzz specs pin the parser independently of the
  // synth (AudioHeaderSpec).

  /** MPEG-1 Layer III bitrate table, kbps, index 1-14 (0 = free,
    * 15 = bad — both parse to -1).
    */
  private val Mp3KbpsByIndex: Array[Int] = Array(
    32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample-rate table by 2-bit index (3 = reserved). */
  private val Mp3RateByIndex: Array[Int] = Array(44100, 48000, 32000)

  /** FLAC STREAMINFO sample-rate table used by the synth (all valid
    * 20-bit rates; 24000 exercises a value absent from the WAV set).
    */
  private val FlacRates: Array[Int] = Array(
    8000, 16000, 22050, 24000, 44100, 48000)

  /** Vorbis nominal-bitrate ladder (kbps) used by the synth. */
  private val VorbisKbps: Array[Int] = Array(
    64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** Deterministic synthetic audio payload with a REAL container
    * header — FOUR families by doc_id%4 (round 17 widened the r16
    * WAV/MP3 pair with FLAC and Ogg/Vorbis):
    *   0 → WAV (RIFF/WAVE; a LIST chunk sits BEFORE `fmt ` when
    *     (doc_id/4)%2==1, odd-size and padded per RIFF, so the chunk
    *     walk — not a fixed offset — is load-bearing);
    *   1 → MP3 (MPEG-1 Layer III frame header; doc_id%3==0 prepends
    *     an ID3v2.3 tag of syncsafe size doc_id%100 to skip);
    *   2 → FLAC (fLaC magic + last-flag STREAMINFO block: 20-bit
    *     sample rate / 3-bit channels-1 / 5-bit bps-1 packed fields);
    *   3 → Ogg/Vorbis (OggS BOS page with a VARIABLE 1-3 entry
    *     segment table the parser must skip by count, then the
    *     0x01+"vorbis" id header: u8 channels, LE u32 rate, LE i32
    *     nominal bitrate).
    * doc_id%11==0 → first 2 bytes only (the truncated-crawl error
    * path; 11, not the image family's 13, so the two corrupt classes
    * don't shadow each other in cross-family queries).
    */
  private[graft] def synthAudioPayload(docId: Long,
      textBytes: Array[Byte]): Array[Byte] = {
    val body = textBytes.take(64)
    val full: Array[Byte] = (docId % 4) match {
      case 0 =>
        val channels = if (docId % 3 == 0) 2 else 1
        val rate = Array(8000, 16000, 22050, 44100, 48000)(
          (docId % 5).toInt)
        val bits = 8 * (1 + ((docId % 7) % 3)).toInt
        val hasList = (docId / 4) % 2 == 1
        val listLen = (docId % 9).toInt
        val listPad = listLen % 2
        val listBytes = if (hasList) 8 + listLen + listPad else 0
        val buf = java.nio.ByteBuffer
          .allocate(12 + listBytes + 24 + 8 + body.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put("RIFF".getBytes("US-ASCII"))
        buf.putInt(4 + listBytes + 24 + 8 + body.length)
        buf.put("WAVE".getBytes("US-ASCII"))
        if (hasList) {
          buf.put("LIST".getBytes("US-ASCII"))
          buf.putInt(listLen) // declared size odd when listLen odd —
          buf.put(Array.fill(listLen + listPad)('l'.toByte)) // pad byte
        }
        buf.put("fmt ".getBytes("US-ASCII"))
        buf.putInt(16)
        buf.putShort(1.toShort) // PCM
        buf.putShort(channels.toShort)
        buf.putInt(rate)
        buf.putInt(rate * channels * bits / 8) // byte rate
        buf.putShort((channels * bits / 8).toShort) // block align
        buf.putShort(bits.toShort)
        buf.put("data".getBytes("US-ASCII"))
        buf.putInt(body.length)
        buf.put(body)
        buf.array()
      case 1 =>
        val hasId3 = docId % 3 == 0
        val tagLen = (docId % 100).toInt // < 128: one syncsafe byte
        val id3Bytes = if (hasId3) 10 + tagLen else 0
        val bitrateIdx = (1 + docId % 14).toInt
        val srIdx = (docId % 3).toInt
        val mode = ((docId / 4) % 4).toInt // 3 = mono
        val buf = java.nio.ByteBuffer.allocate(id3Bytes + 4 + body.length)
        if (hasId3) {
          buf.put("ID3".getBytes("US-ASCII"))
          buf.put(3.toByte).put(0.toByte) // v2.3.0
          buf.put(0.toByte) // flags, no footer
          buf.put(0.toByte).put(0.toByte).put(0.toByte)
            .put(tagLen.toByte) // syncsafe u28
          buf.put(Array.fill(tagLen)('i'.toByte))
        }
        buf.put(0xFF.toByte).put(0xFB.toByte) // sync + MPEG-1 L3, no CRC
        buf.put(((bitrateIdx << 4) | (srIdx << 2)).toByte)
        buf.put((mode << 6).toByte)
        buf.put(body)
        buf.array()
      case 2 =>
        val rate = FlacRates((docId % 6).toInt)
        val channels = 1 + ((docId / 4) % 2).toInt
        val bits = 8 * (1 + ((docId % 7) % 3)).toInt
        val buf = java.nio.ByteBuffer.allocate(8 + 34 + body.length)
        buf.put("fLaC".getBytes("US-ASCII"))
        buf.put(0x80.toByte) // last-metadata-block, type 0 = STREAMINFO
        buf.put(0.toByte).put(0.toByte).put(34.toByte) // length u24 BE
        buf.putShort(4096.toShort) // min blocksize
        buf.putShort(4096.toShort) // max blocksize
        buf.put(0.toByte).put(0.toByte).put(0.toByte) // min framesize
        buf.put(0.toByte).put(0.toByte).put(0.toByte) // max framesize
        // packed: rate(20) | ch-1(3) | bps-1(5) | total samples(36)
        val packed = (rate.toLong << 44) |
          ((channels - 1).toLong << 41) |
          ((bits - 1).toLong << 36) | body.length.toLong
        buf.putLong(packed)
        buf.put(Array.fill(16)(0.toByte)) // md5 of raw audio (unused)
        buf.put(body)
        buf.array()
      case _ =>
        val nsegs = 1 + (docId % 3).toInt
        val channels = 1 + ((docId / 4) % 2).toInt
        val rate = Array(8000, 16000, 22050, 44100, 48000)(
          (docId % 5).toInt)
        val nominal = VorbisKbps(((docId / 4) % 10).toInt) * 1000
        val buf = java.nio.ByteBuffer
          .allocate(27 + nsegs + 30 + body.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put("OggS".getBytes("US-ASCII"))
        buf.put(0.toByte) // stream structure version
        buf.put(2.toByte) // header type: beginning-of-stream
        buf.putLong(0L) // granule position
        buf.putInt((docId % 256).toInt) // bitstream serial
        buf.putInt(0) // page sequence
        buf.putInt(0) // crc (unchecked by a header sniffer)
        buf.put(nsegs.toByte)
        buf.put(Array.fill(nsegs)(30.toByte)) // lacing values
        buf.put(1.toByte) // packet type: identification
        buf.put("vorbis".getBytes("US-ASCII"))
        buf.putInt(0) // vorbis version
        buf.put(channels.toByte)
        buf.putInt(rate)
        buf.putInt(0) // bitrate_maximum
        buf.putInt(nominal) // bitrate_nominal
        buf.putInt(0) // bitrate_minimum
        buf.put(0xB8.toByte) // blocksize_0/1 exponents
        buf.put(1.toByte) // framing flag
        buf.put(body)
        buf.array()
    }
    if (docId % 11 == 0) full.take(2) else full
  }

  /** Header-only audio parse from bytes alone: WAV RIFF-chunk walk to
    * `fmt ` (LE u16/u32 fields; sizes read unsigned into Long, odd
    * sizes pad — the PNG fuzz lesson), or ID3v2-skip + MPEG frame-
    * header decode (MPEG-1 Layer III only; free/bad bitrate and
    * reserved sample-rate indices parse to -1). Returns (format,
    * sample_rate, channels, bit_rate_bps); unparseable →
    * ("unknown",-1,-1,-1), recognized-but-truncated/invalid →
    * (fmt,-1,-1,-1).
    */
  private[graft] def parseAudioHeader(p: Array[Byte])
      : (String, Long, Long, Long) = {
    val none = -1L
    if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == 'F' && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' &&
        p(11) == 'E') {
      var off = 12L
      while (off + 8 <= p.length) {
        val o = off.toInt
        val fourcc = new String(p, o, 4, "US-ASCII")
        val size = le32u(p, o + 4)
        if (fourcc == "fmt ") {
          return if (o + 8 + 16 <= p.length && size >= 16L) {
            val ch = le16(p, o + 10).toLong
            val rate = le32u(p, o + 12)
            val bits = le16(p, o + 22).toLong
            if (ch > 0 && rate > 0 && bits > 0)
              ("wav", rate, ch, rate * ch * bits)
            else ("wav", none, none, none)
          } else ("wav", none, none, none)
        }
        off += 8L + size + (size & 1L)
      }
      ("wav", none, none, none)
    } else if (p.length >= 3 && p(0) == 'I' && p(1) == 'D' &&
        p(2) == '3') {
      if (p.length < 10) return ("mp3", none, none, none)
      val tagSize = ((p(6) & 0x7F).toLong << 21) |
        ((p(7) & 0x7F).toLong << 14) | ((p(8) & 0x7F).toLong << 7) |
        (p(9) & 0x7F).toLong
      val footer = if ((p(5) & 0x10) != 0) 10L else 0L
      parseMp3Frame(p, 10L + tagSize + footer)
    } else if (p.length >= 2 && (p(0) & 0xFF) == 0xFF &&
        (p(1) & 0xE0) == 0xE0) {
      parseMp3Frame(p, 0L)
    } else if (p.length >= 4 && p(0) == 'f' && p(1) == 'L' &&
        p(2) == 'a' && p(3) == 'C') {
      // FLAC: the spec mandates STREAMINFO (type 0, length 34) as the
      // FIRST metadata block — validate the block header, then unpack
      // the 20-bit rate / 3-bit channels-1 / 5-bit bps-1 fields
      if (p.length < 8 + 34 || (p(4) & 0x7F) != 0 ||
          ((p(5) & 0xFF) << 16 | (p(6) & 0xFF) << 8 | (p(7) & 0xFF))
            < 34)
        ("flac", none, none, none)
      else {
        val rate = ((p(18) & 0xFF).toLong << 12) |
          ((p(19) & 0xFF).toLong << 4) | ((p(20) & 0xF0) >> 4).toLong
        val ch = (((p(20) & 0x0E) >> 1) + 1).toLong
        val bits = ((((p(20) & 0x01) << 4) |
          ((p(21) & 0xF0) >> 4)) + 1).toLong
        if (rate > 0) ("flac", rate, ch, rate * ch * bits)
        else ("flac", none, none, none)
      }
    } else if (p.length >= 4 && p(0) == 'O' && p(1) == 'g' &&
        p(2) == 'g' && p(3) == 'S') {
      // Ogg: version-0 page header, then skip the VARIABLE-length
      // segment table by its count (byte 26) to the first packet — a
      // Vorbis identification header (0x01 "vorbis": u8 channels,
      // LE u32 rate, LE i32 nominal bitrate)
      if (p.length < 27 || p(4) != 0) ("ogg", none, none, none)
      else {
        val pk = 27 + (p(26) & 0xFF)
        if (pk + 30 > p.length || p(pk) != 1 ||
            new String(p, pk + 1, 6, "US-ASCII") != "vorbis")
          ("ogg", none, none, none)
        else {
          val ch = (p(pk + 11) & 0xFF).toLong
          val rate = le32u(p, pk + 12)
          val nominal = (le32u(p, pk + 20).toInt).toLong // i32
          if (ch > 0 && rate > 0) ("ogg", rate, ch, nominal)
          else ("ogg", none, none, none)
        }
      }
    } else ("unknown", none, none, none)
  }

  /** MPEG frame header at `off`: MPEG-1 (version bits 11) Layer III
    * (layer bits 01) only — other versions/layers, free/bad bitrate
    * (0/15) and the reserved sample-rate index (3) all return -1s.
    */
  private def parseMp3Frame(p: Array[Byte], off: Long)
      : (String, Long, Long, Long) = {
    val none = -1L
    if (off < 0 || off + 4 > p.length) return ("mp3", none, none, none)
    val o = off.toInt
    if ((p(o) & 0xFF) != 0xFF || (p(o + 1) & 0xE0) != 0xE0)
      return ("mp3", none, none, none)
    val version = (p(o + 1) >> 3) & 3
    val layer = (p(o + 1) >> 1) & 3
    if (version != 3 || layer != 1) return ("mp3", none, none, none)
    val bitrateIdx = (p(o + 2) >> 4) & 0xF
    val srIdx = (p(o + 2) >> 2) & 3
    if (bitrateIdx == 0 || bitrateIdx == 15 || srIdx == 3)
      return ("mp3", none, none, none)
    val mode = (p(o + 3) >> 6) & 3
    val channels = if (mode == 3) 1L else 2L
    ("mp3", Mp3RateByIndex(srIdx).toLong, channels,
      Mp3KbpsByIndex(bitrateIdx - 1).toLong * 1000L)
  }

  /** The synthetic media corpus: (doc_id, media_type, payload). */
  private def media(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents").select(
      col("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"))

  private val mediaTypeSql =
    "CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"

  /** Closed-form sniffed format of the synth payload (the doc_id%4
    * class map + the %13 truncation overlay) — shared by the three
    * parse-consuming oracles so the class map lives in ONE place.
    */
  private val fmtSql =
    """CASE WHEN doc_id % 13 = 0 THEN 'unknown'
      |    WHEN doc_id % 4 = 0 THEN 'png'
      |    WHEN doc_id % 4 = 1 THEN 'jpeg'
      |    WHEN doc_id % 4 = 2 THEN 'gif' ELSE 'webp' END""".stripMargin

  /** Closed-form synth payload byte length (see synthImagePayload). */
  private val nBytesSql =
    """CASE WHEN doc_id % 13 = 0 THEN 3
      |  WHEN doc_id % 4 = 0
      |    THEN 33 + LEAST(octet_length(encode(text)), 64)
      |  WHEN doc_id % 4 = 1
      |    THEN 39 + doc_id % 17
      |      + CASE WHEN doc_id % 3 = 0 THEN 5 + doc_id % 5 ELSE 0 END
      |      + LEAST(octet_length(encode(text)), 64)
      |  WHEN doc_id % 4 = 2
      |    THEN 13 + LEAST(octet_length(encode(text)), 64)
      |  ELSE CASE WHEN (doc_id // 4) % 3 = 1 THEN 25 ELSE 30 END
      |    + LEAST(octet_length(encode(text)), 64) END""".stripMargin

  /** Closed-form parsed-audio fields of the synth payload (see
    * synthAudioPayload): fmt / sample_rate / channels / bit_rate /
    * n_bytes as SELECT-list fragments over (doc_id, body) — shared by
    * both audio oracles so the class map lives in ONE place. Round 17
    * widened the map to FOUR families (doc_id%4: wav/mp3/flac/ogg).
    * The truncated class (%11) keeps 2 bytes: an un-tagged MP3's first
    * two bytes are the FF FB sync (recognized, fields -1) while WAV's
    * 'RI', a tagged MP3's 'ID', FLAC's 'fL' and Ogg's 'Og' are all
    * unrecognizable at 2 bytes.
    */
  private val audioFieldsSql =
    """CASE WHEN doc_id % 11 = 0 THEN
      |      CASE WHEN doc_id % 4 = 1 AND doc_id % 3 <> 0
      |        THEN 'mp3' ELSE 'unknown' END
      |    WHEN doc_id % 4 = 0 THEN 'wav'
      |    WHEN doc_id % 4 = 1 THEN 'mp3'
      |    WHEN doc_id % 4 = 2 THEN 'flac' ELSE 'ogg' END AS fmt,
      |  CASE WHEN doc_id % 11 = 0 THEN -1
      |    WHEN doc_id % 4 = 0 OR doc_id % 4 = 3 THEN
      |      CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
      |        WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END
      |    WHEN doc_id % 4 = 2 THEN
      |      CASE doc_id % 6 WHEN 0 THEN 8000 WHEN 1 THEN 16000
      |        WHEN 2 THEN 22050 WHEN 3 THEN 24000 WHEN 4 THEN 44100
      |        ELSE 48000 END
      |    ELSE CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
      |      ELSE 32000 END END AS sample_rate,
      |  CASE WHEN doc_id % 11 = 0 THEN -1
      |    WHEN doc_id % 4 = 0 THEN
      |      CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END
      |    WHEN doc_id % 4 = 1 THEN
      |      CASE WHEN (doc_id // 4) % 4 = 3 THEN 1 ELSE 2 END
      |    ELSE 1 + (doc_id // 4) % 2
      |    END AS channels,
      |  CASE WHEN doc_id % 11 = 0 THEN -1
      |    WHEN doc_id % 4 = 0 THEN
      |      (CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
      |         WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END)
      |      * (CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END)
      |      * (8 * (1 + (doc_id % 7) % 3))
      |    WHEN doc_id % 4 = 2 THEN
      |      (CASE doc_id % 6 WHEN 0 THEN 8000 WHEN 1 THEN 16000
      |         WHEN 2 THEN 22050 WHEN 3 THEN 24000 WHEN 4 THEN 44100
      |         ELSE 48000 END)
      |      * (1 + (doc_id // 4) % 2)
      |      * (8 * (1 + (doc_id % 7) % 3))
      |    WHEN doc_id % 4 = 3 THEN
      |      1000 * (CASE (doc_id // 4) % 10
      |        WHEN 0 THEN 64 WHEN 1 THEN 80 WHEN 2 THEN 96
      |        WHEN 3 THEN 112 WHEN 4 THEN 128 WHEN 5 THEN 160
      |        WHEN 6 THEN 192 WHEN 7 THEN 224 WHEN 8 THEN 256
      |        ELSE 320 END)
      |    ELSE 1000 * (CASE 1 + doc_id % 14
      |      WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48
      |      WHEN 4 THEN 56 WHEN 5 THEN 64 WHEN 6 THEN 80
      |      WHEN 7 THEN 96 WHEN 8 THEN 112 WHEN 9 THEN 128
      |      WHEN 10 THEN 160 WHEN 11 THEN 192 WHEN 12 THEN 224
      |      WHEN 13 THEN 256 ELSE 320 END) END AS bit_rate,
      |  CASE WHEN doc_id % 11 = 0 THEN 2
      |    WHEN doc_id % 4 = 0 THEN 44
      |      + CASE WHEN (doc_id // 4) % 2 = 1
      |          THEN 8 + (doc_id % 9) + (doc_id % 9) % 2 ELSE 0 END
      |      + body
      |    WHEN doc_id % 4 = 2 THEN 42 + body
      |    WHEN doc_id % 4 = 3 THEN 58 + (doc_id % 3) + body
      |    ELSE 4
      |      + CASE WHEN doc_id % 3 = 0 THEN 10 + doc_id % 100 ELSE 0 END
      |      + body END AS n_bytes""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- metadata extraction over opaque binary payloads ---
    "q_multimodal_meta" -> ((s, d) =>
      media(s, d).select(
        col("doc_id"), col("media_type"),
        lng(length(col("payload"))).as("n_bytes"),
        md5(col("payload")).as("fp"),
        hex(substring(col("payload"), 1, 4)).as("magic"))
        .orderBy("doc_id")),

    // --- exact media dedup census (round 9): per media type, the
    // byte-identical duplicate profile over payload fingerprints — the
    // first pass every multimodal ingest runs (identical images/clips
    // re-crawled under different ids dominate raw web media). One
    // groupBy on the md5 fingerprint (the only corpus shuffle, moving
    // 16-byte digests, never payloads), then an O(types) rollup. ---
    "q_dedup_media" -> ((s, d) =>
      media(s, d)
        .groupBy(col("media_type"), md5(col("payload")).as("fp"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .groupBy("media_type")
        .agg(count(lit(1)).as("n_unique"),
          sum("n_copies").as("n_total"),
          sum(col("n_copies") - 1).as("n_dropped"),
          max("n_copies").as("max_copies"))
        .withColumn("dup_rate",
          col("n_dropped").cast("double") / col("n_total"))
        .orderBy("media_type")),

    // --- typed partition-batched decode (stubbed codec) ---
    "q_multimodal_decode" -> ((s, d) => {
      import s.implicits._
      media(s, d).as[MediaRow]
        .mapPartitions(_.grouped(DecodeBatchSize).flatMap(decodeBatch))
        .toDF()
        .orderBy("doc_id")
    }),

    // --- resize planning: aspect-preserving fit into 224x224 plus
    // letterbox padding, per decoded payload — the geometry pass a real
    // preprocessing fleet runs BEFORE the GPU stage (batches group by
    // output geometry; padding is computed once per item, not per
    // batch). The codec stays stubbed; the planning arithmetic is exact
    // int64 (w*224 div max(w,h)) so the plan hashes identically on both
    // engines, and it rides the same typed batched decode as
    // q_multimodal_decode — one more map-side projection, not a second
    // decode pass. ---
    "q_multimodal_resize" -> ((s, d) => {
      import s.implicits._
      media(s, d).as[MediaRow]
        .mapPartitions(_.grouped(DecodeBatchSize).flatMap(decodeBatch))
        .toDF()
        .select(col("doc_id"), col("media_type"),
          col("width"), col("height"),
          expr("width * 224 div greatest(width, height)").as("out_w"),
          expr("height * 224 div greatest(width, height)").as("out_h"))
        .withColumn("pad_w", lit(224L) - col("out_w"))
        .withColumn("pad_h", lit(224L) - col("out_h"))
        .orderBy("doc_id")
    }),

    // --- frame sampling: every 10th frame index of each video ---
    "q_multimodal_frames" -> ((s, d) => {
      import s.implicits._
      media(s, d).as[MediaRow]
        .mapPartitions(_.grouped(DecodeBatchSize).flatMap(decodeBatch))
        .toDF()
        .filter(col("media_type") === "video")
        .select(col("doc_id"), col("n_frames"),
          explode(sequence(lit(0L), col("n_frames") - 1L, lit(10L)))
            .as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"),
          (col("frame_idx") * 256L).as("byte_offset"))
        .orderBy("doc_id", "frame_idx")
    }),

    // --- REAL header-geometry parse (round 14; GIF/WebP round 15):
    // synthesize a structurally genuine PNG/JFIF/GIF/WebP container
    // per doc, then recover (format, width, height) FROM THE BYTES —
    // signature check, PNG chunk walk, JPEG marker-segment walk with
    // per-doc-variable SOF offsets (padded APP0, optional COM), GIF
    // logical-screen read, RIFF chunk walk dispatching on
    // VP8/VP8L/VP8X, plus the truncated-payload error path. This replaces the one place the multimodal family
    // leaned on a stub with the byte arithmetic a real ingest's header
    // sniffer runs; the decode/feature stage above remains the
    // declared codec stub. Map-side only (one pass, no shuffle before
    // the output sort); at 100 TB the parse reads the first ~60 bytes
    // of each payload — a metadata pass, not a decode. Oracle: the
    // synth layout is deterministic, so every field is closed-form in
    // doc_id + text length; the parser is additionally pinned against
    // hand-built golden byte vectors (ImageHeaderSpec) so synth and
    // parse cannot share a compensating bug. ---
    "q_image_dims" -> ((s, d) => {
      import s.implicits._
      table(s, d, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val payload = synthImagePayload(id,
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val (fmt, w, h) = parseImageHeader(payload)
          (id, payload.length.toLong, fmt, w, h)
        })
        .toDF("doc_id", "n_bytes", "fmt", "width", "height")
        .orderBy("doc_id")
    }),

    // --- aspect-ratio census over PARSED headers (round 15): per
    // container format, orientation counts and the mean width:height
    // ratio in integer permille — the geometry profile a preprocessing
    // fleet reads before choosing resize/letterbox buckets (and the
    // first consumer of the round-15 GIF/WebP walks beyond the dims
    // roundtrip itself). Corrupt payloads (dims -1) are excluded, the
    // error-path census being q_image_dims' job. Map-side parse, one
    // O(formats) aggregate; per-row ratio is exact integer
    // w*1000 div h, the mean is ONE terminal division. ---
    "q_image_aspect" -> ((s, d) => {
      import s.implicits._
      table(s, d, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val payload = synthImagePayload(id,
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val (fmt, w, h) = parseImageHeader(payload)
          (id, fmt, w, h)
        })
        .toDF("doc_id", "fmt", "width", "height")
        .filter(col("width") > 0)
        .groupBy("fmt")
        .agg(count(lit(1)).as("n"),
          sum((col("width") > col("height")).cast("long"))
            .as("n_landscape"),
          sum((col("width") < col("height")).cast("long"))
            .as("n_portrait"),
          sum((col("width") === col("height")).cast("long"))
            .as("n_square"),
          sum(expr("width * 1000 div height")).cast("long")
            .as("sum_ratio_pm"))
        .withColumn("avg_ratio_pm",
          col("sum_ratio_pm").cast("double") / col("n"))
        .orderBy("fmt")
    }),

    // --- format x source mix over PARSED formats (round 15): the
    // ingest census a multimodal crawl opens with — how many payloads
    // of each sniffed container each source contributes, their byte
    // budgets, and each format's byte share within its source (the
    // truncated/unknown class kept as its own row: unparseable bytes
    // are a provisioning line item too). Same map-side parse; one
    // (source, fmt) aggregate + a broadcast O(sources) rollup. ---
    "q_media_format_mix" -> ((s, d) => {
      import s.implicits._
      val parsed = table(s, d, "documents")
        .select(col("doc_id"), col("source"), col("text"))
        .as[(Long, String, String)]
        .mapPartitions(_.map { case (id, src, text) =>
          val p = synthImagePayload(id,
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val (fmt, _, _) = parseImageHeader(p)
          (id, src, fmt, p.length.toLong)
        })
        .toDF("doc_id", "source", "fmt", "nb")
      val cells = parsed.groupBy("source", "fmt")
        .agg(count(lit(1)).as("n_items"), sum("nb").as("n_bytes"))
      val tot = cells.groupBy("source").agg(sum("n_bytes").as("sb"))
      cells.join(broadcast(tot), "source")
        .select(col("source"), col("fmt"), col("n_items"),
          col("n_bytes"),
          (col("n_bytes").cast("double") / col("sb")).as("byte_share"))
        .orderBy("source", "fmt")
    }),

    // --- REAL audio-header parse (round 16, r15 ask #6): synthesize a
    // structurally genuine WAV (RIFF chunk walk, LIST chunk before
    // `fmt ` on a quarter of the corpus so fixed offsets cannot pass)
    // or MP3 (ID3v2 syncsafe-size skip + MPEG-1 Layer III frame
    // header with table-indexed bitrate/sample-rate) per doc, then
    // recover (format, sample_rate, channels, bit_rate) FROM THE
    // BYTES, plus the exact-integer duration estimate
    // body_bytes·8000 div bit_rate a provisioning pass derives.
    // Map-side only; at 100 TB the parse reads the first ~120 bytes
    // of each payload — a metadata pass, like q_image_dims. Oracle:
    // closed-form in doc_id + text length; the parser is additionally
    // pinned against hand-built golden vectors + fuzz
    // (AudioHeaderSpec) so synth and parse cannot share a
    // compensating bug. ---
    "q_audio_meta" -> ((s, d) => {
      import s.implicits._
      table(s, d, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val tb = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val payload = synthAudioPayload(id, tb)
          val (fmt, rate, ch, bps) = parseAudioHeader(payload)
          val durMs =
            if (bps > 0) math.min(tb.length, 64).toLong * 8000L / bps
            else -1L
          (id, payload.length.toLong, fmt, rate, ch, bps, durMs)
        })
        .toDF("doc_id", "n_bytes", "fmt", "sample_rate", "channels",
          "bit_rate", "duration_ms")
        .orderBy("doc_id")
    }),

    // --- audio fleet profile over PARSED headers (round 16): per
    // container format, mono/stereo counts, the distinct sample-rate
    // census, and byte/duration budgets — the provisioning card an
    // audio ingest reads before choosing resample buckets (the audio
    // sibling of q_image_aspect). Parse failures are excluded here;
    // the error census is q_audio_meta's job. Map-side parse, one
    // O(formats) aggregate; mean bitrate is ONE terminal division. ---
    "q_audio_profile" -> ((s, d) => {
      import s.implicits._
      table(s, d, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val tb = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val (fmt, rate, ch, bps) = parseAudioHeader(
            synthAudioPayload(id, tb))
          val durMs =
            if (bps > 0) math.min(tb.length, 64).toLong * 8000L / bps
            else -1L
          (id, fmt, rate, ch, bps, durMs)
        })
        .toDF("doc_id", "fmt", "sample_rate", "channels", "bit_rate",
          "duration_ms")
        .filter(col("sample_rate") > 0)
        .groupBy("fmt")
        .agg(count(lit(1)).as("n"),
          sum((col("channels") === 1L).cast("long")).as("n_mono"),
          sum((col("channels") === 2L).cast("long")).as("n_stereo"),
          countDistinct("sample_rate").as("n_rates"),
          sum("bit_rate").as("sum_bps"),
          sum("duration_ms").as("total_ms"))
        .withColumn("avg_bps",
          col("sum_bps").cast("double") / col("n"))
        .orderBy("fmt")
    }),

    // --- multimodal mix card (round 10): per (source, media type),
    // item and BYTE budgets plus each type's byte share within its
    // source — the mixture table a multimodal pretraining run is
    // provisioned from (tokens are budgeted per modality by bytes
    // long before any decoder runs, so this is a metadata-only pass:
    // the payload column contributes one length per row and is never
    // decoded). Exact int64 byte sums; shares are terminal divisions
    // against a broadcast O(sources) rollup. ---
    "q_multimodal_mix" -> ((s, d) => {
      val m = table(s, d, "documents")
        .join(media(s, d), "doc_id")
        .select(col("source"), col("media_type"),
          lng(length(col("payload"))).as("nb"))
      val cells = m.groupBy("source", "media_type")
        .agg(count(lit(1)).as("n_items"), sum("nb").as("n_bytes"))
      val tot = cells.groupBy("source")
        .agg(sum("n_bytes").as("src_bytes"))
      cells.join(broadcast(tot), "source")
        .select(col("source"), col("media_type"), col("n_items"),
          col("n_bytes"),
          (col("n_bytes").cast("double") / col("src_bytes"))
            .as("byte_share"))
        .orderBy("source", "media_type")
    })
  )

  override def oracle: Map[String, String] = Map(
    // every field is closed-form in doc_id + byte length because the
    // synth layout is deterministic: PNG = 8 sig + 25 IHDR chunk +
    // min(body,64); JPEG = 2 SOI + (18+pad) APP0 + optional (4+k) COM
    // + 19 SOF0 + min(body,64); GIF = 13-byte header + min(body,64);
    // WebP = 12 RIFF + 8 chunk header + (5 VP8L | 10 VP8/VP8X)
    // payload + min(body,64); corrupt class keeps 3 bytes
    "q_image_dims" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 13 = 0 THEN 3
        |    WHEN doc_id % 4 = 0
        |      THEN 33 + LEAST(octet_length(encode(text)), 64)
        |    WHEN doc_id % 4 = 1
        |      THEN 39 + doc_id % 17
        |        + CASE WHEN doc_id % 3 = 0 THEN 5 + doc_id % 5 ELSE 0 END
        |        + LEAST(octet_length(encode(text)), 64)
        |    WHEN doc_id % 4 = 2
        |      THEN 13 + LEAST(octet_length(encode(text)), 64)
        |    ELSE CASE WHEN (doc_id // 4) % 3 = 1 THEN 25 ELSE 30 END
        |      + LEAST(octet_length(encode(text)), 64) END AS BIGINT)
        |    AS n_bytes,
        |  CASE WHEN doc_id % 13 = 0 THEN 'unknown'
        |    WHEN doc_id % 4 = 0 THEN 'png'
        |    WHEN doc_id % 4 = 1 THEN 'jpeg'
        |    WHEN doc_id % 4 = 2 THEN 'gif' ELSE 'webp' END AS fmt,
        |  CAST(CASE WHEN doc_id % 13 = 0 THEN -1
        |    ELSE 16 + doc_id % 2048 END AS BIGINT) AS width,
        |  CAST(CASE WHEN doc_id % 13 = 0 THEN -1
        |    ELSE 16 + (doc_id * 7) % 2048 END AS BIGINT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_image_aspect" ->
      s"""WITH dims AS (
         |  SELECT $fmtSql AS fmt,
         |    16 + doc_id % 2048 AS w, 16 + (doc_id * 7) % 2048 AS h
         |  FROM documents WHERE doc_id % 13 <> 0)
         |SELECT fmt, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN w > h THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_landscape,
         |  CAST(SUM(CASE WHEN w < h THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_portrait,
         |  CAST(SUM(CASE WHEN w = h THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_square,
         |  CAST(SUM(w * 1000 // h) AS BIGINT) AS sum_ratio_pm,
         |  CAST(SUM(w * 1000 // h) AS DOUBLE) / COUNT(*)
         |    AS avg_ratio_pm
         |FROM dims GROUP BY fmt ORDER BY fmt""".stripMargin,

    "q_media_format_mix" ->
      s"""WITH m AS (SELECT source, $fmtSql AS fmt,
         |    CAST($nBytesSql AS BIGINT) AS nb FROM documents),
         |cells AS (SELECT source, fmt,
         |    CAST(COUNT(*) AS BIGINT) AS n_items,
         |    CAST(SUM(nb) AS BIGINT) AS n_bytes
         |  FROM m GROUP BY 1, 2),
         |t AS (SELECT source, CAST(SUM(n_bytes) AS BIGINT) AS sb
         |  FROM cells GROUP BY 1)
         |SELECT source, fmt, n_items, n_bytes,
         |  CAST(n_bytes AS DOUBLE) / sb AS byte_share
         |FROM cells JOIN t USING (source)
         |ORDER BY source, fmt""".stripMargin,

    "q_audio_meta" ->
      s"""WITH f AS (SELECT doc_id,
         |    LEAST(octet_length(encode(text)), 64) AS body
         |  FROM documents),
         |a AS (SELECT doc_id, body, $audioFieldsSql
         |  FROM f)
         |SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes, fmt,
         |  CAST(sample_rate AS BIGINT) AS sample_rate,
         |  CAST(channels AS BIGINT) AS channels,
         |  CAST(bit_rate AS BIGINT) AS bit_rate,
         |  CAST(CASE WHEN bit_rate > 0 THEN body * 8000 // bit_rate
         |    ELSE -1 END AS BIGINT) AS duration_ms
         |FROM a ORDER BY doc_id""".stripMargin,

    "q_audio_profile" ->
      s"""WITH f AS (SELECT doc_id,
         |    LEAST(octet_length(encode(text)), 64) AS body
         |  FROM documents),
         |a AS (SELECT doc_id, body, $audioFieldsSql
         |  FROM f)
         |SELECT fmt, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN channels = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_mono,
         |  CAST(SUM(CASE WHEN channels = 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_stereo,
         |  CAST(COUNT(DISTINCT sample_rate) AS BIGINT) AS n_rates,
         |  CAST(SUM(bit_rate) AS BIGINT) AS sum_bps,
         |  CAST(SUM(body * 8000 // bit_rate) AS BIGINT) AS total_ms,
         |  CAST(SUM(bit_rate) AS DOUBLE) / COUNT(*) AS avg_bps
         |FROM a WHERE sample_rate > 0
         |GROUP BY fmt ORDER BY fmt""".stripMargin,

    "q_multimodal_mix" ->
      s"""WITH m AS (SELECT source, $mediaTypeSql AS media_type,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS nb
         |  FROM documents),
         |cells AS (SELECT source, media_type,
         |    CAST(COUNT(*) AS BIGINT) AS n_items,
         |    CAST(SUM(nb) AS BIGINT) AS n_bytes
         |  FROM m GROUP BY 1, 2),
         |t AS (SELECT source, CAST(SUM(n_bytes) AS BIGINT) AS src_bytes
         |  FROM cells GROUP BY 1)
         |SELECT source, media_type, n_items, n_bytes,
         |  CAST(n_bytes AS DOUBLE) / src_bytes AS byte_share
         |FROM cells JOIN t USING (source)
         |ORDER BY source, media_type""".stripMargin,

    "q_dedup_media" ->
      s"""WITH u AS (SELECT $mediaTypeSql AS media_type, md5(text) AS fp,
         |    CAST(MIN(doc_id) AS BIGINT) AS keep_id,
         |    CAST(COUNT(*) AS BIGINT) AS n_copies
         |  FROM documents GROUP BY 1, 2)
         |SELECT media_type, CAST(COUNT(*) AS BIGINT) AS n_unique,
         |  CAST(SUM(n_copies) AS BIGINT) AS n_total,
         |  CAST(SUM(n_copies - 1) AS BIGINT) AS n_dropped,
         |  CAST(MAX(n_copies) AS BIGINT) AS max_copies,
         |  CAST(SUM(n_copies - 1) AS DOUBLE) / SUM(n_copies) AS dup_rate
         |FROM u GROUP BY media_type ORDER BY media_type""".stripMargin,

    "q_multimodal_meta" ->
      s"""SELECT doc_id, $mediaTypeSql AS media_type,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  md5(text) AS fp,
         |  hex(encode(substring(text, 1, 4))) AS magic
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_multimodal_decode" ->
      s"""SELECT doc_id, $mediaTypeSql AS media_type,
         |  CAST(64 + ord(substring(text, 1, 1)) % 64 AS BIGINT) AS width,
         |  CAST(64 + ord(substring(text, length(text), 1)) % 64 AS BIGINT)
         |    AS height,
         |  CAST(CASE WHEN doc_id % 3 = 2
         |       THEN octet_length(encode(text)) // 256 + 1 ELSE 1 END
         |    AS BIGINT) AS n_frames
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_multimodal_resize" ->
      s"""WITH dec AS (
         |  SELECT doc_id, $mediaTypeSql AS media_type,
         |    CAST(64 + ord(substring(text, 1, 1)) % 64 AS BIGINT) AS width,
         |    CAST(64 + ord(substring(text, length(text), 1)) % 64
         |      AS BIGINT) AS height
         |  FROM documents)
         |SELECT doc_id, media_type, width, height,
         |  CAST(width * 224 // greatest(width, height) AS BIGINT) AS out_w,
         |  CAST(height * 224 // greatest(width, height) AS BIGINT) AS out_h,
         |  CAST(224 - width * 224 // greatest(width, height) AS BIGINT)
         |    AS pad_w,
         |  CAST(224 - height * 224 // greatest(width, height) AS BIGINT)
         |    AS pad_h
         |FROM dec ORDER BY doc_id""".stripMargin,

    "q_multimodal_frames" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    CAST(octet_length(encode(text)) // 256 + 1 AS BIGINT) AS n_frames
         |  FROM documents WHERE doc_id % 3 = 2)
         |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
         |       CAST(frame_idx * 256 AS BIGINT) AS byte_offset
         |FROM f, unnest(generate_series(0, n_frames - 1, 10)) AS t(frame_idx)
         |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
