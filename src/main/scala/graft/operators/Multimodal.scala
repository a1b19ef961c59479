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

  /** Deterministic synthetic image payload with a REAL container
    * header. Even doc_id → PNG (signature + IHDR + 64B body); odd →
    * JPEG (SOI + APP0 padded by doc_id%17 + COM of 1+doc_id%5 bytes
    * when doc_id%3==0 + SOF0 + body). doc_id%13==0 → the first 3
    * bytes only (a truncated crawl artifact — the error path every
    * header sniffer needs).
    */
  private[graft] def synthImagePayload(docId: Long,
      textBytes: Array[Byte]): Array[Byte] = {
    val w = (16 + docId % 2048).toInt
    val h = (16 + (docId * 7) % 2048).toInt
    val body = textBytes.take(64)
    val full: Array[Byte] =
      if (docId % 2 == 0) {
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
    * or JPEG marker-segment walk to the first SOF{0-3,5-7,9-11,13-15}.
    * Returns (format, width, height); unparseable → ("unknown",-1,-1),
    * recognized-but-truncated → (fmt,-1,-1).
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
    } else ("unknown", -1L, -1L)
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

    // --- REAL header-geometry parse (round 14): synthesize a
    // structurally genuine PNG/JFIF container per doc, then recover
    // (format, width, height) FROM THE BYTES — signature check, PNG
    // chunk walk, JPEG marker-segment walk with per-doc-variable SOF
    // offsets (padded APP0, optional COM), plus the truncated-payload
    // error path. This replaces the one place the multimodal family
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
    // + 19 SOF0 + min(body,64); corrupt class keeps 3 bytes
    "q_image_dims" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 13 = 0 THEN 3
        |    WHEN doc_id % 2 = 0
        |      THEN 33 + LEAST(octet_length(encode(text)), 64)
        |    ELSE 39 + doc_id % 17
        |      + CASE WHEN doc_id % 3 = 0 THEN 5 + doc_id % 5 ELSE 0 END
        |      + LEAST(octet_length(encode(text)), 64) END AS BIGINT)
        |    AS n_bytes,
        |  CASE WHEN doc_id % 13 = 0 THEN 'unknown'
        |    WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
        |  CAST(CASE WHEN doc_id % 13 = 0 THEN -1
        |    ELSE 16 + doc_id % 2048 END AS BIGINT) AS width,
        |  CAST(CASE WHEN doc_id % 13 = 0 THEN -1
        |    ELSE 16 + (doc_id * 7) % 2048 END AS BIGINT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,

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
