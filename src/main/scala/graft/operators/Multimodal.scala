package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as `binary` payloads carrying REAL
  * container byte layouts (BMP / canonical WAV / RIFF-AVI headers), with
  * two independent decoders that parse metadata back OUT of the bytes:
  *
  *   - [[mediaDecodeCols]] — pure column expressions
  *     (`substring`/`hex`/`conv` little-endian reads), codegen'd, the
  *     100 TB path: the scan projects only the header prefix it needs.
  *   - [[mediaDecodeBatch]] — a partition-iterator `ByteBuffer` parse,
  *     the shape a real codec binding has (iterator in / iterator out,
  *     one decoder instance per partition, a malformed payload yields an
  *     invalid ROW — never a task failure; the reference's
  *     NumberFormatException-kills-the-job lesson, SURVEY.md §1.3).
  *
  * The container synthesis ([[mediaContainers]]) is pure byte arithmetic
  * over published layouts — BITMAPFILEHEADER+BITMAPINFOHEADER (54 bytes),
  * the 44-byte canonical PCM WAV header, and RIFF/LIST/avih with the
  * 56-byte MainAVIHeader — no codec library involved, so the PIXEL/SAMPLE
  * data is the document's UTF-8 bytes standing in for real media content.
  * Decoding, though, is the real thing: every output field is read back
  * from byte offsets, and the oracle states the expected values
  * INDEPENDENTLY (from doc_id formulas), so a wrong offset in either the
  * writer or the parser breaks the hash — the two cannot cancel out.
  *
  * The dedup / near-dup family ([[mediaDedup]], [[mediaSimhashPairs]])
  * deliberately stays on the opaque-bytes table ([[mediaTable]]): content
  * addressing treats payloads as arbitrary bytes, container or not.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
      width: Long, height: Long)

  /** Container-decoded metadata: one row per payload, `valid` = 0 and -1
    * sentinels (container `"none"`) when the bytes don't carry a complete
    * well-formed header. Fields not applicable to a container are -1
    * (e.g. `sample_rate` for images).
    */
  case class DecodedMedia(doc_id: Long, container: String, valid: Long,
      width: Long, height: Long, bit_depth: Long, sample_rate: Long,
      channels: Long, total_frames: Long, data_bytes: Long)

  /** (doc_id, payload) projection row — public because Spark's encoder
    * codegen constructs it from generated Java.
    */
  case class PayloadRow(doc_id: Long, payload: Array[Byte])

  // ---------------------------------------------------------------------
  // Byte synthesis — column-only little-endian writers.
  // ---------------------------------------------------------------------

  /** Low byte of `v` as a 2-hex-char string (Spark `hex` is uppercase). */
  private def byteHex(v: Column): Column =
    lpad(hex(pmod(v, lit(256L))), 2, "0")

  /** Little-endian uint16 as 2 binary bytes. */
  private def le16(v: Column): Column =
    unhex(concat(byteHex(v), byteHex(shiftright(v, 8))))

  /** Little-endian uint32 as 4 binary bytes. */
  private def le32(v: Column): Column =
    unhex(concat(byteHex(v), byteHex(shiftright(v, 8)),
      byteHex(shiftright(v, 16)), byteHex(shiftright(v, 24))))

  private def ascii(s: String): Column = encode(lit(s), "UTF-8")
  private def zeros(n: Int): Column = unhex(lit("00" * n))

  /** Synthesize REAL container payloads from documents: doc_id%3 picks
    * the medium (0 image → BMP, 1 audio → WAV, 2 video → AVI), the
    * document's UTF-8 bytes are the data region, and the metadata fields
    * are deterministic doc_id formulas (which is what lets the DuckDB
    * oracle state the expected DECODE output without reconstructing the
    * bytes). Every 97th row is truncated to its first 6 bytes — a
    * mid-header corruption both decoders must survive.
    *
    * Layouts (all little-endian, offsets 0-based):
    *   BMP  — "BM", bfSize, reserved, bfOffBits=54 | biSize=40, biWidth@18,
    *          biHeight@22, planes=1, biBitCount=24@28, compression=0,
    *          biSizeImage@34, 2835 dpi ×2, clrUsed/Important | data.
    *   WAV  — "RIFF", size=36+data, "WAVE" | "fmt ", 16, PCM=1,
    *          channels@22, sampleRate@24, byteRate, blockAlign,
    *          bitsPerSample=16@34 | "data", dataSize@40 | samples.
    *   AVI  — "RIFF", size=80+data, "AVI " | "LIST", 68, "hdrl" | "avih",
    *          cb=56 | MainAVIHeader: µsPerFrame, maxBytesPerSec, padding,
    *          flags, dwTotalFrames@48, initialFrames, streams=1,
    *          sugBufSize, dwWidth@64, dwHeight@68, reserved[4] | data.
    *          (Header-only AVI: no strl/movi lists — we parse, not play.)
    */
  def mediaContainers(docs: DataFrame): DataFrame = {
    val data = encode(col("text"), "UTF-8")
    val dataLen = length(data).cast("long")
    // BMP dims are kept small (2..301 × 2..201) because the pixel array
    // is REAL: BI_RGB rows padded to 4-byte stride, so the payload is a
    // fully decodable bitmap (the JDK's own BMPImageReader validates
    // width·height·3 against the declared sizes — a header-only fake
    // fails it). Pixel bytes = the document text, zero-padded/truncated
    // to exactly stride·height.
    val wB = (col("doc_id") % 300 + 2).cast("long")
    val hB = (col("doc_id") % 200 + 2).cast("long")
    val stride = floor((wB * 3 + 3) / lit(4)).cast("long") * 4
    val bmpLen = stride * hB
    val bmpData = call_function("rpad", data, bmpLen.cast("int"),
      lit(Array[Byte](0)))
    val w = (col("doc_id") % 640 + 1).cast("long")
    val h = (col("doc_id") % 480 + 1).cast("long")
    val sampleRate = element_at(lit(Array(8000L, 16000L, 22050L, 44100L)),
      (col("doc_id") % 4 + 1).cast("int"))
    val channels = (col("doc_id") % 2 + 1).cast("long")
    val frames = (col("doc_id") % 5 + 1).cast("long")
    val bmp = concat(ascii("BM"), le32(bmpLen + 54), le32(lit(0L)),
      le32(lit(54L)),
      le32(lit(40L)), le32(wB), le32(hB), le16(lit(1L)), le16(lit(24L)),
      le32(lit(0L)), le32(bmpLen), le32(lit(2835L)), le32(lit(2835L)),
      le32(lit(0L)), le32(lit(0L)), bmpData)
    val blockAlign = channels * 2 // 16-bit PCM
    val wav = concat(ascii("RIFF"), le32(dataLen + 36), ascii("WAVE"),
      ascii("fmt "), le32(lit(16L)), le16(lit(1L)), le16(channels),
      le32(sampleRate), le32(sampleRate * blockAlign), le16(blockAlign),
      le16(lit(16L)), ascii("data"), le32(dataLen), data)
    val avi = concat(ascii("RIFF"), le32(dataLen + 80), ascii("AVI "),
      ascii("LIST"), le32(lit(68L)), ascii("hdrl"), ascii("avih"),
      le32(lit(56L)),
      le32(lit(33333L)), le32(lit(0L)), le32(lit(0L)), le32(lit(0L)),
      le32(frames), le32(lit(0L)), le32(lit(1L)), le32(lit(0L)),
      le32(w), le32(h), zeros(16), data)
    val full = when(col("doc_id") % 3 === 0, bmp)
      .when(col("doc_id") % 3 === 1, wav)
      .otherwise(avi)
    docs.select(col("doc_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      when(col("doc_id") % 97 === 0, substring(full, 1, 6))
        .otherwise(full).as("payload"))
  }

  // ---------------------------------------------------------------------
  // Decode path 1: column expressions (codegen'd; the at-scale path).
  // ---------------------------------------------------------------------

  /** Little-endian unsigned read of `n` bytes at 0-based `off` — each
    * byte via substring→hex→conv, weighted by 256^i. Codegen-friendly
    * (all built-ins) and prunable: only the header prefix of `payload`
    * is touched.
    */
  private def leRead(payload: Column, off: Int, n: Int): Column =
    (0 until n).map { i =>
      conv(hex(substring(payload, off + i + 1, 1)), 16, 10).cast("long") *
        lit(1L << (8 * i))
    }.reduce(_ + _)

  /** Magic-tag check: `len` bytes at 0-based `off` equal the ASCII tag.
    * Compared in hex to stay byte-exact on arbitrary binary.
    */
  private def tagIs(payload: Column, off: Int, tag: String): Column =
    hex(substring(payload, off + 1, tag.length)) ===
      tag.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").mkString

  /** Parse container metadata back out of the payload BYTES with column
    * expressions only. Detection requires both the magic AND the full
    * fixed header to be present; anything else (truncated, wrong magic,
    * empty) yields a `valid = 0` sentinel row — never an error.
    */
  def mediaDecodeCols(media: DataFrame): DataFrame = {
    val p = col("payload")
    val n = length(p).cast("long")
    val isRiff = tagIs(p, 0, "RIFF")
    val isBmp = n >= 54 && tagIs(p, 0, "BM")
    val isWav = n >= 44 && isRiff && tagIs(p, 8, "WAVE")
    val isAvi = n >= 88 && isRiff && tagIs(p, 8, "AVI ")
    val neg = lit(-1L)
    media.select(col("doc_id"),
      when(isBmp, "bmp").when(isWav, "wav").when(isAvi, "avi")
        .otherwise("none").as("container"),
      when(isBmp || isWav || isAvi, 1L).otherwise(0L).as("valid"),
      when(isBmp, leRead(p, 18, 4)).when(isAvi, leRead(p, 64, 4))
        .otherwise(neg).as("width"),
      when(isBmp, leRead(p, 22, 4)).when(isAvi, leRead(p, 68, 4))
        .otherwise(neg).as("height"),
      when(isBmp, leRead(p, 28, 2)).when(isWav, leRead(p, 34, 2))
        .otherwise(neg).as("bit_depth"),
      when(isWav, leRead(p, 24, 4)).otherwise(neg).as("sample_rate"),
      when(isWav, leRead(p, 22, 2)).otherwise(neg).as("channels"),
      when(isAvi, leRead(p, 48, 4)).otherwise(neg).as("total_frames"),
      when(isBmp, leRead(p, 34, 4)).when(isWav, leRead(p, 40, 4))
        .when(isAvi, leRead(p, 4, 4) - 80).otherwise(neg).as("data_bytes"))
  }

  // ---------------------------------------------------------------------
  // Decode path 2: partition-iterator ByteBuffer parse (the codec-binding
  // shape). Spec-pinned equal to mediaDecodeCols; both share one oracle.
  // ---------------------------------------------------------------------

  /** Decode one payload; total function — malformed bytes return the
    * invalid sentinel row, never throw.
    */
  private[graft] def decodeOne(id: Long, bytes: Array[Byte]): DecodedMedia = {
    val invalid =
      DecodedMedia(id, "none", 0L, -1L, -1L, -1L, -1L, -1L, -1L, -1L)
    val n = if (bytes == null) 0 else bytes.length
    if (n == 0) return invalid
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def u32(off: Int): Long = bb.getInt(off).toLong & 0xffffffffL
    def u16(off: Int): Long = bb.getShort(off).toLong & 0xffffL
    def tag(off: Int, s: String): Boolean =
      n >= off + s.length &&
        s.indices.forall(i => bytes(off + i) == s.charAt(i).toByte)
    try {
      if (n >= 54 && tag(0, "BM"))
        DecodedMedia(id, "bmp", 1L, u32(18), u32(22), u16(28), -1L, -1L,
          -1L, u32(34))
      else if (n >= 44 && tag(0, "RIFF") && tag(8, "WAVE"))
        DecodedMedia(id, "wav", 1L, -1L, -1L, u16(34), u32(24), u16(22),
          -1L, u32(40))
      else if (n >= 88 && tag(0, "RIFF") && tag(8, "AVI "))
        DecodedMedia(id, "avi", 1L, u32(64), u32(68), -1L, -1L, -1L,
          u32(48), u32(4) - 80L)
      else invalid
    } catch {
      // unreachable given the length guards, but a codec binding's
      // contract is "bad bytes → bad-row, never task death"
      case _: IndexOutOfBoundsException => invalid
    }
  }

  /** Batch decode: mapPartitions over typed rows — iterator in, iterator
    * out, nothing materialized; per-partition setup (a real codec would
    * open once here) amortized across the batch.
    */
  def mediaDecodeBatch(spark: SparkSession,
      media: DataFrame): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[PayloadRow]
      .mapPartitions { rows => rows.map(r => decodeOne(r.doc_id, r.payload)) }
  }

  // ---------------------------------------------------------------------
  // Downstream consumers of DECODED metadata.
  // ---------------------------------------------------------------------

  /** Resize planning over PARSED image headers: target dimensions capped
    * at `maxSide` with integer-exact proportional scaling. Consumes
    * [[mediaDecodeCols]] output (valid BMP rows only) — the width/height
    * here came out of the bytes, not out of a metadata column.
    */
  def resizePlan(decoded: DataFrame, maxSide: Long = 256L): DataFrame =
    decoded.filter(col("container") === "bmp" && col("valid") === 1L)
      .select(col("doc_id"), col("width"), col("height"),
        least(col("width"), lit(maxSide)).as("out_width"),
        greatest(lit(1L),
          expr(s"(height * least(width, $maxSide)) div width"))
          .as("out_height"))

  /** Frame sampling over PARSED video headers: `dwTotalFrames` read from
    * the avih struct drives the explode, and each frame gets its byte
    * range within the data region (near-equal integer split) — the
    * planning half a real frame extractor hands to the decoder. Offsets
    * are data-region-relative; a reader adds the 88-byte header.
    */
  def frameSample(decoded: DataFrame): DataFrame =
    decoded.filter(col("container") === "avi" && col("valid") === 1L)
      .select(col("doc_id"), col("total_frames"), col("data_bytes"),
        explode(sequence(lit(0L), col("total_frames") - 1)).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        expr("frame_idx * data_bytes div total_frames").as("frame_start"),
        (expr("(frame_idx + 1) * data_bytes div total_frames") -
          expr("frame_idx * data_bytes div total_frames")).as("frame_len"))

  /** Curation thresholds — minimum image side, audio sample rate and
    * video frame count for `mediaCuration`. Same constants MUST appear
    * in the oracle SQL.
    */
  val MediaMinSide = 64L
  val MediaMinRate = 16000L
  val MediaMinFrames = 2L

  /** Keep/drop decision per payload from PARSED metadata — the media
    * twin of the text quality filter: invalid containers drop first,
    * then per-medium floors (image side, audio sample rate, video frame
    * count). One codegen'd projection over the decode output; reasons
    * are first-match (invalid wins over any threshold).
    */
  def mediaCuration(decoded: DataFrame, minSide: Long = MediaMinSide,
      minRate: Long = MediaMinRate, minFrames: Long = MediaMinFrames)
      : DataFrame =
    decoded.select(col("doc_id"), col("container"),
        when(col("valid") === 0L, "invalid")
          .when(col("container") === "bmp" &&
            (col("width") < minSide || col("height") < minSide), "too_small")
          .when(col("container") === "wav" &&
            col("sample_rate") < minRate, "low_sample_rate")
          .when(col("container") === "avi" &&
            col("total_frames") < minFrames, "too_few_frames")
          .otherwise("ok").as("reason"))
      .withColumn("keep",
        when(col("reason") === "ok", 1L).otherwise(0L))

  /** Audio framing from PARSED WAV headers (valid audio rows only):
    * block align = channels × 2 (16-bit PCM), sample frames =
    * data_bytes div block_align (a trailing partial frame is not a
    * frame — floor, exactly what a PCM reader plays), duration =
    * frames·1000 div sample_rate, all integer-exact.
    */
  def audioFrames(decoded: DataFrame): DataFrame =
    decoded.filter(col("container") === "wav" && col("valid") === 1L)
      .select(col("doc_id"), col("sample_rate"), col("channels"),
        (col("channels") * 2).as("block_align"),
        expr("data_bytes div (channels * 2)").as("n_frames"),
        expr("(data_bytes div (channels * 2)) * 1000 div sample_rate")
          .as("duration_ms"))

  /** Per-container corpus rollup over decoded metadata: row count,
    * total valid data bytes, and the per-medium maxima — the profile a
    * media-lake curation dashboard reads. Integer-only aggregates.
    */
  def mediaStats(decoded: DataFrame): DataFrame =
    decoded.groupBy("container")
      .agg(count(lit(1)).as("n"),
        sum(when(col("valid") === 1L, col("data_bytes")).otherwise(0L))
          .as("data_bytes_total"),
        max("width").as("max_width"),
        max("height").as("max_height"),
        max("sample_rate").as("max_sample_rate"),
        max("total_frames").as("max_total_frames"))

  // ---------------------------------------------------------------------
  // Opaque-bytes family (content addressing ignores containers).
  // ---------------------------------------------------------------------

  /** Opaque media table: payload = UTF-8 bytes of the text, kind cycled
    * by doc_id, nominal dimensions as metadata. The dedup / near-dup
    * family runs here — content addressing is container-agnostic; the
    * container-aware family runs on [[mediaContainers]].
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("doc_id") % 640 + 1).cast("long").as("width"),
      (col("doc_id") % 480 + 1).cast("long").as("height"))

  /** Exact media dedup — the binary twin of `Dedup.exact`: one row
    * per distinct payload with the min-doc_id survivor and the copy
    * count, keyed by (md5 digest, byte length). Only the 32-hex-char
    * digest + length shuffle — the payload bytes never leave the scan
    * stage, which is the entire point at 100 TB of media. md5 (not
    * PolyHash) because it is the one digest both engines compute
    * bit-identically over raw bytes, and 128 bits makes the
    * collision-pairs-a-non-event bar (~1e-38 per pair) without a
    * second hash; length is belt-and-braces plus a useful output.
    * Content-addressing by digest is also the storage layout real
    * media lakes use, so the survivor relation doubles as the object
    * index.
    */
  def mediaDedup(media: DataFrame): DataFrame =
    media.select(col("doc_id"), md5(col("payload")).as("payload_md5"),
        length(col("payload")).cast("long").as("n_bytes"))
      .groupBy("payload_md5", "n_bytes")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "payload_md5", "n_bytes", "n_copies")

  /** NEAR-dup detection over raw payload BYTES — the locality-sensitive
    * complement of `mediaDedup` (which only catches bit-identical
    * copies): SimHash over non-overlapping 4-byte grams of the
    * payload's hex encoding, banded pairs at Hamming ≤ 3 through the
    * SAME `Dedup.simhashPairsOf` core as the text family. A re-muxed
    * or trailing-metadata-shifted copy shares most byte grams and
    * surfaces here; the payload itself never shuffles (one map stage
    * computes the 60-bit signature, then only (doc, band, signature)
    * rows move). Hex grams (uppercase in BOTH engines) rather than raw
    * byte slices keep the gram hash the ordinary string PolyHash the
    * oracle can state.
    */
  def mediaSimhashPairs(media: DataFrame, maxHamming: Int = 3): DataFrame =
    graft.operators.Dedup.simhashPairsOf(
      media.select(col("doc_id"),
        expr("regexp_extract_all(hex(payload), '.{8}', 0)").as("toks")),
      maxHamming)
}
