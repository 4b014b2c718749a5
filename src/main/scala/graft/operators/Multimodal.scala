package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata, plus a batch-shaped stub decoder.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake — but everything Spark-side is
  * real and tested: the schema, the binary column handling, the
  * partition-iterator batch shape (the Scala analogue of a Pandas-UDF
  * `mapInPandas`: one iterator in, one iterator out, never a whole
  * partition materialized), and the pushed projections around it.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
      width: Long, height: Long)

  /** Stub-decoded features. In production `decode` would be the codec
    * call; here it is a deterministic fake over the bytes.
    */
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
      first_byte: Long, byte_sum_mod: Long)

  /** Derive a media table from documents: payload = UTF-8 bytes of the
    * text (a stand-in for image/audio bytes), kind cycled by doc_id,
    * fake dimensions from doc_id. The binary column is a real
    * BinaryType column — everything downstream treats it as opaque.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(lit(Array("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("doc_id") % 640 + 1).cast("long").as("width"),
      (col("doc_id") % 480 + 1).cast("long").as("height"))

  /** Column-only feature extraction over the binary payload (no UDF):
    * byte length and first-byte value straight off BinaryType.
    */
  def mediaFeaturesSql(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("kind"),
      length(col("payload")).cast("long").as("n_bytes"),
      conv(hex(substring(col("payload"), 1, 1)), 16, 10).cast("long")
        .as("first_byte"),
      col("width"), col("height"))

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

  /** Resize planning (stub): compute target dimensions capped at
    * `maxSide` with integer-exact proportional scaling — the metadata
    * half of a resize; the pixel half is the codec stub. Pure column
    * arithmetic (LongType div), oracle-checkable.
    */
  def resizePlan(media: DataFrame, maxSide: Long = 256L): DataFrame =
    media.select(
      col("doc_id"), col("kind"), col("width"), col("height"),
      least(col("width"), lit(maxSide)).as("out_width"),
      greatest(lit(1L),
        expr(s"(height * least(width, $maxSide)) div width")).as("out_height"))

  /** Frame sampling (stub): videos explode into doc_id%5+1 frames with
    * a deterministic per-frame fingerprint chained off the payload hash
    * — the row-multiplying generator shape a real frame extractor has
    * (one input row → n frame rows), with the decode itself stubbed.
    */
  def frameSample(media: DataFrame): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("doc_id"),
        graft.functions.PolyHashFunctions
          .poly_hash(col("payload").cast("string")).as("payload_hash"),
        explode(sequence(lit(0L), col("doc_id") % 5)).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        ((col("payload_hash") * 31 + col("frame_idx")) % 1000000007L)
          .as("frame_hash"))

  /** Batch-shaped stub decode: mapPartitions over typed rows — the
    * iterator-in/iterator-out shape a real decoder (or a Pandas UDF via
    * mapInPandas on the Python side) would use. The "decode" itself is
    * a deterministic fake: first byte + byte-sum mod 251.
    */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "kind", "payload", "width", "height")
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-batch setup would open the codec once per partition here
        rows.map { r =>
          val bytes = r.payload
          // STUB decode — deterministic fake in place of a codec call
          val first = if (bytes.nonEmpty) bytes(0).toLong & 0xffL else -1L
          var s = 0L
          var i = 0
          while (i < bytes.length) { s = (s + (bytes(i) & 0xff)) % 251L; i += 1 }
          MediaFeatures(r.doc_id, r.kind, bytes.length.toLong, first, s)
        }
      }
  }
}
