package graft.streaming

import graft.functions.PolyHashFunctions.{poly_hash, poly_hash2}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication over a documents stream — the
  * ingest-time half of the dedup family (the batch half lives in
  * operators.Dedup): drop every arriving document whose content was
  * already seen, so downstream near-dup/cluster stages only ever see
  * one copy per distinct text.
  *
  * State design mirrors the batch collision story (Dedup.exact): the
  * dedup key is the (hash1, hash2, length) triple — 24 bytes of state
  * per distinct document, never the text itself, with per-pair
  * collision odds ~1e-18. Two variants:
  *
  *   - `exactStreaming`: `dropDuplicates` on the key — state grows with
  *     distinct documents and lives forever (exact global dedup; the
  *     state store holds only the 24-byte keys).
  *   - `exactStreamingWindowed`: `dropDuplicatesWithinWatermark` —
  *     state is bounded by the watermark horizon: duplicates arriving
  *     within `horizon` of each other collapse; a copy arriving later
  *     may pass (the standard bounded-state trade for 24/7 ingest).
  */
object StreamDedup {

  /** Content-key projection shared by both variants (and usable in
    * batch for parity tests): the original columns + the dedup triple.
    */
  def withContentKey(docs: DataFrame): DataFrame =
    docs.select(col("*"),
      poly_hash(col("text")).as("fingerprint"),
      poly_hash2(col("text")).as("fp2"),
      length(col("text")).cast("long").as("len"))

  /** Exact streaming dedup, unbounded horizon: first arrival of each
    * distinct content wins (micro-batch arrival order decides "first" —
    * within a micro-batch Spark keeps one arbitrary row, exactly like
    * the batch `min(doc_id)` keeps one deterministic survivor).
    */
  def exactStreaming(docs: DataFrame): DataFrame =
    withContentKey(docs).dropDuplicates(Seq("fingerprint", "fp2", "len"))

  /** Exact streaming dedup with watermark-bounded state: `tsCol` must
    * be an event-time column; duplicates separated by more than
    * `horizon` MAY both survive — that is the explicit contract of
    * bounded state.
    */
  def exactStreamingWindowed(docs: DataFrame, tsCol: String,
      horizon: String = "1 hour"): DataFrame =
    withContentKey(docs)
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(Seq("fingerprint", "fp2", "len"))
}
