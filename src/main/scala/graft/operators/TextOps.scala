package graft.operators

import graft.functions.PolyHashFunctions.poly_hash
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the language-ID /
  * quality / token-count / fingerprint layer a training-data pipeline
  * runs before dedup. Everything is a narrow projection (no shuffle at
  * all): at 100 TB these run as a single map stage with the parquet scan
  * pruned to (doc_id, text).
  */
object TextOps {

  /** (doc_id, n_tokens, n_subtokens, n_chars) per document.
    * n_subtokens is the BPE-ish proxy: greedy ≤4-char chunks of each
    * token (`\S{1,4}` matches), i.e. Σ ceil(len(token)/4) — a
    * deterministic, regex-only stand-in for a real subword vocabulary.
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      token_count(col("text")).cast("long").as("n_tokens"),
      regexp_count(col("text"), lit("\\S{1,4}")).cast("long").as("n_subtokens"),
      length(col("text")).cast("long").as("n_chars"))

  /** Quality features + composite score. Rational arithmetic only —
    * bit-stable against the SQL oracle.
    */
  def quality(docs: DataFrame): DataFrame = {
    val base = docs.select(
      col("doc_id"),
      token_count(col("text")).as("n_tokens"),
      nonspace_chars(col("text")).as("nonspace"),
      punct_count(col("text")).as("n_punct"),
      stopword_count(col("text")).as("n_stop"))
    base.select(
      col("doc_id"),
      col("n_tokens").cast("long").as("n_tokens"),
      col("n_punct").cast("long").as("n_punct"),
      (col("nonspace").cast("double") / greatest(col("n_tokens"), lit(1)).cast("double"))
        .as("avg_token_len"),
      (col("n_stop").cast("double") / greatest(col("n_tokens"), lit(1)).cast("double"))
        .as("stopword_ratio"),
      quality_score(col("n_tokens"), col("n_stop"), col("nonspace"))
        .as("quality"))
  }

  /** Heuristic language ID (marker-word argmax; deterministic
    * tie-break). The testdata's `lang` column is a synthetic label, not
    * ground truth — this op's contract is determinism, not accuracy.
    */
  def langId(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lang_guess(col("text")).as("lang_guess"))

  /** Document fingerprint: PolyHash (custom codegen'd Catalyst
    * expression) over the raw text — the exact-dedup / clustering key.
    */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      poly_hash(col("text")).as("fingerprint"))

  /** Exact top-k vocabulary by frequency (count desc, token asc).
    * Map-side partial counts bound the shuffle by distinct tokens per
    * partition; the final top-k is a TakeOrdered merge (k rows per
    * partition to the driver), never a global sort of the vocabulary.
    */
  def topTokens(docs: DataFrame, k: Int = 100): DataFrame =
    docs.select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  /** Deterministic train/validation split by id hash: stable across
    * runs, clusters and engines (no RNG, no sampling drift) — the
    * standard way to carve held-out sets from a training corpus. A doc
    * lands in 'val' iff poly_hash(doc_id) mod 100 < valPct, so the
    * split survives re-partitioning and incremental corpus growth
    * (existing docs never switch sides). Pure projection — no shuffle.
    */
  def hashSplit(docs: DataFrame, valPct: Int = 10): DataFrame =
    docs.select(col("doc_id"),
      when(poly_hash(col("doc_id").cast("string")) % 100 < valPct, "val")
        .otherwise("train").as("split"))

  /** Opt-in text canonicalization BEFORE dedup: Unicode NFC +
    * lowercase + whitespace collapse + trim, applied in place to
    * `textCol` with every other column preserved — so the near-dup
    * family composes directly over it ("The  Cat" and "the cat" then
    * share every shingle; raw they share none). Kept OUT of the dedup
    * operators themselves on purpose: canonicalization changes what
    * "duplicate" means, and a pipeline must choose it explicitly.
    * Pure projection — no shuffle, one map stage at any scale.
    */
  def normalize(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn(textCol,
      graft.functions.TextNormFunctions.norm_text(col(textCol)))

  /** One-row corpus summary — integer aggregates only (sums of longs
    * are order-insensitive and exact; no float means across rows).
    */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.select(token_count(col("text")).cast("long").as("t"),
        length(col("text")).cast("long").as("c"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("t")), lit(0L)).as("total_tokens"),
        coalesce(sum(col("c")), lit(0L)).as("total_chars"),
        coalesce(max(col("t")), lit(0L)).as("max_tokens"))
}
