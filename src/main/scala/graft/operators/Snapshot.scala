package graft.operators

import graft.functions.PolyHashFunctions.poly_hash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot maintenance for an evolving corpus: latest-wins merge
  * (upsert + delete) of a change batch into the current snapshot, and
  * content-fingerprint diff between two snapshots — the two primitives
  * an incremental training-data pipeline refreshes its corpus with
  * (recrawls, takedown deletes, re-processing runs) and audits the
  * refresh by.
  *
  * The reference has no mutation story (its MR jobs are one-shot
  * scans, e.g. reference Path2/SocialTriangle drivers); these are
  * beyond-reference operators in the LLM-pipeline family. Design rules
  * at 100 TB:
  *
  *   - merge is ONE key shuffle: union + per-key `max_by` over a
  *     (version, side) struct — no window sort, no per-key row
  *     buffering beyond the single winner each task tracks;
  *   - diff never shuffles text: both sides project to
  *     (key, 64-bit PolyHash fingerprint) FIRST, so the full-outer
  *     join moves 16 bytes/row regardless of payload width.
  */
object Snapshot {

  /** Latest-wins merge of `changes` into `current`.
    *
    * Both relations carry (`keyCol`, `versionCol`, `deletedCol`,
    * payload…) with IDENTICAL schemas. For each key the row with the
    * highest (version, side) wins, where side breaks version ties in
    * favor of `changes`; a winning tombstone (`deletedCol` = true)
    * drops the key from the result. Determinism contract: within each
    * input, (key, version) identifies at most one row — the operator
    * cannot (and does not) order two same-version rows on the same
    * side.
    *
    * Physical: tagged `unionByName` → single hash aggregation keyed by
    * `keyCol` with `max_by(payload_struct, (version, side))` — Spark's
    * struct ordering compares fields left-to-right, giving exactly the
    * lexicographic (version, side) maximum with map-side partial
    * aggregation; one shuffle of payload-width rows, no window.
    */
  def mergeLatest(current: DataFrame, changes: DataFrame,
      keyCol: String = "doc_id", versionCol: String = "version",
      deletedCol: String = "deleted"): DataFrame = {
    require(current.columns.sorted.sameElements(changes.columns.sorted),
      s"mergeLatest schema mismatch: ${current.columns.mkString(",")} vs " +
        changes.columns.mkString(","))
    val payloadCols = current.columns.filter(_ != keyCol).toSeq
    val tagged = current.withColumn("__side", lit(0))
      .unionByName(changes.withColumn("__side", lit(1)))
    tagged.groupBy(col(keyCol))
      .agg(max_by(
        struct(payloadCols.map(col): _*),
        struct(col(versionCol), col("__side"))).as("__win"))
      .select(col(keyCol) +: payloadCols.map(c => col(s"__win.$c").as(c)): _*)
      .filter(!col(deletedCol))
      .drop(deletedCol)
  }

  /** Latest-wins keyed state over ONE update stream — the
    * streaming-runnable core of `mergeLatest` (which adds the
    * two-relation side tie-break): per key, the highest-`versionCol`
    * row wins and a winning tombstone suppresses the key. The SAME
    * transform runs in batch (backfills, the parity oracle) and under
    * Structured Streaming (`readStream` in, update/complete mode out) —
    * it is one declarative aggregation, so the state store holds
    * exactly one payload row per key, and a tombstoned key re-emits
    * the moment a higher-version re-insert arrives. Determinism
    * contract: versions are unique per key across the stream (there is
    * no arrival-order tie-break — micro-batch boundaries must not
    * decide winners).
    */
  def latestState(updates: DataFrame, keyCol: String = "doc_id",
      versionCol: String = "version", deletedCol: String = "deleted"): DataFrame =
    latestStateChangelog(updates, keyCol, versionCol, deletedCol)
      .filter(!col(deletedCol))
      .drop(deletedCol)

  /** `latestState` with the tombstone VISIBLE: same per-key
    * latest-version election, but winning tombstones are returned
    * (with `deletedCol` retained) instead of dropped — the CHANGELOG
    * form a delete-aware sink consumes (upsert rows where deleted =
    * false, issue deletes where true). In update-mode streaming this
    * is the variant that actually propagates deletions: `latestState`
    * simply stops emitting a tombstoned key, which an idempotent
    * upsert sink would never notice. Same single aggregation, same
    * state bound, same determinism contract (unique versions per key).
    */
  def latestStateChangelog(updates: DataFrame, keyCol: String = "doc_id",
      versionCol: String = "version", deletedCol: String = "deleted"): DataFrame = {
    val payloadCols = updates.columns.filter(_ != keyCol).toSeq
    updates.groupBy(col(keyCol))
      .agg(max_by(
        struct(payloadCols.map(col): _*), col(versionCol)).as("__win"))
      .select(col(keyCol) +: payloadCols.map(c => col(s"__win.$c").as(c)): _*)
  }

  /** `valid_to` sentinel for an open (still-current) SCD2 interval —
    * Long.MaxValue rather than NULL so the history relation stays
    * filterable with plain range predicates (`valid_to > v`) and
    * hash-comparable across engines without a null-ordering story.
    */
  val Scd2Open: Long = Long.MaxValue

  /** Slowly-changing-dimension (type 2) history assembly: turns a bag
    * of versioned updates (upserts + tombstones, the same shape
    * `mergeLatest` consumes) into validity intervals — one row per
    * (key, version) with `valid_from` = its version, `valid_to` = the
    * key's next version (`Scd2Open` if none), and `is_current` marking
    * the open non-deleted row. This is the POINT-IN-TIME form of the
    * corpus: "which text did doc X have at version v" becomes a range
    * predicate (`valid_from <= v AND v < valid_to`), the lookup shape
    * a training-data audit ("what exactly did the March run train on")
    * needs and `latestState` by construction cannot answer.
    *
    * Tombstones stay VISIBLE as closed-or-open intervals with
    * `deletedCol` = true (an open tombstone means "currently absent"),
    * so the history composes with `latestStateChangelog`: filtering
    * `is_current` re-derives exactly the changelog's winners.
    * Determinism contract: (key, version) unique, as in `mergeLatest`.
    *
    * Scale shape: ONE shuffle keyed by `keyCol` (the window
    * partition); per-key state is the key's version count (corpus
    * refreshes are shallow — a handful of revisions per doc), so the
    * keyed sort never approaches a task's spill budget, unlike
    * event-keyed windows.
    */
  def scd2History(updates: DataFrame, keyCol: String = "doc_id",
      versionCol: String = "version", deletedCol: String = "deleted"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(versionCol)
    updates
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to",
        coalesce(lead(col(versionCol), 1).over(w), lit(Scd2Open)))
      .withColumn("is_current",
        col("valid_to") === Scd2Open && !col(deletedCol))
  }

  /** INCREMENTAL SCD2 apply — the production merge path (Delta's
    * MERGE INTO a type-2 dimension): fold a batch of NEW versions
    * into an existing `scd2History` relation WITHOUT rebuilding it.
    * Per batch key: the stored open row (valid_to = Scd2Open,
    * tombstones included) closes at that key's smallest batch
    * version; stored closed rows pass through byte-identical; batch
    * rows chain among themselves (the scd2History window, batch-sized
    * only), last one open. Admission contract — every batch version
    * is strictly greater than every stored version for its key (the
    * postingsDelta batch-vocabulary discipline applied to versions);
    * under it the chained law holds and is spec-pinned:
    * `scd2Apply(scd2History(old), batch) ≡ scd2History(old ∪ batch)`.
    *
    * Scale shape: batch keys BROADCAST; the stored history is scanned
    * map-only twice (touched semi-side + untouched anti pass-through)
    * and never re-windowed — the only window partitions over batch
    * rows. O(batch), not O(history): the property that makes type-2
    * dimensions maintainable at 100 TB.
    */
  def scd2Apply(history: DataFrame, batch: DataFrame,
      keyCol: String = "doc_id", versionCol: String = "version",
      deletedCol: String = "deleted"): DataFrame = {
    val firstNew = batch.groupBy(keyCol)
      .agg(min(col(versionCol)).as("__first_new"))
    val untouched = history.join(broadcast(firstNew.select(keyCol)),
      Seq(keyCol), "left_anti")
    val touched = history.join(broadcast(firstNew), Seq(keyCol))
      .withColumn("is_current",
        when(col("valid_to") === lit(Scd2Open), lit(false))
          .otherwise(col("is_current")))
      .withColumn("valid_to",
        when(col("valid_to") === lit(Scd2Open), col("__first_new"))
          .otherwise(col("valid_to")))
      .drop("__first_new")
    val fresh = scd2History(batch, keyCol, versionCol, deletedCol)
    untouched.unionByName(touched).unionByName(fresh)
  }

  /** SCD2 RETENTION VACUUM — the logical half of what Delta/Iceberg
    * VACUUM does to a versioned table: purge history rows that NO
    * point-in-time query at or after the retention watermark can ever
    * touch. The keep predicate is a single range test,
    * `valid_to > retainFrom`: a row's interval [valid_from, valid_to)
    * covers some t ≥ retainFrom iff its valid_to exceeds the
    * watermark, so every kept row is still reachable and every purged
    * row was only reachable from pre-watermark history. Open rows
    * (valid_to = Scd2Open) — including open TOMBSTONES, which encode
    * "currently absent" — always survive, so `is_current` filtering
    * and the latest-state derivation are vacuum-invariant, and the
    * as-of anchor AT the watermark survives (its interval covers
    * retainFrom). The PIT-invariance law (any t ≥ retainFrom answers
    * identically on the vacuumed history) is spec-pinned.
    *
    * Scale shape: a pushed-down range filter over the history scan —
    * map-only, partition-prunable when the history is laid out by
    * valid_to, which is exactly how a 100 TB versioned corpus wants
    * its retention pass to run (no shuffle, no rewrite of surviving
    * rows).
    */
  def scd2Vacuum(history: DataFrame, retainFrom: Long): DataFrame =
    history.filter(col("valid_to") > lit(retainFrom))

  /** Retention watermark for the vacuum gate: PIT queries at version
    * ≥ 1 stay answerable; version-0 intervals closed before then are
    * purged. Same constant MUST appear in the oracle SQL.
    */
  val VacuumRetainFrom = 1L

  /** Content diff between two snapshots of the same keyed relation:
    * one row per key whose membership or content changed, labeled
    * `added` (in `after` only), `removed` (in `before` only) or
    * `changed` (in both, `contentCol` differs).
    *
    * Comparison is by 64-bit PolyHash fingerprint of `contentCol`, so
    * the join shuffles (key, fingerprint) pairs only — the text itself
    * never moves. A fingerprint collision (~1e-9 per changed pair)
    * reports a changed row as unchanged; acceptable for audit/refresh
    * accounting, use a wider key before acting destructively on the
    * result.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame,
      keyCol: String = "doc_id", contentCol: String = "text"): DataFrame = {
    def fp(df: DataFrame, side: String) = df.select(
      col(keyCol), poly_hash(col(contentCol)).as(s"__fp_$side"))
    fp(before, "b").join(fp(after, "a"), Seq(keyCol), "full_outer")
      .select(col(keyCol),
        when(col("__fp_b").isNull, lit("added"))
          .when(col("__fp_a").isNull, lit("removed"))
          .when(col("__fp_a") =!= col("__fp_b"), lit("changed"))
          .as("change"))
      .filter(col("change").isNotNull)
  }
}
