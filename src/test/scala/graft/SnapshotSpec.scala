package graft

import graft.operators.Snapshot
import org.apache.spark.sql.DataFrame

/** Snapshot.mergeLatest / snapshotDiff semantics on hand-built
  * fixtures: latest-wins resolution, cross-side tie-breaks, tombstone
  * drops and re-inserts, and diff labeling.
  */
class SnapshotSpec extends SparkSpec {

  private def snap(rows: (Long, String, Long, Boolean)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "version", "deleted")
  }

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("mergeLatest: upsert, tombstone, insert, cross-side tie → changes wins") {
    val current = snap(
      (1L, "one", 0L, false),
      (2L, "two", 0L, false),
      (3L, "three", 0L, false),
      (4L, "four", 0L, false))
    val changes = snap(
      (2L, "two-v1", 1L, false),  // upsert
      (3L, "gone", 1L, true),     // tombstone drops the key
      (5L, "five", 1L, false),    // fresh insert
      (4L, "four-chg", 0L, false)) // SAME version as current → side breaks
    val out = Snapshot.mergeLatest(current, changes)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1L, "one", 0L),
      (2L, "two-v1", 1L),
      (4L, "four-chg", 0L),
      (5L, "five", 1L)))
  }

  test("mergeLatest: a later re-insert outlives an earlier tombstone") {
    val current = snap((1L, "one", 0L, false))
    val changes = snap(
      (1L, "dead", 1L, true),
      (1L, "reborn", 2L, false))
    val out = Snapshot.mergeLatest(current, changes).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, "reborn", 2L)))
    // and the reverse stacking: tombstone ABOVE the re-insert removes
    val out2 = Snapshot.mergeLatest(current,
      snap((1L, "reborn", 1L, false), (1L, "dead", 2L, true))).collect()
    assert(out2.isEmpty)
  }

  test("mergeLatest: empty change batch is identity (minus the deleted col)") {
    val current = snap((1L, "one", 0L, false), (2L, "two", 3L, false))
    val out = Snapshot.mergeLatest(current, snap())
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, "one", 0L), (2L, "two", 3L)))
  }

  test("snapshotDiff: added / removed / changed labeled, unchanged silent") {
    val before = docs((1L, "a"), (2L, "b"), (3L, "c"))
    val after = docs((2L, "b"), (3L, "c-changed"), (4L, "d"))
    val out = Snapshot.snapshotDiff(before, after)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq(
      (1L, "removed"), (3L, "changed"), (4L, "added")))
  }

  test("snapshotDiff of a snapshot against itself is empty") {
    val s = docs((1L, "a"), (2L, "b"))
    assert(Snapshot.snapshotDiff(s, s).count() === 0L)
  }

  test("latestStateChangelog: tombstones visible; latestState == changelog minus deletes") {
    val updates = snap(
      (1L, "one-v0", 0L, false), (1L, "one-v1", 1L, false),
      (2L, "two-v0", 0L, false), (2L, "dead", 1L, true),
      (3L, "gone", 0L, true))
    val log = Snapshot.latestStateChangelog(updates).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    // a delete-aware sink sees BOTH the live winner and the tombstones
    assert(log === Set((1L, "one-v1", 1L, false), (2L, "dead", 1L, true),
      (3L, "gone", 0L, true)))
    val live = Snapshot.latestState(updates).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(live === Set((1L, "one-v1", 1L)))
  }

  test("scd2History: intervals chain, tombstones visible, is_current == latestState") {
    val updates = snap(
      (1L, "one", 0L, false), (1L, "one-v3", 3L, false),
      (2L, "two", 0L, false), (2L, "dead", 5L, true),
      (3L, "three", 2L, false))
    val out = Snapshot.scd2History(updates)
      .orderBy("doc_id", "version").collect()
      .map(r => (r.getLong(0), r.getLong(2),
        r.getAs[Long]("valid_from"), r.getAs[Long]("valid_to"),
        r.getAs[Boolean]("is_current"), r.getBoolean(3)))
    val open = Snapshot.Scd2Open
    assert(out.toSeq === Seq(
      (1L, 0L, 0L, 3L, false, false),
      (1L, 3L, 3L, open, true, false),
      (2L, 0L, 0L, 5L, false, false),
      (2L, 5L, 5L, open, false, true), // open tombstone: current absence
      (3L, 2L, 2L, open, true, false)))
    // law: the is_current slice IS latestState (same keys, same text)
    val cur = Snapshot.scd2History(updates)
      .filter(org.apache.spark.sql.functions.col("is_current"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val ls = Snapshot.latestState(updates).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(cur === ls)
    // point-in-time slice at version 4: doc1 shows v3, doc2 still v0
    // (its tombstone lands at v5), doc3 shows v2
    val pit = Snapshot.scd2History(updates)
      .filter(org.apache.spark.sql.functions.expr(
        "valid_from <= 4 AND valid_to > 4 AND NOT deleted"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(pit === Set((1L, "one-v3"), (2L, "two"), (3L, "three")))
    // every version row appears exactly once, intervals partition
    // [first_version, open) per key: next valid_from == prior valid_to
    val byKey = out.groupBy(_._1)
    byKey.values.foreach { iv =>
      iv.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a._4 === b._3)
        case _ =>
      }
      assert(iv.last._4 === open)
    }
  }

  test("scd2Vacuum: PIT-invariant at/after the watermark; open rows and tombstones survive") {
    val updates = snap(
      (1L, "one", 0L, false), (1L, "one-v3", 3L, false),
      (2L, "two", 0L, false), (2L, "dead", 5L, true),
      (3L, "three", 2L, false), (4L, "four-v1", 1L, false),
      (4L, "four-v4", 4L, false), (4L, "four-v6", 6L, false))
    val full = Snapshot.scd2History(updates)
    def pit(h: DataFrame, t: Long): Set[(Long, String)] =
      h.filter(org.apache.spark.sql.functions.expr(
        s"valid_from <= $t AND valid_to > $t AND NOT deleted"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    for (watermark <- Seq(0L, 3L, 4L, 10L)) {
      val vac = Snapshot.scd2Vacuum(full, watermark)
      // PIT-invariance: every t ≥ watermark answers identically
      for (t <- watermark to 8L) {
        withClue(s"watermark=$watermark t=$t") {
          assert(pit(vac, t) === pit(full, t))
        }
      }
      // open rows — including the open TOMBSTONE (doc 2, "currently
      // absent") — always survive, so is_current is vacuum-invariant
      val curF = full.filter(org.apache.spark.sql.functions
        .col("valid_to") === Snapshot.Scd2Open).count()
      val curV = vac.filter(org.apache.spark.sql.functions
        .col("valid_to") === Snapshot.Scd2Open).count()
      assert(curF === curV)
    }
    // the purge is REAL: watermark 4 drops doc 4's v1 interval
    // ([1, 4) ends at the watermark → unreachable from t ≥ 4) and
    // doc 1's v0 ([0, 3)); a pre-watermark PIT visibly differs
    val vac4 = Snapshot.scd2Vacuum(full, 4L)
    assert(vac4.count() < full.count())
    assert(pit(vac4, 1L) !== pit(full, 1L))
  }

  test("latestState: streaming complete-mode state == batch over the same updates") {
    // updates arrive out of version order and across micro-batch
    // boundaries: upsert, tombstone, re-insert after tombstone,
    // tombstone-last — the winner per key must only depend on version
    val updates = snap(
      (1L, "one-v0", 0L, false), (1L, "one-v2", 2L, false),
      (1L, "one-v1", 1L, false),                    // 1 → one-v2
      (2L, "two-v0", 0L, false), (2L, "dead", 1L, true),
      (2L, "reborn", 2L, false),                    // 2 → reborn
      (3L, "three-v1", 1L, false), (3L, "gone", 2L, true)) // 3 → absent
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = rows(Snapshot.latestState(updates))
    assert(batch === Set((1L, "one-v2", 2L), (2L, "reborn", 2L)))
    // identical transform under Structured Streaming (the parquet
    // files land as separate micro-batches in arbitrary order)
    val dir = java.nio.file.Files.createTempDirectory("graft-snap").toString
    updates.repartition(3).write.mode("overwrite").parquet(dir)
    val q = Snapshot.latestState(
        spark.readStream.schema(updates.schema).parquet(dir))
      .writeStream.format("memory").queryName("snap_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(rows(spark.sql(
        "select doc_id, text, version from snap_stream")) === batch)
    } finally q.stop()
  }
}
