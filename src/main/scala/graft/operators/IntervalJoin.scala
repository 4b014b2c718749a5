package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment join — "each point row matches every interval
  * row (same key) whose [start, end] contains it" — the
  * window-attribution / session-assignment / range-lookup operator
  * (events→campaign windows, ticks→trading halts, reads→genomic
  * ranges) that Spark has no native join type for.
  *
  * Spark-first shape: NOT the literal theta-join (`p.ts >= i.start AND
  * p.ts <= i.end` joins only on the key equi-clause, so every key's
  * points × intervals cross product materializes before the range
  * filter — and with no equi-keys at all Spark plans a broadcast
  * nested loop). Instead the classic bucket decomposition: pick a
  * bucket width, replicate each interval to the `span/width + 1`
  * buckets it overlaps (a generator expression — no shuffle of its
  * own), bucket each point once, equi-join on `(keys, bucket)`, and
  * keep the containment predicate as a cheap residual INSIDE the
  * hash join. A qualifying pair meets in EXACTLY one bucket (the
  * point's), so no dedup pass is needed — output rows are produced
  * once, straight out of whole-stage codegen.
  *
  * Scale notes: the join is a plain shuffle hash/sort-merge join on
  * `(keys, bucket)`, so AQE sizes and skew-splits it like any
  * equi-join; a celebrity key's traffic additionally spreads across
  * its time buckets (same skew story as `AsofJoin.asofJoinBucketed`).
  * Cost is linear in interval replication: pick `bucketWidth` near
  * the TYPICAL interval length — much smaller replicates long
  * intervals many times, much larger funnels many points+intervals
  * into each bucket before the residual filters. A few pathological
  * corpus-spanning intervals dominate replication; split those
  * upstream (or run them as a broadcast side) rather than shrinking
  * the width for everyone.
  *
  * Semantics: INNER join; both bounds inclusive. Interval rows with
  * `end < start` (and null bounds) match nothing; null points match
  * nothing; null KEYS match nothing (SQL join semantics — unlike the
  * as-of window operator, which groups null keys). Timestamps bucket
  * at their cast-to-long grain (seconds) — pass numeric columns
  * (e.g. `unix_micros(ts)`) for finer bucketing; the residual
  * compares the ORIGINAL column values, so the match itself is exact
  * at full precision either way.
  *
  * PRECONDITIONS: point and interval column names must be disjoint
  * apart from the join keys (enforced); no input column may start
  * with `__ivj_` (the operator's internal namespace; enforced).
  */
object IntervalJoin {

  /** Exact long floor(ts / width): integral `div` truncates toward
    * zero, so negative values with a nonzero remainder are nudged one
    * bucket down — overflow-free at every long magnitude (the same
    * arithmetic as AsofJoin's bucket, Column-built, never a spliced
    * SQL string or a double round-trip).
    */
  private def bucketOf(c: Column, width: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    import org.apache.spark.sql.graft.ColumnBridge
    val tl = c.cast("long")
    val q = ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(tl), Literal(width)))
    q - when(tl % width < 0, lit(1L)).otherwise(lit(0L))
  }

  /** Inner containment join: every (point, interval) pair with equal
    * `keys` and `start <= pt <= end`, as point columns ++ interval
    * columns (keys once). `bucketWidth` is in units of the cast-to-
    * long columns — see the choice guidance in the object doc.
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], ptCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0L, s"bucketWidth must be positive, got $bucketWidth")
    require(keys.nonEmpty, "intervalJoin needs at least one key column")
    val reserved = (points.columns ++ intervals.columns)
      .filter(_.startsWith("__ivj_"))
    require(reserved.isEmpty,
      s"columns ${reserved.mkString(", ")} collide with the operator's " +
        "reserved __ivj_ namespace — rename them")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"point and interval columns must be disjoint apart from the join " +
        s"keys; both sides carry ${overlap.mkString(", ")}")
    // intervals replicate to every bucket they overlap; the generator
    // runs in the scan stage, so only already-replicated narrow rows
    // shuffle. Inverted (end < start) and null-bounded intervals are
    // filtered explicitly — Spark's `sequence` would otherwise COUNT
    // DOWN for an inverted pair, replicating a match-nothing row.
    val p = points.withColumn("__ivj_bkt", bucketOf(col(ptCol), bucketWidth))
    val i = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .withColumn("__ivj_bkt",
        explode(sequence(bucketOf(col(startCol), bucketWidth),
          bucketOf(col(endCol), bucketWidth))))
    p.join(i, keys :+ "__ivj_bkt")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__ivj_bkt")
  }

  /** INTERVAL×INTERVAL overlap join: every (left, right) pair with
    * equal `keys` whose intervals INTERSECT — `lStart <= rEnd AND
    * rStart <= lEnd`, both bounds inclusive — the session-vs-campaign
    * / range-vs-range companion of the points-in-intervals operator.
    *
    * Same bucket decomposition, one new wrinkle: BOTH sides replicate
    * to every bucket they overlap, so an intersecting pair now meets
    * in every bucket their spans share (possibly many). Exactly-once
    * output comes from the classic trick: a pair is kept ONLY in the
    * bucket of `max(lStart, rStart)` — the bucket where their overlap
    * begins, which both replicas provably cover whenever the pair
    * intersects (max(lStart, rStart) ≤ min(lEnd, rEnd) lies inside
    * both spans) — a cheap residual INSIDE the hash join, never a
    * dedup shuffle after it.
    *
    * Scale notes: as for `intervalJoin` — plain equi-join on
    * `(keys, bucket)` (AQE-sized, skew-splittable; a hot key spreads
    * over its time buckets), replication cost linear in
    * span/bucketWidth on EACH side, so pick `bucketWidth` near the
    * typical span of the WIDER relation and split corpus-spanning
    * outliers upstream. Inverted/null-bounded rows on either side
    * match nothing; null keys match nothing (SQL join semantics).
    *
    * PRECONDITIONS: left/right column names disjoint apart from
    * `keys`; no `__ivj_` columns (both enforced).
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String], lStart: String, lEnd: String,
      rStart: String, rEnd: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0L, s"bucketWidth must be positive, got $bucketWidth")
    require(keys.nonEmpty, "intervalOverlapJoin needs at least one key column")
    val reserved = (left.columns ++ right.columns)
      .filter(_.startsWith("__ivj_"))
    require(reserved.isEmpty,
      s"columns ${reserved.mkString(", ")} collide with the operator's " +
        "reserved __ivj_ namespace — rename them")
    val overlap = left.columns.toSet
      .intersect(right.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"left and right columns must be disjoint apart from the join " +
        s"keys; both sides carry ${overlap.mkString(", ")}")
    def replicated(df: DataFrame, s: String, e: String): DataFrame = df
      .filter(col(s).isNotNull && col(e).isNotNull && col(s) <= col(e))
      .withColumn("__ivj_bkt",
        explode(sequence(bucketOf(col(s), bucketWidth),
          bucketOf(col(e), bucketWidth))))
    replicated(left, lStart, lEnd)
      .join(replicated(right, rStart, rEnd), keys :+ "__ivj_bkt")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__ivj_bkt") ===
          bucketOf(greatest(col(lStart), col(rStart)), bucketWidth))
      .drop("__ivj_bkt")
  }
}
