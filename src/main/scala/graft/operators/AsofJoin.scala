package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — "each probe row picks the latest build row at or
  * before its timestamp, per key" — the standard temporal-alignment
  * operator (quotes→trades, last-config-before-event, feature
  * point-in-time correctness) that Spark has no native join type for.
  *
  * Spark-first shape: NOT a range join (a theta-join on `b.ts <= p.ts`
  * explodes to per-key cross products before a window picks one row).
  * Instead the classic union-merge: tag build and probe rows, union
  * them, and run ONE running `last(<build struct>, ignoreNulls)` over
  * `(key) ORDER BY (ts, tag)` — build rows sort before probe rows on
  * equal ts, which is exactly the inclusive `<=` match. One hash
  * shuffle of (probe + build) on the key columns and one
  * sort-within-partition; no join node at all, so there is nothing to
  * explode, and AQE/codegen treat it as a plain window.
  *
  * The running state is the whole build row as a STRUCT: `last(...,
  * ignoreNulls)` then matches the latest build ROW, not the latest
  * non-null value per column — a build row whose value columns are
  * null still wins (and yields its nulls), exactly like a real as-of
  * join's row semantics.
  *
  * Scale notes: the window partition is a key's full (probe + build)
  * history — fine for per-user/per-instrument keys; a single
  * celebrity key concentrating a large fraction of the corpus needs
  * time-bucketed salting on top (bucket boundaries carry the previous
  * bucket's closing build row). Running-`last` is O(1) state per row —
  * no frame re-scan.
  *
  * PRECONDITIONS (all variants): `(keys, tsCol)` must be unique on the
  * build side (pre-aggregate otherwise) — with duplicates the
  * surviving row on a tie is partition-order-dependent, the same
  * determinism condition DuckDB's native ASOF JOIN imposes, which is
  * what the oracle runs. `tsCol` must be NON-NULL on both sides: a
  * null-ts build row would sort first under the ascending window and
  * silently become the match for probes preceding every real build
  * (DuckDB's ASOF never matches a NULL ts). Null KEYS group with each
  * other via `partitionBy` — SQL join semantics would match them with
  * nothing; filter them out upstream if that is the contract you need.
  * No input column may start with `__asof_` (the operator's internal
  * namespace; enforced).
  */
object AsofJoin {

  private def requireNoReserved(probe: DataFrame, build: DataFrame): Unit = {
    val clash = (probe.columns ++ build.columns).filter(_.startsWith("__asof_"))
    require(clash.isEmpty,
      s"columns ${clash.mkString(", ")} collide with the operator's " +
        "reserved __asof_ namespace — rename them")
  }

  /** Backward-inclusive as-of join: each probe row gets the LATEST
    * build row with `build.ts <= probe.ts`, per key (null values when
    * no build precedes). The 90% case.
    */
  def asofJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      tsCol: String, valueCols: Seq[String]): DataFrame =
    asofKernel(probe, build, keys, tsCol, valueCols,
      forward = false, tolerance = None)

  /** Forward-inclusive as-of join: each probe row gets the EARLIEST
    * build row with `build.ts >= probe.ts`, per key — the
    * next-event/lookahead alignment (e.g. each order picks the next
    * price tick). Same shape as the backward form with the window
    * order reversed: descending ts, build-before-probe on ties.
    */
  def asofJoinForward(probe: DataFrame, build: DataFrame, keys: Seq[String],
      tsCol: String, valueCols: Seq[String]): DataFrame =
    asofKernel(probe, build, keys, tsCol, valueCols,
      forward = true, tolerance = None)

  /** Tolerance-bounded as-of join: as `asofJoin` (or `asofJoinForward`
    * with `forward = true`), but a match farther than `tolerance` from
    * the probe is nulled out — `|probe.ts − build.ts| <= tolerance` in
    * the UNITS OF `tsCol` CAST TO LONG (seconds for timestamps; pass
    * numeric ts columns — e.g. `unix_micros(ts)` — for finer grains).
    * The as-of match itself is unchanged, so only a post-filter runs on
    * top of the same single-window plan: if the nearest build row is
    * out of tolerance, every other one is farther still.
    */
  def asofJoinTolerance(probe: DataFrame, build: DataFrame,
      keys: Seq[String], tsCol: String, valueCols: Seq[String],
      tolerance: Long, forward: Boolean = false): DataFrame = {
    require(tolerance >= 0L, s"tolerance must be >= 0, got $tolerance")
    asofKernel(probe, build, keys, tsCol, valueCols, forward,
      tolerance = Some(tolerance))
  }

  private def asofKernel(probe: DataFrame, build: DataFrame,
      keys: Seq[String], tsCol: String, valueCols: Seq[String],
      forward: Boolean, tolerance: Option[Long]): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(valueCols.nonEmpty, "asofJoin needs at least one value column")
    requireNoReserved(probe, build)
    val probeCols = probe.columns.toSeq
    require(!probeCols.exists(valueCols.contains),
      s"value columns ${valueCols.mkString(", ")} must not collide with " +
        s"probe columns ${probeCols.mkString(", ")}")
    // tagged union: build rows carry the value struct (plus their own
    // ts, for the tolerance post-filter), probe rows a typed null of
    // it; probe-only columns ride as nulls on build rows
    val vStruct = struct(col(tsCol).as("__asof_bts") +: valueCols.map(col): _*)
    val b = build.select(
      (keys.map(col) :+ col(tsCol).as(tsCol)) ++
        Seq(vStruct.as("__asof_v"), lit(0).as("__asof_tag")): _*)
    val bSchema = b.schema("__asof_v").dataType
    val p = probe.select(
      (keys.map(col) :+ col(tsCol).as(tsCol)) ++
        Seq(lit(null).cast(bSchema).as("__asof_v"), lit(1).as("__asof_tag")) ++
        probeCols.filterNot(c => keys.contains(c) || c == tsCol).map(col): _*)
    val union = p.unionByName(b, allowMissingColumns = true)
    // backward: ascending ts → running last = latest earlier build;
    // forward: DESCENDING ts → running last = earliest later build.
    // Build rows (tag 0) sort before probe rows on equal ts either
    // way, which is exactly the inclusive bound.
    val tsOrder = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__asof_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = valueCols.map { c =>
      tolerance match {
        case Some(tol) =>
          val dt = col(tsCol).cast("long") -
            col("__asof_m.__asof_bts").cast("long")
          val within = if (forward) -dt <= tol else dt <= tol
          when(within, col(s"__asof_m.$c")).as(c)
        case None => col(s"__asof_m.$c").as(c)
      }
    }
    union
      .withColumn("__asof_m", last(col("__asof_v"), ignoreNulls = true).over(w))
      .filter(col("__asof_tag") === 1)
      .select(probeCols.map(col) ++ matched: _*)
  }

  /** SKEW-PROOF as-of join — identical results to `asofJoin`, but the
    * window partition is `(keys, time-bucket)` instead of `(keys)`, so
    * a celebrity key's history splits across `history span /
    * bucketWidth` partitions instead of funneling into one task. This
    * is the 100 TB path for market-data-shaped inputs (few instruments
    * × billions of ticks).
    *
    * The boundary problem — a probe row whose latest build row lives
    * in an EARLIER bucket — is solved with a carry-in: per (key,
    * bucket) the bucket's closing (max-ts) build row is aggregated
    * (one row per non-empty bucket), a bucket-granular running-last
    * window computes each probe bucket's latest earlier closing (rows
    * here are per-BUCKET, thousands of× smaller than the data, so the
    * per-key partition is trivially small), and that carry enters the
    * final per-(key, bucket) election as a synthetic build row
    * sorting before everything in the bucket (null ts, nulls-first).
    * Three bounded shuffles instead of one unbounded one.
    *
    * `tsCol` must be non-null and castable to long (timestamps bucket
    * at second granularity); pick `bucketWidth` so a key's densest
    * bucket fits a task comfortably — at 1M rows/key/day, an hour
    * bucket is ~42k rows. Same build-side uniqueness precondition as
    * `asofJoin`. Bucketing is pure LONG arithmetic (a floor-corrected
    * integral `div`, never a double round-trip), so nanosecond-epoch
    * magnitudes beyond 2^53 — and any ts down to Long.MinValue —
    * bucket exactly.
    */
  def asofJoinBucketed(probe: DataFrame, build: DataFrame,
      keys: Seq[String], tsCol: String, valueCols: Seq[String],
      bucketWidth: Long): DataFrame =
    bucketedKernel(probe, build, keys, tsCol, valueCols, bucketWidth,
      forward = false, tolerance = None)

  /** Skew-proof FORWARD as-of join — identical results to
    * `asofJoinForward`, same bucketed shape as `asofJoinBucketed` with
    * every direction reversed: the carry is each bucket's OPENING
    * (min-ts) build row, carried backward from strictly LATER buckets,
    * and the in-bucket election runs descending so a probe matches the
    * earliest build row at or after it.
    */
  def asofJoinBucketedForward(probe: DataFrame, build: DataFrame,
      keys: Seq[String], tsCol: String, valueCols: Seq[String],
      bucketWidth: Long): DataFrame =
    bucketedKernel(probe, build, keys, tsCol, valueCols, bucketWidth,
      forward = true, tolerance = None)

  /** Skew-proof tolerance-bounded as-of join — identical results to
    * `asofJoinTolerance` (either direction). The matched build row's
    * own ts rides inside the carried struct, so the tolerance check is
    * exact even when the match crossed a bucket boundary via the
    * carry; like the plain variant it adds only a projection on top of
    * the bucketed plan.
    */
  def asofJoinBucketedTolerance(probe: DataFrame, build: DataFrame,
      keys: Seq[String], tsCol: String, valueCols: Seq[String],
      bucketWidth: Long, tolerance: Long,
      forward: Boolean = false): DataFrame = {
    require(tolerance >= 0L, s"tolerance must be >= 0, got $tolerance")
    bucketedKernel(probe, build, keys, tsCol, valueCols, bucketWidth,
      forward, tolerance = Some(tolerance))
  }

  /** floor(ts / width) in exact long arithmetic, built from Column
    * operators (a spliced SQL string would break on column names
    * containing backticks): integral `div` truncates toward zero, so
    * a negative ts with a nonzero remainder is nudged one bucket down
    * — the correction subtracts at most 1 from a quotient of smaller
    * magnitude than ts, so no intermediate can overflow at ANY long
    * ts, including within `width` of Long.MinValue (where the
    * pmod-subtraction form wrapped).
    */
  private def bucketOf(tsCol: String, width: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    import org.apache.spark.sql.graft.ColumnBridge
    val tl = col(tsCol).cast("long")
    val q = ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(tl), Literal(width)))
    (q - when(tl % width < 0, lit(1L)).otherwise(lit(0L))).as("__asof_bkt")
  }

  private def bucketedKernel(probe: DataFrame, build: DataFrame,
      keys: Seq[String], tsCol: String, valueCols: Seq[String],
      bucketWidth: Long, forward: Boolean,
      tolerance: Option[Long]): DataFrame = {
    require(bucketWidth > 0L, s"bucketWidth must be positive, got $bucketWidth")
    require(keys.nonEmpty, "asofJoinBucketed needs at least one key column")
    require(valueCols.nonEmpty, "asofJoinBucketed needs at least one value column")
    requireNoReserved(probe, build)
    val probeCols = probe.columns.toSeq
    require(!probeCols.exists(valueCols.contains),
      s"value columns ${valueCols.mkString(", ")} must not collide with " +
        s"probe columns ${probeCols.mkString(", ")}")
    val bkt = bucketOf(tsCol, bucketWidth)
    // the carried struct holds the build row's own ts (`__asof_bts`)
    // alongside its values — the tolerance post-filter needs it, and
    // it must survive the carry across bucket boundaries
    val vStruct = struct(col(tsCol).as("__asof_bts") +: valueCols.map(col): _*)
    val b = build.select(
      (keys.map(col) :+ col(tsCol)) ++
        Seq(vStruct.as("__asof_v"), bkt): _*)
    val vType = b.schema("__asof_v").dataType
    // one boundary row per non-empty (key, bucket): backward carries
    // the bucket's CLOSING (max-ts) build row forward, forward carries
    // its OPENING (min-ts) row backward
    val boundaryAgg =
      if (forward) min_by(col("__asof_v"), col(tsCol))
      else max_by(col("__asof_v"), col(tsCol))
    val closings = b.groupBy(keys.map(col) :+ col("__asof_bkt"): _*)
      .agg(boundaryAgg.as("__asof_cv"))
    // per probe bucket, the boundary row of the nearest STRICTLY
    // earlier (backward) / later (forward) non-empty bucket:
    // probe-bucket markers (tag 0) sort before same-bucket boundary
    // rows (tag 1) in traversal order, and the frame stops at -1 —
    // bucket-level rows only, so this per-key window holds buckets,
    // not events
    val pBkts = probe
      .select(keys.map(col) :+ bkt: _*).distinct()
      .withColumn("__asof_cv", lit(null).cast(vType))
      .withColumn("__asof_pb", lit(0))
    val bktOrder = if (forward) col("__asof_bkt").desc else col("__asof_bkt").asc
    val wCarry = Window.partitionBy(keys.map(col): _*)
      .orderBy(bktOrder, col("__asof_pb").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = pBkts
      .unionByName(closings.withColumn("__asof_pb", lit(1)))
      .withColumn("__asof_carry",
        last(col("__asof_cv"), ignoreNulls = true).over(wCarry))
      .filter(col("__asof_pb") === 0 && col("__asof_carry").isNotNull)
    // synthetic carry rows sort FIRST in their bucket's traversal via
    // null ts + nulls-first, and lose to any real in-bucket build row
    // — which is strictly closer to the probe than anything a carry
    // can hold (strictly newer backward, strictly earlier forward)
    val synth = carry.select(
      (keys.map(col) :+ lit(null).cast(probe.schema(tsCol).dataType).as(tsCol)) ++
        Seq(col("__asof_carry").as("__asof_v"), lit(-1).as("__asof_tag"),
          col("__asof_bkt")): _*)
    val bTagged = b.withColumn("__asof_tag", lit(0))
    val p = probe.select(
      (keys.map(col) :+ col(tsCol)) ++
        Seq(lit(null).cast(vType).as("__asof_v"), lit(1).as("__asof_tag"),
          bkt) ++
        probeCols.filterNot(c => keys.contains(c) || c == tsCol).map(col): _*)
    // backward ascends (running last = latest earlier build), forward
    // descends (running last = earliest later build); build rows sort
    // before probe rows on equal ts either way = the inclusive bound
    val tsOrder =
      if (forward) col(tsCol).desc_nulls_first else col(tsCol).asc_nulls_first
    val w = Window.partitionBy(keys.map(col) :+ col("__asof_bkt"): _*)
      .orderBy(tsOrder, col("__asof_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = valueCols.map { c =>
      tolerance match {
        case Some(tol) =>
          val dt = col(tsCol).cast("long") -
            col("__asof_m.__asof_bts").cast("long")
          val within = if (forward) -dt <= tol else dt <= tol
          when(within, col(s"__asof_m.$c")).as(c)
        case None => col(s"__asof_m.$c").as(c)
      }
    }
    p.unionByName(bTagged, allowMissingColumns = true)
      .unionByName(synth, allowMissingColumns = true)
      .withColumn("__asof_m", last(col("__asof_v"), ignoreNulls = true).over(w))
      .filter(col("__asof_tag") === 1)
      .select(probeCols.map(col) ++ matched: _*)
  }
}
