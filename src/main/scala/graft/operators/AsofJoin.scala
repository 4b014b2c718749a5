package graft.operators

import org.apache.spark.sql.DataFrame
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
  * PRECONDITION: `(keys, tsCol)` must be unique on the build side
  * (pre-aggregate otherwise) — with duplicates the surviving row on a
  * tie is partition-order-dependent, the same determinism condition
  * DuckDB's native ASOF JOIN imposes, which is what the oracle runs.
  */
object AsofJoin {

  def asofJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(valueCols.nonEmpty, "asofJoin needs at least one value column")
    val probeCols = probe.columns.toSeq
    require(!probeCols.exists(valueCols.contains),
      s"value columns ${valueCols.mkString(", ")} must not collide with " +
        s"probe columns ${probeCols.mkString(", ")}")
    // tagged union: build rows carry the value struct, probe rows a
    // typed null of it; probe-only columns ride as nulls on build rows
    val vStruct = struct(valueCols.map(col): _*)
    val b = build.select(
      (keys.map(col) :+ col(tsCol).as(tsCol)) ++
        Seq(vStruct.as("__asof_v"), lit(0).as("__asof_tag")): _*)
    val bSchema = b.schema("__asof_v").dataType
    val p = probe.select(
      (keys.map(col) :+ col(tsCol).as(tsCol)) ++
        Seq(lit(null).cast(bSchema).as("__asof_v"), lit(1).as("__asof_tag")) ++
        probeCols.filterNot(c => keys.contains(c) || c == tsCol).map(col): _*)
    val union = p.unionByName(b, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__asof_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    union
      .withColumn("__asof_m", last(col("__asof_v"), ignoreNulls = true).over(w))
      .filter(col("__asof_tag") === 1)
      .select(probeCols.map(col) ++
        valueCols.map(c => col(s"__asof_m.$c").as(c)): _*)
  }
}
