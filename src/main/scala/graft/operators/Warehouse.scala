package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Classic warehouse OLAP over the TPC-H-ish star schema
  * (lineitem/orders/customer/supplier/nation/region) — the relational
  * bread-and-butter a Spark analytics engine serves next to the
  * graph/text/vector extensions. Four canonical plan shapes, each a
  * TPC-H query skeleton adapted to the testdata's columns:
  *
  *   - Q1 (pricing summary): scan-heavy single-pass aggregate —
  *     the pushed date filter + pruned ReadSchema + partial/final
  *     HashAggregate plan IS the query; nothing else may appear.
  *   - Q3 (top orders): selective dimension filter broadcast into the
  *     fact table, one fact-keyed aggregation, TakeOrdered top-k.
  *   - Q5 (region revenue): the multi-dim snowflake join — every
  *     dimension broadcasts, the fact table never shuffles until the
  *     final nation-keyed aggregate.
  *   - Q4 (order priority): EXISTS as a LEFT SEMI join with a
  *     cross-table residual condition.
  *
  * Float-parity rule: money is per-row floored to integer CENTS
  * (`floor(expr · 100.0)`) before any aggregation — double sums are
  * order-dependent, integer sums are not; every arithmetic chain is
  * mirrored token-for-token in the oracle SQL.
  *
  * Timestamp robustness: the testdata's timestamp columns have shipped
  * as both TIMESTAMP and TIMESTAMP_NTZ across harness generations (the
  * events-loader lesson, Tables.scala) — `tsLit` types each literal to
  * match the LOADED column so comparisons stay directly on the scan
  * column (predicate pushdown) under either physical layout, and the
  * UTC session makes the two layouts semantically identical.
  */
object Warehouse {

  /** Declared query constants. Same values MUST appear in the oracle
    * SQL.
    */
  val Q1Cutoff = "1998-09-01"
  val Q3Segment = "BUILDING"
  val Q3Date = "1997-01-01"
  val Q5Region = "ASIA"
  val Q5Start = "1997-01-01"
  val Q5End = "1998-01-01"
  val Q4Start = "1997-07-01"
  val Q4End = "1997-10-01"
  val Q3TopK = 10

  private def tsLit(df: DataFrame, c: String, iso: String): Column =
    df.schema(c).dataType match {
      case TimestampNTZType => lit(iso).cast("timestamp_ntz")
      case _ => lit(iso).cast("timestamp")
    }

  /** Revenue in cents: ⌊price · (1 − discount) · 100⌋ per row. */
  private def revCents: Column =
    floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
      lit(100.0)).cast("long")

  /** TPC-H Q1 shape — the pricing summary report: one pass over
    * lineitem at the ship-date cutoff, grouped by (returnflag,
    * linestatus), integer-cents sums and ppm means. Scale: THE
    * scan-bound query — the date predicate reaches the parquet scan,
    * ReadSchema carries only the 7 live columns, and the aggregate is
    * 6 groups with map-side partials (plan-guarded).
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= tsLit(lineitem, "l_shipdate", Q1Cutoff))
      .select(col("l_returnflag"), col("l_linestatus"),
        floor(col("l_quantity")).cast("long").as("qty"),
        floor(col("l_extendedprice") * lit(100.0)).cast("long")
          .as("base_c"),
        revCents.as("disc_c"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax")) * lit(100.0)).cast("long")
          .as("charge_c"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("qty").as("sum_qty"),
        sum("base_c").as("sum_base_cents"),
        sum("disc_c").as("sum_disc_cents"),
        sum("charge_c").as("sum_charge_cents"),
        count(lit(1)).as("n_rows"))
      .withColumn("avg_qty_ppm", expr("sum_qty * 1000000 div n_rows"))

  /** TPC-H Q3 shape — top unshipped-revenue orders for one market
    * segment: the segment's customers (a selective dimension)
    * BROADCAST into orders; the orders side of the fact join carries
    * NO hint (fact-sized at scale — AQE broadcasts it when the filter
    * makes it small, shuffles otherwise);
    * one order-keyed revenue aggregation, global top-k by
    * (revenue desc, orderkey asc) via TakeOrdered (driver-bounded
    * k rows). The fact table never shuffles before its aggregate.
    */
  def topOrders(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, k: Int = Q3TopK): DataFrame = {
    val cust = customer.filter(col("c_mktsegment") === lit(Q3Segment))
      .select(col("c_custkey").as("o_custkey"))
    val ord = orders
      .filter(col("o_orderdate") < tsLit(orders, "o_orderdate", Q3Date))
      .join(broadcast(cust), "o_custkey")
      .select(col("o_orderkey").as("l_orderkey"))
    // orders is FACT-sized — no broadcast hint; at testdata scale AQE
    // broadcasts the filtered side on its own, at 100 TB the
    // l_orderkey equi-join shuffles (or co-buckets) both facts
    lineitem
      .filter(col("l_shipdate") > tsLit(lineitem, "l_shipdate", Q3Date))
      .select(col("l_orderkey"), revCents.as("rev_c"))
      .join(ord, "l_orderkey")
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(sum("rev_c").as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("o_orderkey").asc)
      .limit(k)
  }

  /** TPC-H Q5 shape — revenue by nation for one region's LOCAL trade
    * (customer and supplier in the same nation), orders within one
    * year: the region→nation dimension chain and both entity tables
    * broadcast; the orders⋈lineitem fact join is unhinted (AQE
    * broadcasts the year's orders when small, shuffles at scale) and
    * only the (nation)-keyed aggregate adds an exchange after it.
    */
  def regionRevenue(region: DataFrame, nation: DataFrame,
      customer: DataFrame, supplier: DataFrame, orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    val nat = nation
      .join(broadcast(region.filter(col("r_name") === lit(Q5Region))
          .select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = customer
      .join(broadcast(nat),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val supp = supplier
      .join(broadcast(nat),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val ord = orders
      .filter(col("o_orderdate") >= tsLit(orders, "o_orderdate", Q5Start) &&
        col("o_orderdate") < tsLit(orders, "o_orderdate", Q5End))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey").as("l_orderkey"), col("c_nationkey"))
    // same fact-fact rule as topOrders: no hint on the orders side
    lineitem
      .select(col("l_orderkey"), col("l_suppkey"), revCents.as("rev_c"))
      .join(ord, "l_orderkey")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(sum("rev_c").as("revenue_cents"))
  }

  /** Q17 small-quantity threshold: numerator/denominator of the 0.2
    * fraction (exact rational compare — no float threshold). Same
    * constants MUST appear in the oracle SQL.
    */
  val Q17Num = 1L
  val Q17Den = 5L

  /** ROLLUP report — revenue by (returnflag, linestatus) with the
    * subtotal and grand-total rows (the Expand-operator plan class:
    * GROUPING SETS materialize each row once per set, map-side
    * combined — no self-union of re-scans). `lvl` is the grouping_id
    * (0 = leaf, 1 = per-flag subtotal, 3 = grand total); NULL group
    * keys are the standard rollup convention on both engines.
    */
  def revenueRollup(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_returnflag"), col("l_linestatus"),
        revCents.as("rev_c"))
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum("rev_c").as("revenue_cents"),
        count(lit(1)).as("n_rows"),
        grouping_id().as("lvl"))

  /** TPC-H Q17 shape — the decorrelated scalar-aggregate join:
    * lineitems whose quantity is under `Q17Num/Q17Den` of their own
    * part's average quantity, total value by brand. The correlated
    * subquery `(SELECT avg(qty) FROM lineitem WHERE partkey = outer)`
    * decorrelates into one per-part aggregate joined back to the
    * fact — the aggregate-then-join class. The threshold compares
    * exact integers: `qty · Den · n_part < Σqty_part · Num` (both
    * sides from ⌊qty⌋ units) — no float average ever forms.
    *
    * Scale shape: one (partkey)-keyed aggregate over the fact + one
    * equi-join back on the same key — co-partitioned, AQE reuses the
    * exchange; part (a dimension) broadcasts for the brand label.
    */
  def smallQuantityRevenue(part: DataFrame,
      lineitem: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_partkey"),
      floor(col("l_quantity")).cast("long").as("qty"),
      revCents.as("rev_c"))
    val perPart = li.groupBy("l_partkey")
      .agg(sum("qty").as("sum_qty"), count(lit(1)).as("n_li"))
    li.join(perPart, "l_partkey")
      .filter(col("qty") * lit(Q17Den) * col("n_li") <
        col("sum_qty") * lit(Q17Num))
      .join(broadcast(part.select(col("p_partkey").as("l_partkey"),
        col("p_brand"))), "l_partkey")
      .groupBy("p_brand")
      .agg(sum("rev_c").as("revenue_cents"),
        count(lit(1)).as("n_small"))
  }

  /** Join-advisor thresholds: the broadcastable row bound and the
    * skew bound (largest key's share of its side, ppm). Same
    * constants MUST appear in the oracle SQL.
    */
  val JoinBroadcastRows = 1000000L
  val JoinSkewPpm = 100000L

  /** JOIN PRE-FLIGHT statistics — the planner-advisory relation a
    * 100 TB shop computes BEFORE running an unfamiliar equi-join:
    * exact per-side row/key counts, the EXACT join output cardinality
    * `Σ_k c_left(k)·c_right(k)` (what a mis-estimated join explodes
    * to), each side's largest key, the bigger side's skew share in
    * ppm, and the strategy hint the numbers imply (`salt` when one
    * key dominates past `JoinSkewPpm` — AQE's skew split handles
    * sort-merge skew but not a broadcast-build OOM; `broadcast` when
    * a side fits `JoinBroadcastRows`; else `shuffle`). One row —
    * results-as-data, the SNK3 discipline.
    *
    * Scale shape: one key-keyed count per side (map-side combined),
    * an equi-join of the two KEY relations (key-cardinality-sized,
    * never row-sized), three 1-row aggregates broadcast together.
    */
  def joinStats(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String): DataFrame = {
    val lc = left.groupBy(col(leftKey).as("k"))
      .agg(count(lit(1)).as("cl"))
    val rc = right.groupBy(col(rightKey).as("k"))
      .agg(count(lit(1)).as("cr"))
    val ls = lc.agg(sum("cl").as("n_left"),
      count(lit(1)).as("n_left_keys"), max("cl").as("max_left_key"))
    val rs = rc.agg(sum("cr").as("n_right"),
      count(lit(1)).as("n_right_keys"), max("cr").as("max_right_key"))
    val js = lc.join(rc, "k")
      .agg(coalesce(sum(col("cl") * col("cr")), lit(0L)).as("join_rows"))
    ls.crossJoin(broadcast(rs)).crossJoin(broadcast(js))
      .withColumn("skew_ppm",
        when(col("n_left") >= col("n_right"),
          expr("max_left_key * 1000000 div greatest(n_left, 1)"))
          .otherwise(expr("max_right_key * 1000000 div greatest(n_right, 1)")))
      .withColumn("hint",
        when(col("skew_ppm") > lit(JoinSkewPpm), lit("salt"))
          .when(least(col("n_left"), col("n_right")) <=
            lit(JoinBroadcastRows), lit("broadcast"))
          .otherwise(lit("shuffle")))
      .select(col("n_left"), col("n_right"), col("n_left_keys"),
        col("n_right_keys"), col("join_rows"), col("max_left_key"),
        col("max_right_key"), col("skew_ppm"), col("hint"))
  }

  /** Q9 constant: the part-name token selecting the product line. Same
    * value MUST appear in the oracle SQL.
    */
  val Q9NameToken = "red"

  /** TPC-H Q9 shape — product-line profit by (supplier nation, order
    * year): the 5-table line-order-part-supplier-nation join with a
    * substring dimension filter and a date-derived group key (the
    * testdata has no partsupp, so profit is the discounted revenue —
    * the join TOPOLOGY is the query class, not the cost term).
    * Revenue stays integer cents per row before any aggregation.
    *
    * Scale shape: part (filtered by the name token) and the
    * supplier→nation chain broadcast into the fact; orders joins the
    * fact on l_orderkey carrying only (orderkey, year) — at 100 TB
    * that is the one fact-fact shuffle, co-keyed; the final
    * (nation, year) aggregate is the only other exchange. No
    * cartesian, no window (plan-guarded).
    */
  def productProfit(nation: DataFrame, supplier: DataFrame,
      part: DataFrame, orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    val p = part.filter(col("p_name").contains(lit(Q9NameToken)))
      .select(col("p_partkey").as("l_partkey"))
    val supp = supplier
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("l_suppkey"), col("n_name"))
    val ord = orders.select(col("o_orderkey").as("l_orderkey"),
      year(col("o_orderdate")).cast("long").as("o_year"))
    lineitem
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        revCents.as("rev_c"))
      .join(broadcast(p), "l_partkey")
      .join(broadcast(supp), "l_suppkey")
      .join(ord, "l_orderkey")
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg(sum("rev_c").as("profit_cents"),
        count(lit(1)).as("n_lineitems"))
  }

  /** Bucket count for the co-located fact-fact join demonstration.
    * Buckets are an EXECUTION layout, not semantics — the oracle is
    * the plain join SQL.
    */
  val BucketCount = 8

  /** CO-LOCATED FACT-FACT JOIN over bucketed tables — the layout move
    * that deletes the shuffle from every repeated fact-fact join at
    * 100 TB: both facts are written `bucketBy(n, key)` + in-bucket
    * sorted, so the orderkey equi-join reads bucket i of each side
    * into the same task — NO Exchange on either side of the
    * SortMergeJoin (PlanSpec pins it with broadcast disabled; with
    * tiny testdata AQE would otherwise broadcast and hide the
    * property). A warehouse that joins lineitem⋈orders hourly pays
    * the bucketed write ONCE and every later join is shuffle-free —
    * the same amortization contract as the stored ANN/posting tiers.
    *
    * `ensureBucketed` writes both tables (external, at `dir`) if the
    * catalog doesn't already hold them for this dir — idempotent per
    * (session, dir); `bucketedRevenue` then joins THROUGH THE CATALOG
    * (bucport metadata lives there, a bare parquet read would forget
    * the layout) and rolls revenue up by order status. Values are the
    * usual integer cents.
    */
  def bucketedRevenue(spark: org.apache.spark.sql.SparkSession,
      dir: String, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    ensureBucketed(spark, dir, orders, lineitem)
    val o = spark.table(bucketTable(dir, "orders"))
      .select(col("o_orderkey"), col("o_orderstatus"))
    val l = spark.table(bucketTable(dir, "lineitem"))
      .select(col("l_orderkey"), revCents.as("rev_c"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(sum("rev_c").as("revenue_cents"),
        count(lit(1)).as("n_lineitems"))
  }

  /** Stable catalog names for the bucketed externals at `dir` —
    * suffixed with a COLLISION-FREE digest of the full path (SHA-256,
    * 16 hex chars) so two dirs can never alias one catalog entry the
    * way a 32-bit `hashCode` could; `ensureBucketed` additionally
    * verifies the surviving entry's files actually live under `dir`
    * before trusting it, so a stale catalog entry pointing elsewhere
    * is rebuilt, never silently served.
    */
  private def bucketTable(dir: String, t: String): String = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"${b & 0xff}%02x").mkString
    s"graft_bucketed_${t}_$digest"
  }

  /** Does the catalog table exist AND read its files from under the
    * expected location? An entry whose files moved (or an external
    * table left behind by a prior run against a different layout) is
    * treated as absent and rewritten.
    */
  private def bucketTableAt(spark: org.apache.spark.sql.SparkSession,
      table: String, expectedDir: String): Boolean =
    spark.catalog.tableExists(table) && {
      // the session caches the table's file index — refresh first, or
      // data moved out from under the entry is served from the stale
      // listing instead of detected
      spark.catalog.refreshTable(table)
      val want = new java.io.File(expectedDir).getAbsolutePath
      val files = spark.table(table).inputFiles
      // inputFiles are URIs (file:///tmp/...) — compare PATHS, not
      // prefixes of the raw string (a bare stripPrefix("file:") left
      // the `//` authority marker and failed every compare, silently
      // rewriting the tables on each call)
      // boundary-safe containment: the file must live UNDER want (or
      // be want itself) — a bare prefix compare would trust a stale
      // catalog entry whose files sit in a sibling dir sharing the
      // prefix (<dir>/ordersX vs <dir>/orders)
      val wantDir = want + java.io.File.separator
      files.nonEmpty && files.forall { f =>
        val p = try new java.net.URI(f).getPath catch {
          case _: java.net.URISyntaxException => f
        }
        p != null && (p == want || p.startsWith(wantDir))
      }
    }

  def ensureBucketed(spark: org.apache.spark.sql.SparkSession,
      dir: String, orders: DataFrame, lineitem: DataFrame): Unit = {
    val oT = bucketTable(dir, "orders")
    val lT = bucketTable(dir, "lineitem")
    if (!bucketTableAt(spark, oT, s"$dir/orders")) {
      spark.sql(s"DROP TABLE IF EXISTS $oT")
      orders.write.mode("overwrite").option("path", s"$dir/orders")
        .bucketBy(BucketCount, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(oT)
    }
    if (!bucketTableAt(spark, lT, s"$dir/lineitem")) {
      spark.sql(s"DROP TABLE IF EXISTS $lT")
      lineitem.write.mode("overwrite").option("path", s"$dir/lineitem")
        .bucketBy(BucketCount, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(lT)
    }
  }

  /** Q21 constants: the blamed nation and the report depth. Same
    * values MUST appear in the oracle SQL.
    */
  val Q21Nation = "NATION_9"
  val Q21TopK = 10

  /** TPC-H Q21 shape — suppliers who kept waiting: for finalized
    * ('F') orders, the suppliers of one nation whose lineitem shipped
    * LATE (shipdate after the order date — the testdata's
    * commit<receipt stand-in, Q4's rule) on a MULTI-SUPPLIER order
    * where they were the ONLY late supplier, counted per supplier.
    * The correlated EXISTS-chain compiles to the classic join pair:
    * EXISTS(other supplier on the order) → LEFT SEMI with the
    * cross-relation `suppkey ≠` residual; NOT EXISTS(other LATE
    * supplier) → LEFT ANTI with the same shape plus the late flag.
    *
    * Scale shape: all three EXISTS legs are the SAME derived
    * (orderkey, suppkey, late) relation — lineitem ⋈ F-orders,
    * computed once and persisted for the query; every self-leg joins
    * on l_orderkey, so the semi and anti legs co-partition with the
    * probe (one exchange each side, AQE reuses the repeat); the
    * supplier/nation dimension chain broadcasts at the very end onto
    * supplier-keyed counts (≤ |supplier| rows). No cartesian product
    * anywhere (plan-guarded).
    */
  def waitingSuppliers(nation: DataFrame, supplier: DataFrame,
      orders: DataFrame, lineitem: DataFrame,
      k: Int = Q21TopK): DataFrame = {
    val ord = orders.filter(col("o_orderstatus") === lit("F"))
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = graft.Caches.track(lineitem
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate")).as("late"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val l1 = li.filter(col("late"))
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val others = li.select(col("l_orderkey").as("o2"),
      col("l_suppkey").as("s2"), col("late").as("late2"))
    val blamed = l1
      .join(others, col("l_orderkey") === col("o2") &&
        col("l_suppkey") =!= col("s2"), "left_semi")
      .join(others.filter(col("late2")),
        col("l_orderkey") === col("o2") &&
          col("l_suppkey") =!= col("s2"), "left_anti")
    val supp = supplier
      .join(broadcast(nation.filter(col("n_name") === lit(Q21Nation))
          .select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    blamed.groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
      .join(broadcast(supp), "l_suppkey")
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(k)
  }

  /** TPC-H Q4 shape — order-priority check: orders in a one-quarter
    * window having at least one lineitem shipped AFTER the order date
    * (the testdata's "late shipment" stand-in for commit<receipt),
    * counted by priority. EXISTS compiles to a LEFT SEMI join whose
    * residual condition crosses both tables; the lineitem side
    * carries only (orderkey, shipdate).
    */
  def orderPriority(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val ord = orders
      .filter(col("o_orderdate") >= tsLit(orders, "o_orderdate", Q4Start) &&
        col("o_orderdate") < tsLit(orders, "o_orderdate", Q4End))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = lineitem.select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
  }
}
