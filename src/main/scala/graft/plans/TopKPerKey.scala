package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.LongType

/** Top-k rows per key — a whole-operator extension (logical node +
  * planner strategy + physical node, the full custom-operator stack
  * from SparkSessionExtensions).
  *
  * Spark's idiomatic form — `row_number() OVER (PARTITION BY key ORDER
  * BY ...)` then `filter(rank <= k)` — hash-partitions by key and then
  * SORTS EVERY ROW of every key group, buffering each group, only to
  * discard all but k rows. This operator keeps the same hash
  * distribution requirement (Catalyst still inserts the Exchange) but
  * replaces sort-then-discard with a bounded k-element heap per key:
  * no sort, no per-group buffering beyond k rows, no spill pressure —
  * O(n log k) comparisons instead of O(n log n), with memory k·|keys
  * per partition| instead of |rows per partition|.
  *
  * Rank semantics equal `row_number` exactly when the ordering is a
  * total order (as in the kNN queries: cosine desc, neighbor asc);
  * on ties at the k boundary the survivor among equal rows is
  * arbitrary — same as `row_number` itself.
  *
  * MEMORY CONTRACT: retained state is k rows × distinct keys per
  * partition, held in plain JVM collections with NO spill path (the
  * window form spills via UnsafeExternalSorter but buffers whole
  * groups). Use this operator when k·|keys per partition| is bounded
  * (top-k per query, per user, per session — the engine's uses);
  * prefer the window form for huge-cardinality keys with large k.
  * The contract is ENFORCED: a partition retaining more than
  * `spark.graft.topk.maxRowsPerPartition` rows (default 8388608) fails
  * fast with a message pointing at the window form, instead of
  * degrading into an opaque executor OOM.
  */
case class TopKPerKeyPlan(keys: Seq[Attribute], order: Seq[SortOrder], k: Int,
    rankAttr: AttributeReference, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Plans TopKPerKeyPlan → TopKPerKeyExec; injected by GraftExtensions
  * and (idempotently) by `TopK.perKey` for sessions built without the
  * extensions config.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, rankAttr, child) =>
      TopKPerKeyExec(keys, order, k, rankAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    rankAttr: Attribute, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  /** Rows of one key must meet in one partition — Catalyst inserts the
    * hash Exchange; NO required ordering (the heap replaces the sort).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) AllTuples :: Nil else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kk = k
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val outAttrs = output
    // memory-contract guard, resolved on the driver: retaining more
    // rows than this per partition means the key cardinality broke the
    // "bounded k·|keys|" assumption — fail with advice, don't OOM
    val maxRetained = conf
      .getConfString("spark.graft.topk.maxRowsPerPartition", "8388608").toLong
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // codegen'd comparator; lt(a, b) = a sorts before b = a is better
      val ord: Ordering[InternalRow] =
        GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap per key: head = worst retained row (first to evict)
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      var retained = 0L
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.getOrElse(key, null)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) {
          retained += 1
          if (retained > maxRetained) throw new IllegalStateException(
            s"TopKPerKey retained > $maxRetained rows in one partition " +
              s"(k=$kk × too many distinct keys) — this operator holds " +
              "k rows per key on-heap with no spill path. Use the " +
              "row_number window form for high-cardinality keys, or " +
              "raise spark.graft.topk.maxRowsPerPartition")
          heap.enqueue(row.copy())
        } else if (ord.lt(row, heap.head)) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      heaps.iterator.flatMap { case (_, heap) =>
        // dequeueAll emits worst-first; reverse = rank 1..k order
        val ranked: Seq[InternalRow] = heap.dequeueAll.reverse
        ranked.iterator.zipWithIndex.map { case (row, i) =>
          rankRow.update(0, (i + 1).toLong)
          outProj(joined(row, rankRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** DataFrame-level API: `TopK.perKey(df, Seq("key"), Seq(col("x").desc,
  * col("id").asc), k)` → df's columns + a `rank` column (1-based).
  */
object TopK {

  private def ensure(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.exists(_ eq TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
  }

  /** Order resolution. DIRECT path first: ColumnBridge converts each
    * order Column to its catalyst expression (`col("x").desc` → a
    * catalyst SortOrder over an UnresolvedAttribute; a bare column
    * defaults to Ascending, like Dataset.sort), and the attributes
    * resolve against the df's analyzed output by name — no throwaway
    * plan. That covers every in-engine use (orders over existing /
    * pre-projected columns). Orders the direct path CANNOT fully
    * resolve — e.g. function calls, which need the analyzer's
    * FunctionRegistry — fall back to lifting the SortOrders from an
    * analyzed throwaway sortWithinPartitions; that analyzed shape is
    * VALIDATED, not cast, so a Spark upgrade changing it fails with a
    * message instead of a ClassCastException or a silently different
    * plan. Returns (orders, usedAnalyzerFallback) — the flag exists
    * for the spec pinning which path serves which input.
    */
  private[graft] def resolveOrders(df: DataFrame, order: Seq[Column])
      : (Seq[SortOrder], Boolean) = {
    val child = df.queryExecution.analyzed
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    def resolveDirect(c: Column): SortOrder = {
      val so = ColumnBridge.convertedExpression(df.sparkSession, c) match {
        case s: SortOrder => s
        case e => SortOrder(e, Ascending)
      }
      so.transformUp {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          child.resolve(u.nameParts, resolver) match {
            case Some(a: Alias) => a.child // nested-field access
            case Some(ne) => ne
            case None => u // leave unresolved → triggers the fallback
          }
      }.asInstanceOf[SortOrder]
    }
    def analyzerLift(): Seq[SortOrder] =
      df.sortWithinPartitions(order: _*).queryExecution.analyzed match {
        case s: org.apache.spark.sql.catalyst.plans.logical.Sort
            if s.child.output == child.output => s.order
        case other => throw new IllegalStateException(
          "topKPerKey: could not lift resolved order columns against " +
            s"${child.output.map(_.name).mkString("[", ", ", "]")} " +
            s"(analyzer produced ${other.nodeName}, expected Sort over the " +
            "same output) — order expressions must reference the " +
            "DataFrame's existing columns")
      }
    val direct = order.map(resolveDirect)
    if (direct.forall(so =>
        so.resolved && so.references.subsetOf(child.outputSet)))
      (direct, false)
    else (analyzerLift(), true)
  }

  def perKey(df: DataFrame, keyNames: Seq[String], order: Seq[Column], k: Int,
      rankName: String = "rank"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    ensure(spark)
    val child = df.queryExecution.analyzed
    // key lookup honors the session's name-resolution semantics
    // (spark.sql.caseSensitive), like every other DataFrame API
    val resolver = spark.sessionState.analyzer.resolver
    val (ord, _) = resolveOrders(df, order)
    val keyAttrs = keyNames.map { n =>
      child.output.filter(a => resolver(a.name, n)) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"topKPerKey: no column '$n' in ${child.output.map(_.name)}")
        case many => throw new IllegalArgumentException(
          s"topKPerKey: ambiguous column '$n' (${many.size} matches) — " +
            "disambiguate with aliases before calling")
      }
    }
    val rankAttr = AttributeReference(rankName, LongType, nullable = false)()
    ColumnBridge.ofRows(spark,
      TopKPerKeyPlan(keyAttrs, ord, k, rankAttr, child))
  }
}
