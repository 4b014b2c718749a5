package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.control.NonFatal

/** Precise cache ownership for the engine's operators.
  *
  * Operators persist exactly what they internally reuse within one
  * query and REGISTER it here (`track` / `trackRdd`); the CONSUMER
  * that triggered the action releases those entries when it is done
  * with the result. Two scoping levels:
  *
  *   - `Caches.scoped { build + act }` — a per-invocation LEASE: every
  *     cache an operator tracks on this thread inside the block belongs
  *     to the block, and is released when the block exits (even on
  *     failure). A concurrent query on another thread/session has its
  *     own lease, so neither can unpersist the other's caches, and a
  *     library consumer embedded in a long-lived host app never leaks
  *     blocks past its own call. Scopes nest: the innermost wins.
  *   - `Caches.clear(spark)` — drains the DEFAULT lease (everything
  *     tracked outside any scope). The engine's own drivers (Verify,
  *     Bench, CLI apps) run queries strictly back-to-back on one
  *     thread, so the default lease + clear-after-each-action is exact
  *     for them; `scoped` is the isolation story for everyone else.
  *
  * The registry keeps STRONG references, deliberately: a weak registry
  * can be GC'd before release runs, orphaning still-persisted blocks
  * until the async ContextCleaner notices — non-deterministic cleanup.
  * Entries are tiny (plan references); the contract is that consumers
  * release after each query's action, which drains the lease.
  */
object Caches {

  /** One query invocation's tracked caches. Thread-safe: operators may
    * build DataFrames on forked threads while the lease is shared.
    */
  final class Lease private[Caches] () {
    private[Caches] val dfs =
      new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    private[Caches] val rdds =
      new java.util.concurrent.ConcurrentLinkedQueue[RDD[_]]()
    private[Caches] val hooks =
      new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

    /** Unpersist every entry tracked under this lease (and only those). */
    def release(): Unit = {
      var df = dfs.poll()
      while (df != null) {
        try df.unpersist(blocking = false) catch { case NonFatal(_) => () }
        df = dfs.poll()
      }
      var rdd = rdds.poll()
      while (rdd != null) {
        try rdd.unpersist(blocking = false) catch { case NonFatal(_) => () }
        rdd = rdds.poll()
      }
      var h = hooks.poll()
      while (h != null) {
        try h() catch { case NonFatal(_) => () }
        h = hooks.poll()
      }
    }
  }

  /** Everything tracked outside an explicit scope lands here. */
  private val defaultLease = new Lease

  /** Innermost active scope of the current thread (null = default). */
  private val active = new ThreadLocal[Lease]

  private def leaseNow: Lease = {
    val l = active.get()
    if (l == null) defaultLease else l
  }

  /** Register an operator-persisted DataFrame for later release. */
  def track(df: DataFrame): DataFrame = { leaseNow.dfs.add(df); df }

  /** Register an operator-persisted RDD for later release. */
  def trackRdd[T](rdd: RDD[T]): RDD[T] = { leaseNow.rdds.add(rdd); rdd }

  /** Register a callback run when the current lease drains — the
    * query-end signal for resources whose lifetime must outlast the
    * call that handed them out (PlanMemo ref-counts ride on this: a
    * memoized checkpoint handed to THIS query cannot be destroyed by
    * LRU eviction until this lease releases).
    */
  def onRelease(f: () => Unit): Unit = leaseNow.hooks.add(f)

  /** Run `body` under a fresh per-invocation lease: caches tracked on
    * this thread inside the block are released when the block exits.
    * The block must contain BOTH the query construction and the action
    * that consumes it (tracking happens at construction time).
    */
  def scoped[A](body: => A): A = {
    val lease = new Lease
    val prev = active.get()
    active.set(lease)
    try body
    finally {
      active.set(prev)
      lease.release()
    }
  }

  /** Release every cache tracked under the DEFAULT lease (and only
    * those — scoped leases and the host session's own `df.cache()`s are
    * never touched). The `spark` parameter is unused but kept so call
    * sites read as session-scoped.
    */
  def clear(spark: SparkSession): Unit = defaultLease.release()
}
