package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Precise cache ownership for the engine's operators.
  *
  * Operators persist exactly what they internally reuse within one
  * query and REGISTER it here (`track` / `trackRdd`); the CONSUMER
  * that triggered the action calls `Caches.clear` when it is done with
  * the result. That scopes persistence to a query, so a long-lived
  * session running many queries back-to-back (PipelineApp, Verify,
  * Bench, notebooks) never accumulates dead blocks until eviction
  * starts thrashing — and, because only TRACKED entries are released,
  * a host session's own unrelated `df.cache()`s are never touched
  * (earlier rounds cleared the whole session cache, which evicted
  * caches the host owned).
  */
object Caches {

  // STRONG references, deliberately: a weak registry can be GC'd
  // before clear() runs, orphaning still-persisted blocks until the
  // async ContextCleaner notices — non-deterministic cleanup. The
  // entries are tiny (plan references); the contract is that consumers
  // call clear() after each query's action, which drains the queue.
  private val dfs = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val rdds = new java.util.concurrent.ConcurrentLinkedQueue[RDD[_]]()

  /** Register an operator-persisted DataFrame for later release. */
  def track(df: DataFrame): DataFrame = { dfs.add(df); df }

  /** Register an operator-persisted RDD for later release. */
  def trackRdd[T](rdd: RDD[T]): RDD[T] = { rdds.add(rdd); rdd }

  /** Release every TRACKED cache (and only those). The `spark`
    * parameter is unused but kept so call sites read as session-scoped.
    */
  def clear(spark: SparkSession): Unit = {
    var df = dfs.poll()
    while (df != null) {
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
      df = dfs.poll()
    }
    var rdd = rdds.poll()
    while (rdd != null) {
      try rdd.unpersist(blocking = false) catch { case _: Throwable => () }
      rdd = rdds.poll()
    }
  }
}
