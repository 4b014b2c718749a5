package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame

/** Bounded memo of expensive relations keyed by (session, params,
  * canonicalized input-plan OBJECT) — the session-level reuse layer
  * behind the operators whose consumers arrive back to back over the
  * SAME input: the Brandes σ layers (`graph_path_counts` →
  * `graph_stress`), the labeled centrality sweep (`graph_closeness` →
  * `graph_eccentricity` → `graph_diameter`), the default ngram cluster
  * labelling (five dedup/curation gates), the corpus kNN graph
  * (`knn_graph` → `knn_mutual` → the beam family). Values must be
  * CHECKPOINT-BACKED (statsFreeLocalCheckpoint) so the per-query
  * `Caches.clear` lease drain cannot evict them — the memo is
  * session-lived by construction and dies with the JVM.
  *
  * Keying discipline: the params string pins session identity
  * (applicationId + session identity hash) and the operator's
  * constants; the canonicalized ANALYZED PLAN is compared as an
  * OBJECT, not a string — structural equality sees LocalRelation data
  * and file-index roots, both of which plan strings elide, so a stale
  * reuse across different inputs is structurally impossible rather
  * than merely improbable. `slots` bounds retention (LRU) so a long
  * session over many inputs cannot accumulate checkpoint blocks.
  *
  * Lifetime is REF-COUNTED, so no eviction policy can destroy a value
  * out from under a consumer: the map holds one reference per entry,
  * and every `getOrBuild` return takes another, released when the
  * caller's `Caches` lease drains (the query-end signal — `scoped`
  * exit or `Caches.clear`). LRU eviction and `clear()` only drop the
  * MAP's reference; the checkpoint blocks are actually released when
  * the last in-flight query that was handed the value finishes. A
  * racing duplicate build still resolves FIRST-WRITE-WINS — the loser
  * releases the value IT just built (provably unreferenced) and
  * serves the incumbent under a fresh reference.
  */
final class PlanMemo[T](slots: Int,
    release: T => Unit = (_: T) => ()) {
  require(slots >= 1, s"slots must be >= 1, got $slots")

  PlanMemo.register(this)

  /** A memoized value plus its reference count. Starts at 1 — the
    * map's own reference. `releaseRef` runs the destructor exactly
    * once, when the count first reaches zero.
    */
  private final class Entry(val value: T) {
    private val refs = new AtomicInteger(1)
    def retain(): Unit = refs.incrementAndGet()
    def releaseRef(): Unit =
      if (refs.decrementAndGet() == 0) release(value)
  }

  // the PLAN participates in the MAP KEY (tuple equality → structural
  // plan equality), so two different inputs under the same params are
  // distinct ENTRIES — a value-side plan compare would silently
  // overwrite one input's artifact with the other's and leak the
  // replaced checkpoint without ever releasing it
  private val map =
    new java.util.LinkedHashMap[(String, AnyRef), Entry](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, AnyRef), Entry]): Boolean = {
        val evict = size > slots
        if (evict) e.getValue.releaseRef() // drop the MAP's reference only
        evict
      }
    }

  /** Drop every entry (releasing the MAP's reference on each; blocks
    * held by an in-flight query survive until its lease drains) — the
    * session-teardown / leak-audit hook `PlanMemo.releaseAll` drives.
    */
  def clear(): Unit = map.synchronized {
    val it = map.values.iterator
    while (it.hasNext) it.next().releaseRef()
    map.clear()
  }

  /** Hit counter — exists so the reuse specs can pin that the twin
    * gate actually reused instead of silently rebuilding.
    */
  val hits = new java.util.concurrent.atomic.AtomicLong

  /** Hand `e`'s value to the calling query: one reference taken now,
    * given back when the caller's Caches lease drains.
    */
  private def lend(e: Entry): T = {
    e.retain()
    Caches.onRelease(() => e.releaseRef())
    e.value
  }

  /** Return the memoized value for (input plan, params), building and
    * recording it on a miss. `input` is the relation whose canonical
    * plan identifies the data; `params` must carry every constant the
    * built value depends on. The returned value is guaranteed alive
    * until the calling query's lease drains, whatever later calls
    * evict.
    */
  def getOrBuild(input: DataFrame, params: String)(build: => T): T = {
    val s = input.sparkSession
    val key = (s"${s.sparkContext.applicationId}|" +
      s"${System.identityHashCode(s)}|$params",
      input.queryExecution.analyzed.canonicalized: AnyRef)
    map.synchronized {
      val e = map.get(key)
      if (e != null) {
        hits.incrementAndGet()
        return lend(e)
      }
    }
    val v = build
    map.synchronized {
      val prev = map.get(key)
      if (prev != null && prev.value != v) {
        // racing duplicate build: FIRST write wins. The incumbent may
        // already be held by the racer that stored it, so the only
        // value that is provably unreferenced is the one WE just
        // built and have not yet returned — release v, serve prev.
        release(v)
        lend(prev)
      } else {
        val e = new Entry(v)
        map.put(key, e)
        lend(e)
      }
    }
  }
}

object PlanMemo {
  private val instances =
    new java.util.concurrent.ConcurrentLinkedQueue[PlanMemo[_]]()

  private def register(m: PlanMemo[_]): Unit = instances.add(m)

  /** Release every memo's entries across the process — the hook a
    * leak audit (or an embedding host tearing a session down) calls;
    * the memos otherwise hold their checkpoint blocks for the life of
    * the session BY DESIGN (that reuse is their whole point).
    */
  def releaseAll(): Unit = instances.forEach(_.clear())

  /** The standard release for DataFrame-valued memos: drop the
    * checkpoint's cached blocks eagerly (GC-driven cleanup is lazy).
    */
  val releaseDf: org.apache.spark.sql.DataFrame => Unit =
    df => try org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(df)
    catch { case scala.util.control.NonFatal(_) => () }
}
