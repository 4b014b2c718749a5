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
    new java.util.LinkedHashMap[(String, List[AnyRef]), Entry](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, List[AnyRef]), Entry]): Boolean = {
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

  /** Return the memoized value for (input plans, params), building and
    * recording it on a miss. `input` is the relation whose canonical
    * plan identifies the data; `extraInputs` are any FURTHER relations
    * the built value depends on (a beam ranking depends on the graph
    * AND the corpus AND the query batch) — every one participates in
    * the key as a canonicalized plan OBJECT, so all inputs get the
    * same structural-equality guarantee (digest strings in `params`
    * would leave a hash collision silently serving the wrong value).
    * `params` must carry every remaining constant the built value
    * depends on. The returned value is guaranteed alive until the
    * calling query's lease drains, whatever later calls evict.
    */
  def getOrBuild(input: DataFrame, params: String,
      extraInputs: Seq[DataFrame] = Nil)(build: => T): T = {
    val s = input.sparkSession
    val key = (s"${s.sparkContext.applicationId}|" +
      s"${System.identityHashCode(s)}|$params",
      (input +: extraInputs).toList
        .map(_.queryExecution.analyzed.canonicalized: AnyRef))
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
    * Under the debug guard the release is also RECORDED, so any later
    * job reading the dead checkpoint names this release site instead
    * of failing with a bare missing-block error.
    */
  val releaseDf: org.apache.spark.sql.DataFrame => Unit =
    df => try {
      if (MemoDebug.enabled) MemoDebug.recordRelease(df)
      org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(df)
    } catch { case scala.util.control.NonFatal(_) => () }
}

/** DEBUG-MODE use-after-release guard (`-Dgraft.memo.debug=1`, or
  * `sys.props` in a spec). The ref-count makes eviction safe, but one
  * hazard stays conventional: a served DataFrame that ESCAPES its
  * query's lease and is executed after `Caches.clear` drains it would
  * read checkpoint blocks `releaseDf` already dropped — at best an
  * obscure CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND from deep inside the
  * scan, at worst (blocks not yet evicted by the async unpersist) a
  * silently-served stale read. No in-repo caller violates the
  * convention; this guard exists so a future one fails LOUDLY and
  * NAMED: every release records the checkpoint RDD ids plus the
  * releasing stack, a SparkListener flags any later job that reads a
  * released id, and specs (or a paranoid host app) assert
  * `useAfterRelease` stayed null.
  *
  * Off by default: the per-release stack capture and per-job id sweep
  * are debug-budget work, and the listener path is advisory (jobs are
  * flagged, not aborted — a listener cannot veto a running query).
  */
object MemoDebug {
  def enabled: Boolean = sys.props.get("graft.memo.debug").contains("1")

  /** released checkpoint-RDD id → abbreviated release-site stack */
  private val released =
    new java.util.concurrent.ConcurrentHashMap[Int, String]()
  private val installed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** First violation seen (null = none) — the spec-facing signal. */
  val useAfterRelease =
    new java.util.concurrent.atomic.AtomicReference[String](null)

  /** Forget recorded releases + any flagged violation (spec hygiene —
    * one test's releases must not flag another's legitimate jobs).
    */
  def reset(): Unit = { released.clear(); useAfterRelease.set(null) }

  private[graft] def recordRelease(
      df: org.apache.spark.sql.DataFrame): Unit = {
    val sc = df.sparkSession.sparkContext
    if (installed.add(sc.applicationId)) sc.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          js.stageInfos.foreach(_.rddInfos.foreach { ri =>
            val at = released.get(ri.id)
            if (at != null) {
              val msg = s"[memo] USE-AFTER-RELEASE: job ${js.jobId} reads " +
                s"checkpoint RDD ${ri.id} (${ri.name}) whose memo entry " +
                s"was released at: $at"
              System.err.println(msg)
              useAfterRelease.compareAndSet(null, msg)
            }
          })
      })
    val stack = Thread.currentThread().getStackTrace.iterator
      .drop(1) // getStackTrace frame
      .filterNot(f => f.getClassName.startsWith("graft.PlanMemo") ||
        f.getClassName.startsWith("graft.MemoDebug"))
      .take(10).mkString(" <- ")
    org.apache.spark.sql.graft.ColumnBridge.checkpointRddIds(df)
      .foreach(id => released.put(id, stack))
  }
}
