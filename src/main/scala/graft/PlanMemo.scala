package graft

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
  * Builds run OUTSIDE the lock: a racing duplicate build is benign
  * (last write wins, both values correct); the engine's own drivers
  * are single-threaded anyway.
  */
final class PlanMemo[T](slots: Int) {
  require(slots >= 1, s"slots must be >= 1, got $slots")

  private val map =
    new java.util.LinkedHashMap[String, (AnyRef, T)](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (AnyRef, T)]): Boolean =
        size > slots
    }

  /** Hit counter — exists so the reuse specs can pin that the twin
    * gate actually reused instead of silently rebuilding.
    */
  val hits = new java.util.concurrent.atomic.AtomicLong

  /** Return the memoized value for (input plan, params), building and
    * recording it on a miss. `input` is the relation whose canonical
    * plan identifies the data; `params` must carry every constant the
    * built value depends on.
    */
  def getOrBuild(input: DataFrame, params: String)(build: => T): T = {
    val s = input.sparkSession
    val key = s"${s.sparkContext.applicationId}|" +
      s"${System.identityHashCode(s)}|$params"
    val plan: AnyRef = input.queryExecution.analyzed.canonicalized
    map.synchronized {
      val hit = map.get(key)
      if (hit != null && hit._1 == plan) {
        hits.incrementAndGet()
        return hit._2
      }
    }
    val v = build
    map.synchronized { map.put(key, (plan, v)) }
    v
  }
}
