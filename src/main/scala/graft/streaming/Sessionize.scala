package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user session assembly over the events table — gap-based
  * sessionization, the canonical stateful-streaming operator.
  *
  * Two implementations with identical output:
  *   - `sessions`: built-in `session_window` — runs in batch (oracle-
  *     checkable gaps-and-islands SQL twin) and in streaming;
  *   - `sessionsStateful`: explicit `flatMapGroupsWithState` — the
  *     escape hatch for session logic session_window can't express
  *     (custom merge rules, per-session early emission). Kept
  *     semantically identical here so the two are cross-checkable.
  */
object Sessionize {

  val GapMinutes = 30L
  val GapUs: Long = GapMinutes * 60L * 1000000L

  /** Sessions per user: events closer than the gap merge. Output bounds
    * in epoch microseconds (BIGINT — no timestamp dtype drift vs the
    * oracle); session_end = last event + gap, matching session_window.
    */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$GapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n_events"))

  /** STREAMING variant of `sessions`: the SAME session_window
    * aggregation under a watermark, so closed sessions emit exactly
    * once in Append mode. Spark's streaming session store MERGES a
    * window still open in state with events arriving in later
    * micro-batches (the cross-batch session-merge path the spec
    * drives); a session only emits once the watermark passes its end.
    * Output schema and session arithmetic are identical to the batch
    * operator — streaming ≡ batch on the same events is spec-pinned.
    */
  def sessionsStreaming(events: DataFrame,
      watermark: String = "60 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$GapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n_events"))

  /** Gaps under this count as "rapid-fire" in `interArrival` — a
    * bot/scraper signal for data curation (a human browse session
    * rarely emits sub-second event trains). Same constant MUST appear
    * in the oracle SQL.
    */
  val RapidGapUs = 1000000L

  /** Per-user inter-arrival statistics — the burstiness profile a
    * curation pipeline filters automated traffic by (and the
    * event-rate sanity check run before sessionizing at all). For each
    * user: event count, adjacent-gap count, min/max gap, total span,
    * and the number of sub-`RapidGapUs` gaps. All outputs are exact
    * integers (microseconds / counts) — no float aggregation, per the
    * repo's float-parity rule.
    *
    * Gap semantics: gaps are consecutive differences of the user's
    * timestamps sorted ascending. Equal timestamps produce zero-length
    * gaps; the multiset of gaps is order-independent because the
    * sorted sequence is (ties contribute the same zero gaps whichever
    * row "comes first"), so every aggregate here is deterministic even
    * though `lag` itself isn't total-ordered under ties. Single-event
    * users report n_gaps = 0 and min/max gap = -1 (sentinel — the
    * oracle cannot distinguish engine nulls portably).
    *
    * Scale shape: ONE shuffle keyed by user_id (the window partition),
    * spillable sort within each user's partition slice, then a
    * map-side-combinable aggregation on the same key — no global
    * window, no collect. A celebrity user funnels through one task's
    * sort, the same caveat as `sessions`; the time-bucketed carry-in
    * trick `AsofJoin.asofJoinBucketed` uses is the escape hatch if a
    * single key's event count ever exceeds one task's spill budget.
    */
  def interArrival(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us")
    events.select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        count(col("gap")).as("n_gaps"),
        coalesce(min(col("gap")), lit(-1L)).as("min_gap_us"),
        coalesce(max(col("gap")), lit(-1L)).as("max_gap_us"),
        (max(col("us")) - min(col("us"))).as("span_us"),
        sum(when(col("gap") < RapidGapUs, 1L).otherwise(0L)).as("n_rapid"))
  }

  /** Time-bucket width for `interArrivalBucketed` — one hour in
    * microseconds. A knob, not a semantic: any width gives identical
    * output (spec-pinned); it only tunes how many tasks a celebrity
    * user's history spreads over.
    */
  val InterArrivalBucketUs = 3600000000L

  /** `interArrival` with the celebrity-key escape hatch WIRED — the
    * `asofJoinBucketed`-style time-bucketed carry-in. The flat
    * operator funnels a user's entire history through ONE task's
    * window sort; a celebrity key (a bot account, a default/null user
    * id) with 10% of all events makes that task the straggler and, far
    * enough out, exceeds its spill budget. Here the per-event work is
    * keyed by (user_id, time bucket) instead:
    *
    *   1. within each (user, bucket): sort locally, adjacent gaps,
    *      aggregate to ONE row (count, gap count, min/max gap, rapid
    *      count, first/last timestamp) — a celebrity's events spread
    *      over #buckets tasks, each sorting only its slice;
    *   2. per user over the BUCKET rows (orders of magnitude fewer
    *      than events): one tiny window carries the previous
    *      non-empty bucket's last timestamp in, turning each bucket
    *      boundary into exactly one gap — the carry-in;
    *   3. fold bucket aggregates: gaps are adjacent differences of
    *      the sorted sequence, and bucket assignment is monotone in
    *      the timestamp (equal timestamps share a bucket), so the
    *      concatenation of per-bucket sorted slices IS the globally
    *      sorted sequence — within-bucket gaps plus boundary gaps is
    *      the exact gap multiset, and min/max/count/rapid all merge.
    *
    * Output is spec-pinned IDENTICAL to `interArrival` (and the gate
    * shares its oracle SQL verbatim). Cost of the hatch: one extra
    * (user-keyed) shuffle of bucket-sized rows — only worth it when a
    * key can exceed a task; the flat form stays the default.
    */
  def interArrivalBucketed(events: DataFrame,
      bucketUs: Long = InterArrivalBucketUs): DataFrame = {
    require(bucketUs >= 1L, s"bucketUs must be >= 1, got $bucketUs")
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "bkt").orderBy("us")
    val perBucket = events
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      // floor-aligned bucket start (pmod is non-negative, so this
      // floors for negative us too): monotone in us, and equal
      // timestamps share a bucket — the two properties step 3 needs
      .withColumn("bkt", col("us") - pmod(col("us"), lit(bucketUs)))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(wb))
      .groupBy("user_id", "bkt")
      .agg(
        count(lit(1)).as("n_b"),
        count(col("gap")).as("n_gaps_b"),
        min(col("gap")).as("min_gap_b"),
        max(col("gap")).as("max_gap_b"),
        min(col("us")).as("first_us"),
        max(col("us")).as("last_us"),
        sum(when(col("gap") < RapidGapUs, 1L).otherwise(0L))
          .as("n_rapid_b"))
    val wu = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("bkt")
    // the carry-in: each bucket's first event closes one gap against
    // the previous non-empty bucket's last event (null for the first)
    perBucket
      .withColumn("bgap", col("first_us") - lag(col("last_us"), 1).over(wu))
      .groupBy("user_id")
      .agg(
        sum(col("n_b")).as("n_events"),
        (sum(col("n_gaps_b")) + count(col("bgap"))).as("n_gaps"),
        // least/greatest skip nulls (all-null → null → the sentinel)
        coalesce(least(min(col("min_gap_b")), min(col("bgap"))), lit(-1L))
          .as("min_gap_us"),
        coalesce(greatest(max(col("max_gap_b")), max(col("bgap"))), lit(-1L))
          .as("max_gap_us"),
        (max(col("last_us")) - min(col("first_us"))).as("span_us"),
        (sum(col("n_rapid_b")) +
          sum(when(col("bgap") < RapidGapUs, 1L).otherwise(0L)))
          .as("n_rapid"))
  }

  /** Within-session event-type TRANSITION counts — the first-order
    * Markov (behavioral bigram) model over user journeys, the events
    * twin of `TextOps.bigramLm`. A transition is counted for every
    * pair of CONSECUTIVE events of one user (ordered by (ts,
    * event_id) — event_id breaks same-microsecond ties, so the
    * sequence and therefore the counts are deterministic) whose gap
    * is under the session threshold: cross-session adjacencies are
    * NOT journeys, so a ≥ `GapUs` gap severs the chain, exactly the
    * break rule `sessions` groups by. Output one row per observed
    * (prev_type, event_type) pair with its count — the transition
    * matrix a journey model / next-event predictor is estimated from.
    *
    * Scale shape: ONE user-keyed shuffle (the window partition — same
    * spill posture as `interArrival`), then a map-side-combinable
    * aggregation whose key space is |types|² — the output is tiny no
    * matter how large the corpus. No collect, no global window.
    */
  def transitions(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .filter(col("prev_type").isNotNull && col("gap") < GapUs)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** `transitions` with the same celebrity-key escape hatch as
    * `interArrivalBucketed`: per-(user, time-bucket) windows count the
    * IN-BUCKET consecutive pairs (a hot user's history spreads over
    * #buckets tasks), then one tiny window over the per-bucket
    * first/last event rows adds exactly the BOUNDARY pair between
    * adjacent non-empty buckets (gap rule applied there like
    * anywhere). Correct for the same reason the interArrival merge
    * is: bucket assignment is monotone in `us` and ties share a
    * bucket, so the concatenation of bucket-sorted slices IS the
    * global (us, event_id) order, and every consecutive pair is
    * either within one bucket or a bucket boundary. first/last per
    * bucket are `min`/`max` of the (us, event_id, type) struct — the
    * unique (us, event_id) prefix decides, so both are deterministic.
    * Output is pinned row-identical to `transitions` (shared oracle).
    */
  def transitionsBucketed(events: DataFrame,
      bucketUs: Long = InterArrivalBucketUs): DataFrame = {
    require(bucketUs >= 1L, s"bucketUs must be >= 1, got $bucketUs")
    val e = events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .withColumn("bkt", col("us") - pmod(col("us"), lit(bucketUs)))
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "bkt").orderBy("us", "event_id")
    val inBucket = e
      .withColumn("prev_type", lag(col("event_type"), 1).over(wb))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(wb))
      .filter(col("prev_type").isNotNull && col("gap") < GapUs)
      .select(col("prev_type"), col("event_type"))
    val perBucket = e.groupBy("user_id", "bkt").agg(
      min(struct(col("us"), col("event_id"), col("event_type")))
        .as("first"),
      max(struct(col("us"), col("event_id"), col("event_type")))
        .as("last"))
    val wu = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("bkt")
    val boundary = perBucket
      .withColumn("p_last", lag(col("last"), 1).over(wu))
      // p_last.event_type must ALSO be non-null: the flat form's
      // `prev_type.isNotNull` filter drops a pair whose lagged type is
      // null, so a null-typed event closing a bucket must not leak a
      // (null, type) boundary row the flat operator never emits
      .filter(col("p_last").isNotNull &&
        col("p_last.event_type").isNotNull &&
        col("first.us") - col("p_last.us") < GapUs)
      .select(col("p_last.event_type").as("prev_type"),
        col("first.event_type").as("event_type"))
    inBucket.unionByName(boundary)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Top session PATHS under `sessionPaths` — ranked most-common-first. */
  val PathTopK = 20

  /** The k most common session journeys: each session's event types
    * concatenated in (ts, event_id) order into one `a>b>c` path
    * string, counted across all sessions, top `k` by (count DESC,
    * path ASC) — the "common user journeys" view product analytics
    * reads next to the funnel, and a sequence-mining input. Session
    * assignment is the same gaps-and-islands rule as `sessions`
    * (break at gaps ≥ `GapUs`), made fully deterministic by the
    * (us, event_id) tiebreak — same-microsecond events order by id on
    * both engines, so the path STRINGS match byte-for-byte.
    *
    * Scale shape: one user-keyed shuffle for the session-id windows,
    * one (user, session)-keyed aggregation building each path (state
    * bounded by one session's events — the same per-key buffer
    * session_window holds), one map-side-combinable count by path,
    * then TakeOrdered for the top k (per-partition heaps of k — never
    * a global sort). Path strings can approach #sessions in
    * cardinality; only the count-by-path shuffle carries them, once
    * each.
    */
  def sessionPaths(events: DataFrame, k: Int = PathTopK): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    val cum = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      // first event of a user has a null gap → `when` falls through to
      // 1: a new session opens, matching the oracle's explicit IS NULL
      .withColumn("brk",
        when(col("us") - lag(col("us"), 1).over(w) < GapUs, 0L)
          .otherwise(1L))
      .withColumn("sid", sum(col("brk")).over(cum))
      .groupBy(col("user_id"), col("sid"))
      // array_sort on (us, event_id, type) structs: the unique
      // (us, event_id) prefix decides, so collect_list order is moot
      .agg(array_sort(collect_list(
        struct(col("us"), col("event_id"), col("event_type")))).as("evs"))
      .select(concat_ws(">",
        expr("transform(evs, e -> e.event_type)")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(k)
  }

  case class TEv(user_id: Long, us: Long, event_id: Long, event_type: String)
  case class LastEv(us: Long, event_id: Long, event_type: String)
  case class Transition(prev_type: String, event_type: String)

  /** `transitions` as explicit state-machine logic — the
    * `flatMapGroupsWithState` form a STREAMING deployment of the
    * transition matrix uses (state = the user's last event, carried
    * across micro-batches so a session spanning two batches still
    * counts its boundary transition). Run here in batch mode (each
    * group visited once) and pinned count-identical to the window
    * implementation: the driver gate `events_transitions_stateful`
    * shares events_transitions' oracle, exactly the
    * funnel/funnelStateful pairing. Incoming state (None in batch) is
    * the previous event; ordering inside a group is (us, event_id) —
    * the same deterministic tiebreak as the batch window.
    */
  def transitionsStateful(spark: SparkSession,
      events: DataFrame): DataFrame =
    transitionPairs(spark, events, keepState = false)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** The transition state machine itself: one `Transition` row per
    * consecutive in-gap event pair. `keepState = false` is the batch
    * mode (each group visited once, state flushed at group end);
    * `keepState = true` is the STREAMING mode — the user's last event
    * stays in the state store so a pair split across two micro-batches
    * still counts its boundary transition (the cross-batch carry the
    * spec drives under a real StreamingQuery).
    *
    * Streaming admission contract (same family as `cusumStateful`'s):
    * each user's events must arrive in (us, event_id) order ACROSS
    * micro-batches — emitted transitions are final (Append mode cannot
    * retract), so an event older than the held state would create
    * pairs the batch order never had. Within a batch the group sorts,
    * so intra-batch disorder is fine; an hourly-triggered ingestion of
    * an append-only log satisfies the cross-batch part by shape. The
    * contract is ENFORCED, not assumed: a batch opening behind the
    * carried state fails a loud require naming it (the cusumStateful
    * lesson — never silently emit pairs the batch order never had).
    */
  private[graft] def transitionPairs(spark: SparkSession,
      events: DataFrame, keepState: Boolean): Dataset[Transition] = {
    import spark.implicits._
    events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .as[TEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEv, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[TEv], state: GroupState[LastEv]) =>
          // iterators carry no order guarantee — sort within the
          // group, bounded by one user's events (same buffer as the
          // window partition's sort; one micro-batch's worth when
          // streaming)
          val evs = rows.toArray.sortBy(e => (e.us, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer[Transition]()
          var prev = state.getOption.orNull
          if (keepState && prev != null && evs.nonEmpty) {
            val h = evs.head
            // STRICT tiebreak: event_ids are unique, so an event equal
            // to the carried state is an exact redelivery of the
            // already-folded event — admitting it would silently emit
            // a duplicate zero-gap transition, the very double-count
            // this contract exists to prevent
            require(h.us > prev.us ||
              (h.us == prev.us && h.event_id > prev.event_id),
              s"transitionsStreaming(user): events must arrive in " +
                s"STRICT (us, event_id) order across micro-batches " +
                s"(emitted pairs are final — Append mode cannot " +
                s"retract, and an event equal to the carried state is " +
                s"a redelivery that would double-count); got " +
                s"event (${h.us}, ${h.event_id}) after " +
                s"(${prev.us}, ${prev.event_id}) was already folded. " +
                "Buffer/sort/dedup upstream (the watermark pattern) " +
                "if the source delivers out of order.")
          }
          evs.foreach { e =>
            if (prev != null && e.us - prev.us < GapUs)
              out += Transition(prev.event_type, e.event_type)
            prev = LastEv(e.us, e.event_id, e.event_type)
          }
          if (keepState) {
            // streaming: carry the last event across micro-batches so
            // a session spanning two batches counts its boundary pair
            if (prev != null) state.update(prev)
          } else state.remove() // batch mode flushes
          out.iterator
      }
  }

  /** STREAMING deployment of the transition matrix: the same state
    * machine with the last event CARRIED across micro-batches, exposed
    * as the `Transition` pair stream (aggregate downstream — a
    * groupBy/count over this stream in Complete mode reproduces
    * `transitions` exactly once every batch's pairs are in, which is
    * what the spec pins). See `transitionPairs` for the cross-batch
    * ordering contract.
    */
  def transitionsStreamingPairs(spark: SparkSession,
      events: DataFrame): Dataset[Transition] =
    transitionPairs(spark, events, keepState = true)

  case class Ev(user_id: Long, ts_us: Long)
  case class SessionOut(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long)
  case class SessionState(start: Long, last: Long, n: Long)

  /** Same sessionization as explicit state-machine logic, run in batch
    * mode (each group visited once, all sessions emitted) and cross-
    * checked against `sessions`. A streaming deployment of this exact
    * function would additionally hold the open session in state with an
    * event-time timeout instead of flushing it at group end — the two
    * variants differ only in that final flush.
    */
  def sessionsStateful(spark: SparkSession, events: DataFrame): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          // Sort within group: batch iterators carry no order guarantee.
          // Bounded by one user's events — the same buffer session_window
          // keeps per key in its state store.
          val ts = rows.map(_.ts_us).toArray.sorted
          val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
          var st = state.getOption.getOrElse(null)
          ts.foreach { t =>
            st match {
              case null => st = SessionState(t, t, 1)
              case s if t - s.last < GapUs =>
                st = SessionState(s.start, t, s.n + 1)
              case s =>
                out += SessionOut(user, s.start, s.last + GapUs, s.n)
                st = SessionState(t, t, 1)
            }
          }
          if (st != null) out += SessionOut(user, st.start, st.last + GapUs, st.n)
          state.remove()
          out.iterator
      }
  }
}
