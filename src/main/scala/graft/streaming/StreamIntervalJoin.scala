package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of `operators.IntervalJoin` — window attribution at
  * ingest time (views joining the click windows that contain them,
  * events joining live campaign windows) as a Spark-native
  * stream-stream inner join.
  *
  * Structured Streaming already executes time-bounded stream-stream
  * equi-joins with watermark-scoped state; what it CANNOT do is keep
  * state alive forever waiting for an interval that never ends. So
  * the streaming form adds the one constraint the batch operator
  * doesn't need: a declared `maxSpan`, an upper bound on interval
  * length. The join condition carries BOTH the real containment
  * (`start <= pt <= end`) and the derived time bound
  * (`pt <= start + maxSpan`) — the latter is redundant for
  * correctness (every row with `end - start <= maxSpan` that passes
  * containment passes it too) but is what lets Spark compute when an
  * interval's state can be dropped. State per key is then
  * O(events inside watermark + maxSpan), not O(stream).
  *
  * PRECONDITIONS: interval rows must satisfy `end <= start + maxSpan`
  * — a longer interval silently loses its tail matches (the bound
  * wins); enforce or split long intervals upstream, exactly the
  * "pathological corpus-spanning intervals" note on the batch
  * operator. Both `ptCol` and `startCol` must be event-time
  * TIMESTAMP columns (they carry the watermarks). Batch parity is
  * pinned in tests against `IntervalJoin.intervalJoin` on the same
  * data.
  */
object StreamIntervalJoin {

  /** Inner containment join of two STREAMING DataFrames: point
    * columns ++ interval columns (keys once, from the point side).
    * `maxSpan`/`horizon` are SQL interval strings ("30 minutes").
    * Also runs on batch DataFrames unchanged (withWatermark is a
    * no-op in batch) — that is what the parity test exploits.
    */
  def intervalJoinStreaming(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], ptCol: String, startCol: String, endCol: String,
      maxSpan: String, horizon: String = "1 hour"): DataFrame = {
    require(keys.nonEmpty, "intervalJoinStreaming needs at least one key")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"point and interval columns must be disjoint apart from the join " +
        s"keys; both sides carry ${overlap.mkString(", ")}")
    val p = points.withWatermark(ptCol, horizon)
    val i = intervals.withWatermark(startCol, horizon)
    val cond = keys.map(k => p(k) === i(k)).reduce(_ && _) &&
      p(ptCol) >= i(startCol) &&
      p(ptCol) <= i(startCol) + expr(s"INTERVAL $maxSpan") &&
      p(ptCol) <= i(endCol)
    keys.foldLeft(p.join(i, cond, "inner"))((df, k) => df.drop(i(k)))
  }
}
