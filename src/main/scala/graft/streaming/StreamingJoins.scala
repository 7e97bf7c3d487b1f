package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream INTERVAL join — the Structured Streaming stateful
  * operator the rest of the streaming surface (watermarked aggs, session
  * windows, transformWithState, TTL dedup) composes with: two unbounded
  * inputs joined on an equality key plus an event-time band, each side
  * buffering only the rows the OTHER side's watermark still allows to
  * match.
  *
  * The canonical pipeline instance is click→impression attribution: a
  * click joins every impression of the same entity in the preceding
  * `windowMinutes`. At 100 TB this is how attribution stays maintained
  * rather than recomputed — per-trigger cost is O(arrivals + matches),
  * state is bounded by (rate × window + watermark slack) per side, and
  * Spark evicts an impression exactly when the click watermark passes
  * `imp_ts + window` (no future click can reach back to it).
  *
  * Exactness contract (the l119 oracle gate relies on it): with both
  * sides admitted in event-time order and `watermarkDelay` ≥ the
  * admission jitter, the append-mode inner join emits precisely the
  * batch interval join — a matching click always arrives while its
  * impressions are still live, because eviction needs the watermark to
  * pass `imp_ts + window` and the matching click's own event time is
  * ≤ that bound. Disordered ingest degrades like the other streaming
  * operators: a row below the watermark is dropped (monotone
  * under-count), never mismatched.
  */
object StreamingJoins {

  /** Interval join: one output row per (right row, left row) pair
    * with equal `keyCol` and `right.tsCol` in
    * `[left.tsCol, left.tsCol + windowMinutes]`. Column names must be
    * disjoint apart from `keyCol` (rename upstream); the join key
    * column is emitted once.
    *
    * `left` is the side being attributed TO (impressions — buffered the
    * full window), `right` the attributing side (clicks — buffered only
    * to the watermark slack).
    *
    * `joinType` "inner" (default) or "left_outer": the outer form
    * additionally emits each UNMATCHED left row exactly once — with the
    * right side null — at the moment the watermark passes
    * `left.ts + window` (no future right row can reach it anymore).
    * That is the unattributed-impression feed: at 100 TB the "which
    * impressions never converted" table is maintained by state eviction,
    * not recomputed by an anti-join over the corpus. Emission TIMING is
    * watermark-driven: rows younger than the final watermark stay
    * pending in state (a continuously-running stream emits them as the
    * watermark advances; a drained run leaves the tail pending) —
    * downstream must treat absence-of-null-row as "not yet decided",
    * never "attributed".
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, windowMinutes: Long,
      watermarkDelay: String, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer",
      s"interval join supports inner/left_outer, got $joinType")
    val l = left.withWatermark(leftTs, watermarkDelay).alias("l")
    val r = right.withWatermark(rightTs, watermarkDelay).alias("r")
    val cond: Column = col(s"l.$keyCol") === col(s"r.$keyCol") &&
      col(s"r.$rightTs") >= col(s"l.$leftTs") &&
      col(s"r.$rightTs") <= col(s"l.$leftTs") +
        expr(s"INTERVAL $windowMinutes MINUTES")
    l.join(r, cond, joinType).drop(col(s"r.$keyCol"))
  }
}
