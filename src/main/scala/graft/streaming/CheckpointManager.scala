package graft.streaming

import scala.concurrent.duration.FiniteDuration

/** Interval-gated checkpoint manager (reference C1:
  * internal/checkpoint/checkpoint.go:17-83). In the Spark pipeline the
  * engine's per-batch offset log plays this role automatically; this class
  * ports the reference's *policy* — flush only acked positions, at most
  * once per interval, with a flush-pending escape for shutdown — for
  * deployments that maintain an external position store (e.g. advancing a
  * real replication slot's confirmed_flush_lsn from `foreachBatch`, which
  * Spark's own checkpoint cannot do).
  *
  * Pure logic over an injected store + clock — tested exactly like the
  * reference's table tests, no Spark session involved.
  */
final class CheckpointManager(store: String => Unit, interval: FiniteDuration) {

  private var lastAckedV: Option[String] = None
  private var lastFlushV: Option[String] = None
  private var lastTime: Long = 0L

  /** Seed with an already-durable checkpoint (loaded from the store on
    * startup) — checkpoint.go:37-45.
    */
  def init(pos: String, nowMillis: Long): Unit = if (pos.nonEmpty) {
    lastAckedV = Some(pos)
    lastFlushV = Some(pos)
    lastTime = nowMillis
  }

  def lastAcked: Option[String] = lastAckedV
  def lastFlushed: Option[String] = lastFlushV

  /** Record an acked position; persist if the interval elapsed (or nothing
    * was ever flushed). Unacked positions are never recorded —
    * checkpoint.go:55-64: a checkpoint ahead of the sink would lose data
    * on restart.
    */
  def maybeFlush(pos: String, acked: Boolean, nowMillis: Long): Unit = {
    if (pos.isEmpty || !acked) return
    lastAckedV = Some(pos)
    if (lastFlushV.isEmpty || nowMillis - lastTime >= interval.toMillis)
      flush(pos, nowMillis)
  }

  /** Persist the newest acked position regardless of interval (shutdown /
    * idle-heartbeat path) — checkpoint.go:67-73.
    */
  def flushPending(nowMillis: Long): Unit =
    lastAckedV.filter(a => !lastFlushV.contains(a)).foreach(flush(_, nowMillis))

  private def flush(pos: String, nowMillis: Long): Unit = {
    store(pos)
    lastFlushV = Some(pos)
    lastTime = nowMillis
  }
}
