package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Decoded WAL event as a typed stream row (Wal2Json.decode output shape). */
case class DecodedWalEvent(
    wal_start: Long,
    operation: String,
    is_begin: Boolean,
    is_commit: Boolean,
    schema_name: String,
    table_name: String,
    old_values: Map[String, String],
    new_values: Map[String, String],
    txid: Long,
    action_time: Timestamp)

/** Assembled event with commit metadata + deterministic ordinal. */
case class SequencedWalEvent(
    wal_start: Long,
    operation: String,
    schema_name: String,
    table_name: String,
    old_values: Map[String, String],
    new_values: Map[String, String],
    txid: Long,
    seq_in_tx: Long,
    commit_time: Timestamp,
    commit_lsn: Long)

/** Per-transaction buffer state (reference txBuffer,
  * internal/parser/pgoutput.go:28-36).
  */
case class TxState(events: List[DecodedWalEvent])

/** Header-parsed WAL line: action/txid/time known, payload still raw JSON
  * (Wal2Json.decodeHeader output shape).
  */
case class RawWalLine(
    wal_start: Long,
    data: String,
    action: String,
    txid: Long,
    action_time: Timestamp)

/** Per-transaction buffer of raw (wal_start, document) lines; after the
  * commit emits, the state stays behind as a tombstone carrying the
  * commit's event time AND WAL position, so a replayed delivery of the
  * same transaction (source reconnect replaying unacked WAL — the
  * at-least-once case) emits nothing. Suppression is POSITIONAL, not
  * txid-based: only lines at or below the committed position are
  * replays; higher positions under the same txid are a genuinely new
  * transaction (PostgreSQL recycles txids at wraparound — the reference
  * likewise keys event identity on lsn:txid, never txid alone). The
  * tombstone is evicted when the WATERMARK passes commit_time + dedup
  * window — exactly dropDuplicatesWithinWatermark's retention rule, the
  * DUPLICATE_WINDOW analog.
  */
case class RawTxState(lines: List[(Long, String)],
    committedAtMs: Option[Long] = None,
    // sentinel MinValue = nothing committed: 0 is a VALID carrier position
    // (fileIndex 0, line 0) and must not be swallowed by the replay filter
    committedLsn: Long = Long.MinValue,
    // true when the abandoned-tx deadline was armed before ANY watermark
    // existed (first micro-batch, wm=0): that deadline fires the moment a
    // real watermark establishes, and the handler must then START the TTL
    // clock rather than evict a possibly-live buffer
    provisionalTimeout: Boolean = false)

/** Assembled raw line with commit metadata + deterministic ordinal; the
  * payload parse happens downstream (Wal2Json.decodePayload).
  */
case class SequencedRawLine(
    wal_start: Long,
    data: String,
    txid: Long,
    seq_in_tx: Long,
    commit_time: Timestamp,
    commit_lsn: Long)

/** Streaming transaction assembly (reference P3+P4:
  * internal/parser/pgoutput.go:247-304, 467-531): buffer each transaction's
  * events in keyed state until its Commit marker arrives, then emit every
  * event stamped with commitTime/commitLSN and a WAL-order `seq_in_tx`.
  *
  * Spark-first restatement:
  *  - `flatMapGroupsWithState` keyed by txid — state lives in the state
  *    store, so the reference's hand-rolled 100k-event disk spill (P4,
  *    pgoutput.go:38-111) is subsumed by the store's own spill (RocksDB
  *    provider in production).
  *  - abandoned transactions (crash before commit) are evicted by a
  *    processing-time timeout instead of growing state forever — the
  *    100 TB-scale bound the reference gets from MaxTxBufferSize.
  */
object StreamingTxAssembly {

  /** Curried so the TTL is captured in the task closure (an object field
    * would not ship to executor JVMs). Empty TTL = no timeout registration.
    */
  def assembleTx(txTimeout: String)(txid: Long, it: Iterator[DecodedWalEvent],
      state: GroupState[TxState]): Iterator[SequencedWalEvent] = {
    if (state.hasTimedOut) {
      // abandoned tx: drop buffered events (the reference replays them from
      // the WAL on reconnect — at-least-once, never at-most-once loss of a
      // *committed* tx, because commit markers always flush synchronously).
      state.remove()
      Iterator.empty
    } else {
      val prior = state.getOption.map(_.events).getOrElse(Nil)
      val arrived = it.toList
      // protocol v2 StreamAbort: the marker retracts the whole
      // (sub)transaction — drop the buffer and everything arriving with it
      if (arrived.exists(_.operation == "ABORT")) {
        state.remove()
        return Iterator.empty
      }
      val commit = arrived.find(_.is_commit)
      val data = prior ++ arrived.filterNot(e => e.is_begin || e.is_commit)
      commit match {
        case Some(c) =>
          state.remove()
          data.sortBy(_.wal_start).iterator.zipWithIndex.map { case (e, i) =>
            SequencedWalEvent(e.wal_start, e.operation, e.schema_name,
              e.table_name, e.old_values, e.new_values, txid,
              i.toLong, c.action_time, c.wal_start)
          }
        case None =>
          state.update(TxState(data))
          if (txTimeout.nonEmpty) state.setTimeoutDuration(txTimeout)
          Iterator.empty
      }
    }
  }

  /** Apply stateful assembly to a streaming Dataset of decoded WAL rows.
    * @param txTtl processing-time TTL for abandoned (never-committed)
    *              transactions; None disables the timeout entirely.
    */
  def assemble(spark: SparkSession, decoded: DataFrame,
      txTtl: Option[String] = None): Dataset[SequencedWalEvent] = {
    import spark.implicits._
    val timeoutConf = if (txTtl.isEmpty) GroupStateTimeout.NoTimeout
      else GroupStateTimeout.ProcessingTimeTimeout
    decoded.select("wal_start", "operation", "is_begin", "is_commit",
        "schema_name", "table_name", "old_values", "new_values", "txid",
        "action_time")
      .as[DecodedWalEvent]
      .groupByKey(_.txid)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        assembleTx(txTtl.getOrElse("")))
  }

  /** Same commit-gated assembly over HEADER-parsed lines: only (action,
    * txid, action_time) are known pre-assembly and the raw JSON document
    * rides through state as one string. This is the production pipeline's
    * shape ([[CdcStream.pipeline]]): the expensive payload parse
    * (columns/identity arrays → maps) runs AFTER assembly, on data rows
    * only — begin/commit markers never pay it — and the state encoder
    * moves one string per buffered event instead of two maps, so both the
    * per-batch encoder work and the state-store bytes shrink. Same
    * emission semantics as [[assembleTx]] (commit-gated, WAL-order seq,
    * TTL eviction of abandoned txs).
    *
    * E7 replay suppression lives HERE, at transaction granularity: after
    * the commit emits, a tombstone (carrying the commit's event time)
    * remains in state, and any replayed delivery of the same tx (WAL
    * replays are offset-range, hence tx-granular) emits nothing — the
    * reference's semantics (slot replay after reconnect + Nats-Msg-Id
    * sink dedup) without a second stateful operator shuffling the whole
    * stream on event_id. Duplicate lines WITHIN a buffered tx collapse by
    * wal_start at emission (a WAL position never carries two events).
    *
    * Timeouts are EVENT-TIME (the stream must carry a watermark on
    * action_time): the tombstone evicts when the watermark passes
    * commit_time + dedupTtl — dropDuplicatesWithinWatermark's retention
    * rule — and an abandoned (never-committed) tx evicts when the
    * watermark advances txTtl past the batch that buffered it.
    * Processing-time timeouts would busy-loop an ASAP-triggered query
    * (every armed timeout schedules another no-data batch).
    */
  def assembleRawTx(txTtlMs: Long, dedupTtlMs: Long)(
      txid: Long, it: Iterator[RawWalLine],
      state: GroupState[RawTxState]): Iterator[SequencedRawLine] = {
    // setTimeoutTimestamp rejects timestamps at or behind the watermark —
    // clamp (a tombstone whose window already passed evicts next batch)
    def armAt(ms: Long): Unit =
      state.setTimeoutTimestamp(math.max(ms, state.getCurrentWatermarkMs() + 1))
    if (state.hasTimedOut) {
      val st = state.get
      if (st.lines.nonEmpty && st.provisionalTimeout) {
        // the pre-watermark sentinel deadline (armed at wm+1 in the first
        // micro-batch) fired: a watermark now exists, so start the REAL
        // abandoned-tx clock — evicting here would drop a transaction
        // whose commit may simply sit in a later batch
        state.update(st.copy(provisionalTimeout = false))
        armAt(state.getCurrentWatermarkMs() + txTtlMs)
      } else state.remove()
      Iterator.empty
    } else {
      val st = state.getOption.getOrElse(RawTxState(Nil))
      // positional replay drop: anything at or below the last committed
      // position of this txid is a redelivery; higher positions are the
      // NEXT transaction under a recycled txid. Arrivals are processed in
      // WAL order so one batch may carry a commit AND the next tx's lines
      // (even its commit) under the same txid — each commit emits only
      // the buffered lines at or below its own position.
      val arrived = it.filter(_.wal_start > st.committedLsn).toList.sortBy(_.wal_start)
      var buf = st.lines
      var tombAtMs = st.committedAtMs
      var tombLsn = st.committedLsn
      val out = List.newBuilder[SequencedRawLine]
      arrived.foreach { l =>
        l.action match {
          case "B" => ()
          case "C" =>
            val (emit, beyond) = buf.partition(_._1 <= l.wal_start)
            emit.sortBy(_._1).distinctBy(_._1).zipWithIndex.foreach {
              case ((ws, d), i) =>
                out += SequencedRawLine(ws, d, txid, i.toLong, l.action_time, l.wal_start)
            }
            buf = beyond
            // a commit with an unparseable/missing timestamp still emits
            // (null commit_time, the lenient-decode contract); its
            // tombstone window is then clocked off the watermark instead
            // of the commit's own event time
            tombAtMs = Option(l.action_time).map(_.getTime)
            tombLsn = l.wal_start
          case _ => buf = (l.wal_start, l.data) :: buf
        }
      }
      // the tombstone exists whenever suppression is on and ANY commit has
      // ever been recorded for this txid — dropping it just because the
      // commit's timestamp failed to parse would let a replayed delivery
      // re-emit the whole transaction
      val tombstone = dedupTtlMs > 0 && tombLsn != Long.MinValue
      if (buf.nonEmpty || tombstone) {
        // abandoned-tx eviction clock = the watermark at buffering time;
        // before any watermark exists (wm=0) a wm+txTtl deadline would
        // pin near the 1970 epoch and fire the moment real event times
        // arrive — evicting freshly-buffered txs whose commit is merely
        // in a later batch. Instead arm a PROVISIONAL sentinel at wm+1:
        // when it fires (first real watermark) the timeout handler starts
        // the true TTL clock. Without it, a first-batch txid that never
        // receives another line would leak its buffer permanently (fMGWS
        // only re-invokes a group on input or armed timeout). NEVER arm
        // the tombstone deadline while a live buffer exists: firing would
        // delete buffered lines of an in-flight transaction (event LOSS,
        // not a duplicate). The tombstone outliving its window until the
        // buffer resolves is safe — it only suppresses already-emitted
        // positions.
        val provisional =
          buf.nonEmpty && txTtlMs > 0 && state.getCurrentWatermarkMs() <= 0
        state.update(
          RawTxState(buf, if (tombstone) tombAtMs else None, tombLsn, provisional))
        if (buf.nonEmpty) {
          if (txTtlMs > 0) {
            if (provisional) armAt(1L) // clamps to wm+1
            else armAt(state.getCurrentWatermarkMs() + txTtlMs)
          }
        } else {
          armAt(tombAtMs.getOrElse(state.getCurrentWatermarkMs()) + dedupTtlMs)
        }
      } else if (state.exists) {
        // suppression disabled (dedupTtl=0) and nothing buffered
        state.remove()
      }
      out.result().iterator
    }
  }

  /** "N unit" duration → millis (unit: milliseconds/seconds/minutes/hours/
    * days, singular or plural) — the subset of Spark's interval syntax the
    * TTL surfaces use.
    */
  private[graft] def durationMs(s: String): Long = s.trim match {
    case "" => 0L
    case d =>
      val parts = d.toLowerCase.split("\\s+")
      require(parts.length == 2, s"expected '<n> <unit>', got '$d'")
      val n = parts(0).toLong
      val unit = parts(1).stripSuffix("s") match {
        case "millisecond" => 1L
        case "second" => 1000L
        case "minute" => 60000L
        case "hour" => 3600000L
        case "day" => 86400000L
        case u => throw new IllegalArgumentException(s"unknown duration unit '$u'")
      }
      n * unit
  }

  /** Apply raw-line stateful assembly ([[assembleRawTx]]) to a streaming
    * DataFrame of header-parsed WAL rows (Wal2Json.decodeHeader output).
    * With either TTL set, `header` MUST carry a watermark on action_time
    * (event-time timeouts).
    * @param dedupTtl how long a committed tx's tombstone suppresses
    *                 replayed deliveries past its commit_time (the
    *                 DUPLICATE_WINDOW analog); empty = no suppression
    *                 (state removed at commit).
    */
  def assembleRaw(spark: SparkSession, header: DataFrame,
      txTtl: Option[String] = None, dedupTtl: String = ""): Dataset[SequencedRawLine] = {
    import spark.implicits._
    val txMs = durationMs(txTtl.getOrElse(""))
    val dedupMs = durationMs(dedupTtl)
    val timeoutConf = if (txMs == 0 && dedupMs == 0) GroupStateTimeout.NoTimeout
      else GroupStateTimeout.EventTimeTimeout
    header.select("wal_start", "data", "action", "txid", "action_time")
      .as[RawWalLine]
      .groupByKey(_.txid)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        assembleRawTx(txMs, dedupMs))
  }
}
