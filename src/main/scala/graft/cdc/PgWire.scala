package graft.cdc

import java.nio.charset.StandardCharsets
import java.nio.ByteBuffer

/** Encoder for pgoutput wire messages (built from the public PostgreSQL
  * "Logical Replication Message Formats" spec): golden-fixture input for
  * PgOutput decoder tests, load/simulation input generation, and the
  * driver-gated binary roundtrip (c17).
  */
object PgWire {

  private def buf(cap: Int = 8192) = ByteBuffer.allocate(cap)
  private def fin(b: ByteBuffer): Array[Byte] = {
    val out = new Array[Byte](b.position()); b.rewind(); b.get(out); out
  }
  private def cstr(b: ByteBuffer, s: String): Unit = {
    b.put(s.getBytes(StandardCharsets.UTF_8)); b.put(0.toByte)
  }

  val PgEpochMicros = 946684800000000L

  def relation(id: Int, schema: String, table: String,
      cols: Seq[(String, Int)]): Array[Byte] = {
    val b = buf()
    b.put('R'.toByte).putInt(id)
    cstr(b, schema); cstr(b, table)
    b.put('d'.toByte).putShort(cols.size.toShort)
    cols.foreach { case (n, oid) =>
      b.put(0.toByte); cstr(b, n); b.putInt(oid); b.putInt(-1)
    }
    fin(b)
  }

  def begin(finalLsn: Long, unixMicros: Long, xid: Int): Array[Byte] = {
    val b = buf(64)
    b.put('B'.toByte).putLong(finalLsn).putLong(unixMicros - PgEpochMicros).putInt(xid)
    fin(b)
  }

  def commit(commitLsn: Long, endLsn: Long, unixMicros: Long): Array[Byte] = {
    val b = buf(64)
    b.put('C'.toByte).put(0.toByte).putLong(commitLsn).putLong(endLsn)
      .putLong(unixMicros - PgEpochMicros)
    fin(b)
  }

  /** values: Some(text) -> 't', None -> NULL 'n', the marker "\u0000u" -> unchanged TOAST. */
  val Toast: Option[String] = Some("\u0000u")

  private def tuple(b: ByteBuffer, values: Seq[Option[String]]): Unit = {
    b.putShort(values.size.toShort)
    values.foreach {
      case None => b.put('n'.toByte)
      case Some("\u0000u") => b.put('u'.toByte)
      case Some(v) =>
        val bytes = v.getBytes(StandardCharsets.UTF_8)
        b.put('t'.toByte).putInt(bytes.length).put(bytes)
    }
  }

  def insert(relId: Int, values: Seq[Option[String]]): Array[Byte] = {
    val b = buf()
    b.put('I'.toByte).putInt(relId).put('N'.toByte)
    tuple(b, values)
    fin(b)
  }

  def update(relId: Int, oldValues: Option[Seq[Option[String]]],
      newValues: Seq[Option[String]]): Array[Byte] = {
    val b = buf()
    b.put('U'.toByte).putInt(relId)
    oldValues.foreach { ov => b.put('O'.toByte); tuple(b, ov) }
    b.put('N'.toByte); tuple(b, newValues)
    fin(b)
  }

  def delete(relId: Int, keyValues: Seq[Option[String]]): Array[Byte] = {
    val b = buf()
    b.put('D'.toByte).putInt(relId).put('K'.toByte)
    tuple(b, keyValues)
    fin(b)
  }

  def truncate(relIds: Seq[Int]): Array[Byte] = {
    val b = buf()
    b.put('T'.toByte).putInt(relIds.size).put(0.toByte)
    relIds.foreach(b.putInt)
    fin(b)
  }

  /** Logical decoding message frame ('M', pg_logical_emit_message) —
    * flags bit 0 = transactional, message LSN, prefix cstring, sized
    * content bytes.
    */
  def logicalMessage(transactional: Boolean, lsn: Long, prefix: String,
      content: Array[Byte]): Array[Byte] = {
    val b = buf()
    b.put('M'.toByte).put(if (transactional) 1.toByte else 0.toByte)
      .putLong(lsn)
    cstr(b, prefix)
    b.putInt(content.length).put(content)
    fin(b)
  }

  // ---- protocol v2 streamed-transaction frames (streaming=on slots) ----

  /** Stream Start ('S'): the (sub)segment opener — top-level xid + a
    * first-segment flag (1 on the xid's first segment).
    */
  def streamStart(xid: Int, firstSegment: Boolean): Array[Byte] = {
    val b = buf(16)
    b.put('S'.toByte).putInt(xid)
      .put(if (firstSegment) 1.toByte else 0.toByte)
    fin(b)
  }

  /** Stream Stop ('E'): closes the open segment; no body. */
  def streamStop(): Array[Byte] = fin(buf(4).put('E'.toByte))

  /** Stream Commit ('c'): xid, flags, commit LSN, end LSN, commit ts. */
  def streamCommit(xid: Int, commitLsn: Long, endLsn: Long,
      unixMicros: Long): Array[Byte] = {
    val b = buf(64)
    b.put('c'.toByte).putInt(xid).put(0.toByte).putLong(commitLsn)
      .putLong(endLsn).putLong(unixMicros - PgEpochMicros)
    fin(b)
  }

  /** Stream Abort ('A'): top xid + aborted subtransaction xid (equal to
    * the top xid when the whole transaction rolls back).
    */
  def streamAbort(xid: Int, subXid: Int): Array[Byte] = {
    val b = buf(16)
    b.put('A'.toByte).putInt(xid).putInt(subXid)
    fin(b)
  }

  /** Stream Abort ('A'), protocol v4 (streaming=parallel slots, PG 16+):
    * the v2/v3 layout plus abort LSN and abort timestamp — the fields a
    * parallel apply worker needs to stamp the retraction position
    * without round-tripping to the leader.  PG protocol.sgml marks both
    * Int64s "available since protocol version 4".
    */
  def streamAbortV4(xid: Int, subXid: Int, abortLsn: Long,
      unixMicros: Long): Array[Byte] = {
    val b = buf(32)
    b.put('A'.toByte).putInt(xid).putInt(subXid).putLong(abortLsn)
      .putLong(unixMicros - PgEpochMicros)
    fin(b)
  }

  /** Prefix a v1 data frame with the Int32 xid that in-stream messages
    * carry in protocol v2 (every transactional message between
    * StreamStart..StreamStop names its own (sub)transaction).
    */
  def streamed(xid: Int, frame: Array[Byte]): Array[Byte] = {
    val b = buf(frame.length + 8)
    b.put(frame(0)).putInt(xid).put(frame, 1, frame.length - 1)
    fin(b)
  }

  // ---- two-phase commit frames (two_phase slots, PG 15+): a PREPARE
  // TRANSACTION arrives as BeginPrepare..changes..Prepare, then — any
  // time later, possibly a different decode session — CommitPrepared or
  // RollbackPrepared with the same xid/gid resolves it.

  /** Begin Prepare ('b'): prepare LSN, end LSN, prepare ts, xid, gid. */
  def beginPrepare(prepareLsn: Long, endLsn: Long, unixMicros: Long,
      xid: Int, gid: String): Array[Byte] = {
    val b = buf(128)
    b.put('b'.toByte).putLong(prepareLsn).putLong(endLsn)
      .putLong(unixMicros - PgEpochMicros).putInt(xid)
    cstr(b, gid)
    fin(b)
  }

  /** Prepare ('P'): flags, prepare LSN, end LSN, prepare ts, xid, gid. */
  def prepare(prepareLsn: Long, endLsn: Long, unixMicros: Long,
      xid: Int, gid: String): Array[Byte] = {
    val b = buf(128)
    b.put('P'.toByte).put(0.toByte).putLong(prepareLsn).putLong(endLsn)
      .putLong(unixMicros - PgEpochMicros).putInt(xid)
    cstr(b, gid)
    fin(b)
  }

  /** Commit Prepared ('K'): flags, commit LSN, end LSN, commit ts, xid,
    * gid.
    */
  def commitPrepared(commitLsn: Long, endLsn: Long, unixMicros: Long,
      xid: Int, gid: String): Array[Byte] = {
    val b = buf(128)
    b.put('K'.toByte).put(0.toByte).putLong(commitLsn).putLong(endLsn)
      .putLong(unixMicros - PgEpochMicros).putInt(xid)
    cstr(b, gid)
    fin(b)
  }

  /** Rollback Prepared ('r'): flags, prepare-end LSN, rollback-end LSN,
    * prepare ts, rollback ts, xid, gid.
    */
  def rollbackPrepared(prepareEndLsn: Long, rollbackEndLsn: Long,
      prepareMicros: Long, rollbackMicros: Long, xid: Int,
      gid: String): Array[Byte] = {
    val b = buf(128)
    b.put('r'.toByte).put(0.toByte).putLong(prepareEndLsn)
      .putLong(rollbackEndLsn).putLong(prepareMicros - PgEpochMicros)
      .putLong(rollbackMicros - PgEpochMicros).putInt(xid)
    cstr(b, gid)
    fin(b)
  }

  /** Stream Prepare ('p'): a STREAMED transaction ends with PREPARE
    * instead of StreamCommit — flags, prepare LSN, end LSN, prepare ts,
    * xid, gid.
    */
  def streamPrepare(prepareLsn: Long, endLsn: Long, unixMicros: Long,
      xid: Int, gid: String): Array[Byte] = {
    val b = buf(128)
    b.put('p'.toByte).put(0.toByte).putLong(prepareLsn).putLong(endLsn)
      .putLong(unixMicros - PgEpochMicros).putInt(xid)
    cstr(b, gid)
    fin(b)
  }
}
