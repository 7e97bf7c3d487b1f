package graft

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CopyBothFraming, CopyBothWalStream,
  InMemoryReplicationConnection, InMemoryReplicationServer, LsnOffset}

/** The live-shaped CopyBoth source satisfies the SAME five-seam contract as
  * the archived-WAL file source: offsets monotone, ranges replay (via the
  * server's slot retention + reconnect redelivery, not reader memory),
  * admission bounded, standby feedback monotone, offsets lossless. Only
  * the transport (in-memory stub vs socket) is environment-bound.
  */
class CopyBothSourceContractSpec extends WalSourceContract {
  override def newFixture(): Fixture = new Fixture {
    private val server = new InMemoryReplicationServer
    private var n = 0
    // fresh stream per access, like Spark constructing the stream per
    // query run: its replay state is the server's slot, never the reader
    override def stream = new CopyBothWalStream(() => server.connect())
    override def append(lines: Seq[String]): Unit =
      lines.foreach { l => n += 1; server.deliver(n * 10L, l) }
    override def ledger: Seq[String] = server.feedbackPositions.map(_.toString)
  }
}

class CopyBothFramingSpec extends AnyFunSuite {

  test("XLogData and keepalive round-trip the public wire layout") {
    val payload = "json-line".getBytes("UTF-8")
    CopyBothFraming.parse(CopyBothFraming.xlogData(7L, 9L, 42L, payload)) match {
      case CopyBothFraming.XLogData(s, e, c, p) =>
        assert(s == 7L && e == 9L && c == 42L && p.toSeq == payload.toSeq)
      case other => fail(s"expected XLogData, got $other")
    }
    assert(CopyBothFraming.parse(CopyBothFraming.keepalive(11L, 5L, replyRequested = true))
      == CopyBothFraming.PrimaryKeepalive(11L, 5L, true))
    // standby feedback layout: 'r' + 4 longs + flag, all three positions equal
    val r = CopyBothFraming.standbyStatusUpdate(33L, 1L)
    val b = java.nio.ByteBuffer.wrap(r)
    assert(b.get().toChar == 'r')
    assert(b.getLong() == 33L && b.getLong() == 33L && b.getLong() == 33L)
    assert(b.getLong() == 1L && b.get() == 0.toByte && !b.hasRemaining)
  }

  test("unknown CopyBoth message type is fatal (reference: pglogrepl.Parse error)") {
    intercept[IllegalArgumentException] {
      CopyBothFraming.parse(Array('X'.toByte, 0, 0))
    }
  }

  test("keepalive with replyRequested answers immediately with the confirmed position") {
    val conn = new InMemoryReplicationConnection
    val s = new CopyBothWalStream(() => conn)
    conn.deliver(CopyBothFraming.xlogData(10L, 10L, 0L, "line-a".getBytes("UTF-8")))
    conn.deliver(CopyBothFraming.keepalive(99L, 0L, replyRequested = true))
    val end = s.latestOffset(s.initialOffset(), ReadLimit.allAvailable())
    // nothing acked yet: the keepalive reply reports position 0
    assert(conn.confirmedPositions == Seq(0L))
    assert(end == LsnOffset(10L), "keepalives advance no row offset")
    s.commit(end)
    assert(conn.confirmedPositions == Seq(0L, 10L))
    // keepalive after the ack reports the confirmed position
    conn.deliver(CopyBothFraming.keepalive(120L, 0L, replyRequested = true))
    s.latestOffset(end, ReadLimit.allAvailable())
    assert(conn.confirmedPositions == Seq(0L, 10L, 10L))
  }

  test("admission cap holds on one long-lived instance with interleaved planning") {
    // Spark's actual usage: ONE stream instance serves every micro-batch,
    // and planInputPartitions for batch N runs before latestOffset for
    // batch N+1. Frames drained during planning but beyond the planned
    // end must NOT bypass the admission cap of the next poll.
    val conn = new InMemoryReplicationConnection
    val s = new CopyBothWalStream(() => conn)
    (1 to 5).foreach(i => conn.deliver(
      CopyBothFraming.xlogData(i * 10L, i * 10L, 0L, s"seg$i".getBytes("UTF-8"))))
    val limit = ReadLimit.maxFiles(2)
    var cur = s.initialOffset()
    val batchSizes = scala.collection.mutable.ArrayBuffer[Int]()
    var advanced = true
    while (advanced) {
      val next = s.latestOffset(cur, limit)
      val factory = s.createReaderFactory()
      val n = s.planInputPartitions(cur, next).map { p =>
        val r = factory.createReader(p)
        var c = 0; while (r.next()) c += 1; r.close(); c
      }.sum
      advanced = n > 0
      if (advanced) { batchSizes += n; cur = next }
    }
    assert(batchSizes.toSeq == Seq(2, 2, 1),
      s"5 messages at 2/trigger on one instance -> 2+2+1, got $batchSizes")
  }

  test("re-ack at or below the confirmed position sends no feedback (monotone)") {
    val conn = new InMemoryReplicationConnection
    val s = new CopyBothWalStream(() => conn)
    conn.deliver(CopyBothFraming.xlogData(10L, 10L, 0L, "a".getBytes))
    conn.deliver(CopyBothFraming.xlogData(20L, 20L, 0L, "b".getBytes))
    val end = s.latestOffset(s.initialOffset(), ReadLimit.allAvailable())
    s.commit(end)
    s.commit(LsnOffset(10L)) // replayed older commit: ignored
    s.commit(end)            // same position again: ignored
    assert(conn.confirmedPositions == Seq(20L))
  }
}
