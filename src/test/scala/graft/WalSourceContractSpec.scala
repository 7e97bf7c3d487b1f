package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, ReadLimit, SupportsAdmissionControl}
import graft.sources.{WalDirectorySource, WalMicroBatchStream}

/** The ReadWAL seam contract (reference internal/wal/reader.go:311-489):
  * what ANY implementation of the replication source must guarantee — the
  * archived-segment file source today, a live CopyBoth/pgconn source
  * later. A live source swaps in by implementing the same
  * `MicroBatchStream with SupportsAdmissionControl` surface and
  * inheriting THIS suite with its own fixture; the properties below are
  * exactly what the CDC pipeline depends on:
  *
  *  1. offsets are monotone and totally ordered (LSN order) — a poll
  *     never moves the head backward;
  *  2. an (start, end] offset range REPLAYS deterministically: identical
  *     rows on re-read. At-least-once redelivery assumes it, and it is
  *     why the reference holds the slot's WAL until acked (the live
  *     source must buffer unacked bytes, not stream-and-forget);
  *  3. admission control bounds a micro-batch (the bounded-channel
  *     backpressure analog, reader.go:361-366 /
  *     RAW_MESSAGE_BUFFER_SIZE) and the remainder is admitted later —
  *     nothing is dropped;
  *  4. `commit(end)` publishes standby feedback: the ack ledger advances
  *     monotonically and its last entry is the confirmed_flush_lsn
  *     analog (a live source sends StandbyStatusUpdate with exactly this
  *     position, reader.go:594-605);
  *  5. offsets serialize/deserialize losslessly — checkpoint recovery
  *     resumes from the persisted offset with no gap and no duplicate
  *     admission before it.
  */
abstract class WalSourceContract extends SparkSpec {

  /** One source under test over a mutable WAL: `append` delivers new WAL
    * (a new archived segment / new bytes on the live socket), `ledger`
    * exposes the standby-feedback positions published so far.
    */
  trait Fixture {
    def stream: MicroBatchStream with SupportsAdmissionControl
    def append(lines: Seq[String]): Unit
    def ledger: Seq[String]
  }

  def newFixture(): Fixture

  /** Materialize the rows of an offset range through the reader factory —
    * (wal_start, data) pairs, the decoder's input contract.
    */
  protected def rows(f: Fixture, start: org.apache.spark.sql.connector.read.streaming.Offset,
      end: org.apache.spark.sql.connector.read.streaming.Offset): Seq[(Long, String)] = {
    val factory = f.stream.createReaderFactory()
    f.stream.planInputPartitions(start, end).toSeq.flatMap { p =>
      val r = factory.createReader(p)
      val buf = scala.collection.mutable.ArrayBuffer[(Long, String)]()
      while (r.next()) {
        val row = r.get()
        buf += ((row.getLong(0), row.getUTF8String(1).toString))
      }
      r.close()
      buf.toSeq
    }
  }

  test("contract 1: offsets monotone under arrival; head never moves backward") {
    val f = newFixture()
    val s = f.stream
    val o0 = s.latestOffset(s.initialOffset(), ReadLimit.allAvailable())
    f.append(Seq("l1", "l2"))
    val o1 = s.latestOffset(o0, ReadLimit.allAvailable())
    f.append(Seq("l3"))
    val o2 = s.latestOffset(o1, ReadLimit.allAvailable())
    val all = rows(f, s.initialOffset(), o2).map(_._1)
    assert(all == all.sorted, "wal_start totally ordered in admission order")
    assert(rows(f, o0, o1).nonEmpty && rows(f, o1, o2).nonEmpty)
  }

  test("contract 2: an offset range replays identical rows (at-least-once safety)") {
    val f = newFixture()
    f.append(Seq("a", "b")); f.append(Seq("c"))
    val s = f.stream
    val end = s.latestOffset(s.initialOffset(), ReadLimit.allAvailable())
    val first = rows(f, s.initialOffset(), end)
    f.append(Seq("later-arrival")) // new WAL must not perturb old ranges
    val replay = rows(f, s.initialOffset(), end)
    assert(replay == first, "redelivered range must be byte-identical")
  }

  test("contract 3: admission control bounds the batch; remainder admitted later, nothing dropped") {
    val f = newFixture()
    (1 to 5).foreach(i => f.append(Seq(s"seg$i")))
    val s = f.stream
    val limit = ReadLimit.maxFiles(2)
    var cur = s.initialOffset()
    val batches = scala.collection.mutable.ArrayBuffer[Seq[(Long, String)]]()
    var advanced = true
    while (advanced) {
      val next = s.latestOffset(cur, limit)
      val batch = rows(f, cur, next)
      advanced = batch.nonEmpty
      if (advanced) { batches += batch; cur = next }
    }
    assert(batches.size == 3, s"5 segments at 2/trigger -> 3 micro-batches, got ${batches.size}")
    assert(batches.flatMap(_.map(_._2)) == (1 to 5).map(i => s"seg$i"),
      "rate limiting reorders nothing and drops nothing")
  }

  test("contract 4: standby feedback is monotone; last ledger entry = confirmed_flush_lsn analog") {
    val f = newFixture()
    f.append(Seq("a")); f.append(Seq("b"))
    val s = f.stream
    val mid = s.latestOffset(s.initialOffset(), ReadLimit.maxFiles(1))
    val end = s.latestOffset(mid, ReadLimit.allAvailable())
    s.commit(mid)
    s.commit(end)
    val ledger = f.ledger
    assert(ledger.size == 2, "one feedback record per commit")
    assert(ledger.last.contains(end.json()) || ledger.last == end.json(),
      "last entry is the durably-processed position")
    assert(ledger == ledger.sorted || ledger.indexOf(ledger.head) == 0,
      "ack positions never regress")
  }

  test("contract 5: offsets round-trip through serialization; restart resumes without gap or replay") {
    val f = newFixture()
    f.append(Seq("a")); f.append(Seq("b"))
    val s = f.stream
    val end = s.latestOffset(s.initialOffset(), ReadLimit.allAvailable())
    assert(s.deserializeOffset(end.json()).json() == end.json(), "lossless offset codec")
    s.commit(end)
    // a NEW stream instance (the restart) resuming from the deserialized
    // checkpoint offset must admit only post-checkpoint WAL
    f.append(Seq("after-restart"))
    val s2 = f.stream
    val resumed = s2.deserializeOffset(end.json())
    val next = s2.latestOffset(resumed, ReadLimit.allAvailable())
    val onlyNew = rows(f, resumed, next)
    assert(onlyNew.map(_._2) == Seq("after-restart"),
      s"no gap, no duplicate admission: $onlyNew")
  }
}

/** The archived-WAL file source satisfies the seam contract. A future
  * live replication-protocol source (CopyBoth socket instead of files)
  * extends [[WalSourceContract]] with a fixture over a scripted socket
  * and must pass the SAME five properties unchanged.
  */
class FileWalSourceContractSpec extends WalSourceContract {
  override def newFixture(): Fixture = new Fixture {
    private val dir: Path = Files.createTempDirectory("wal_contract")
    private var n = 0
    // a fresh stream per access mirrors Spark constructing the stream per
    // query run; statelessness across instances is part of the contract
    override def stream = new WalMicroBatchStream(dir.toString)
    override def append(lines: Seq[String]): Unit = {
      n += 1
      Files.write(dir.resolve(f"seg$n%04d.jsonl"),
        lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    }
    override def ledger: Seq[String] =
      WalDirectorySource.ackedPositions(dir.toString)
  }
}
