package graft

import graft.cdc.{PgOutput, PgWire}
import graft.streaming.DecodedWalEvent

/** pgoutput binary decoder semantics (reference invariants from
  * internal/parser/pgoutput_test.go and FIXTURES.md §3).
  */
class PgOutputSpec extends SparkSpec {

  val relUsers = 100
  val t0 = 1705314600123456L // 2024-01-15T10:30:00.123456Z in unix micros

  def decode(msgs: Seq[Array[Byte]]): List[DecodedWalEvent] =
    PgOutput.decodePartition(
      msgs.zipWithIndex.map { case (m, i) => (i.toLong * 10, m) }.iterator).toList

  val relMsg = PgWire.relation(relUsers, "public", "users",
    Seq("id" -> 20, "name" -> 25, "bio" -> 25))

  test("insert decodes registry-named columns with txid from Begin") {
    val out = decode(Seq(
      relMsg,
      PgWire.begin(1000, t0, 12345),
      PgWire.insert(relUsers, Seq(Some("1"), Some("Test User"), Some("hello"))),
      PgWire.commit(1000, 1001, t0)))
    assert(out.map(_.operation) == List("B", "INSERT", "C"))
    val ins = out(1)
    assert(ins.schema_name == "public" && ins.table_name == "users")
    assert(ins.txid == 12345L)
    assert(ins.new_values == Map("id" -> "1", "name" -> "Test User", "bio" -> "hello"))
    assert(ins.action_time.toInstant.toString == "2024-01-15T10:30:00.123456Z")
  }

  test("empty string is not NULL (pgoutput_test.go:245)") {
    val out = decode(Seq(relMsg, PgWire.begin(1, t0, 1),
      PgWire.insert(relUsers, Seq(Some("1"), Some(""), None))))
    val nv = out(1).new_values
    assert(nv("name") == "")
    assert(nv.contains("bio") && nv("bio") == null)
  }

  test("unchanged TOAST column is absent, not null (pgoutput.go:613-614)") {
    val out = decode(Seq(relMsg, PgWire.begin(1, t0, 1),
      PgWire.update(relUsers, Some(Seq(Some("1"), None, None)),
        Seq(Some("1"), Some("New"), PgWire.Toast))))
    val upd = out(1)
    assert(upd.operation == "UPDATE")
    assert(!upd.new_values.contains("bio"), "TOAST column must be absent")
    assert(upd.new_values == Map("id" -> "1", "name" -> "New"))
    assert(upd.old_values("id") == "1")
  }

  test("delete carries key tuple as old values only") {
    val out = decode(Seq(relMsg, PgWire.begin(1, t0, 7),
      PgWire.delete(relUsers, Seq(Some("9"), None, None))))
    val del = out(1)
    assert(del.operation == "DELETE")
    assert(del.old_values("id") == "9")
    assert(del.new_values == null)
  }

  test("truncate emits DDL per relation with empty images (cdc_truncate_test.go:35-48)") {
    val relOrders = 101
    val out = decode(Seq(relMsg,
      PgWire.relation(relOrders, "public", "orders", Seq("id" -> 20)),
      PgWire.begin(1, t0, 3),
      PgWire.truncate(Seq(relUsers, relOrders))))
    val ddl = out.filter(_.operation == "DDL")
    assert(ddl.map(_.table_name) == List("users", "orders"))
    assert(ddl.forall(e => e.old_values.isEmpty && e.new_values.isEmpty))
  }

  // ---- corrupt-frame table: every structurally invalid frame fails as a
  // NAMED CorruptFrameException carrying its WAL position — never a bare
  // BufferUnderflowException (reference degrades explicitly,
  // pgoutput.go:630-638) ----

  private def corruptMessage(frame: Array[Byte],
      after: Seq[Array[Byte]] = Seq(relMsg)): String = {
    val e = intercept[PgOutput.CorruptFrameException] {
      decode(after ++ Seq(PgWire.begin(1, t0, 1), frame))
    }
    e.getMessage
  }

  test("corrupt: truncated Begin (frame ends mid-field) names position, not BufferUnderflow") {
    val msg = corruptMessage(PgWire.begin(1, t0, 1).take(9), after = Nil)
    assert(msg.contains("truncated frame") && msg.contains("wal_start="), msg)
  }

  test("corrupt: truncated tuple data (field runs past the frame)") {
    // valid insert, then chop the last 3 bytes of the value
    val whole = PgWire.insert(relUsers, Seq(Some("1"), Some("Test User"), Some("x")))
    val msg = corruptMessage(whole.dropRight(3))
    assert(msg.contains("wal_start=") &&
      (msg.contains("exceeds") || msg.contains("truncated")), msg)
  }

  test("corrupt: unknown tuple-kind byte is named with column and relation") {
    val whole = PgWire.insert(relUsers, Seq(Some("1"), Some("a"), Some("b")))
    // first tuple-kind byte sits after type(1)+relid(4)+'N'(1)+ncols(2)
    whole(8) = 'x'.toByte
    val msg = corruptMessage(whole)
    assert(msg.contains("unknown tuple kind 'x'") && msg.contains("public.users"), msg)
  }

  test("corrupt: negative tuple column count") {
    val whole = PgWire.insert(relUsers, Seq(Some("1")))
    whole(6) = 0xff.toByte; whole(7) = 0xff.toByte // ncols = -1
    val msg = corruptMessage(whole)
    assert(msg.contains("negative tuple column count"), msg)
  }

  test("corrupt: field length exceeding the frame is rejected before allocation") {
    val whole = PgWire.insert(relUsers, Seq(Some("abc")))
    // value length field follows type(1)+relid(4)+'N'(1)+ncols(2)+'t'(1)
    val b = java.nio.ByteBuffer.wrap(whole)
    b.putInt(9, 0x7fffff00) // claims ~2 GB payload
    val msg = corruptMessage(whole)
    assert(msg.contains("exceeds") && msg.contains("bytes left"), msg)
  }

  test("corrupt: unterminated relation-name string") {
    val rel = PgWire.relation(relUsers, "public", "users", Seq("id" -> 20))
    // cut inside the schema name cstring (type 1 + relid 4 + 2 chars)
    val msg = intercept[PgOutput.CorruptFrameException] {
      decode(Seq(rel.take(7)))
    }.getMessage
    assert(msg.contains("unterminated string") && msg.contains("wal_start="), msg)
  }

  test("data message for an unregistered relation id stays a named error") {
    val e = intercept[IllegalStateException] {
      decode(Seq(PgWire.begin(1, t0, 1),
        PgWire.insert(999, Seq(Some("1")))))
    }
    assert(e.getMessage.contains("relation 999") &&
      e.getMessage.contains("no prior Relation"), e.getMessage)
  }

  test("corrupt: INSERT without a new-tuple marker") {
    val whole = PgWire.insert(relUsers, Seq(Some("1"), Some("a"), Some("b")))
    whole(5) = 'Q'.toByte // 'N' marker position
    val msg = corruptMessage(whole)
    assert(msg.contains("INSERT expects new tuple"), msg)
  }

  test("relation replacement mid-stream affects only later events (pgoutput.go:216-230)") {
    val out = decode(Seq(
      relMsg, PgWire.begin(1, t0, 1),
      PgWire.insert(relUsers, Seq(Some("1"), Some("a"), Some("b"))),
      PgWire.relation(relUsers, "public", "users", Seq("id" -> 20, "email" -> 25)),
      PgWire.insert(relUsers, Seq(Some("2"), Some("x@y.z")))))
    assert(out(1).new_values.keySet == Set("id", "name", "bio"))
    assert(out(2).new_values.keySet == Set("id", "email"))
  }

  test("unhandled-but-valid message types ignored; garbage frames fatal") {
    // 'O' (origin) frames flow through a real stream when publications
    // enable them — the reference's dispatch has no arm for them and
    // silently continues; garbage is a parse error and fatal ('M' is now
    // a decoded outbox event, tested separately)
    val origin = Array[Byte]('O'.toByte, 1, 2, 3)
    val evts = decode(Seq(relMsg, PgWire.begin(10L, t0, 777), origin,
      PgWire.commit(11L, 12L, t0)))
    assert(evts.map(_.operation) == List("B", "C"))
    val garbage = Array[Byte]('z'.toByte, 0, 0)
    // unknown message kind rides the SAME named corrupt taxonomy as
    // truncation, so the streaming crash/dlq/skip policy covers it
    val e = intercept[PgOutput.CorruptFrameException] {
      decode(Seq(garbage))
    }
    assert(e.getMessage.contains("unparseable message type 0x7a"))
    assert(e.getMessage.contains("wal_start="), "carries the WAL position")
  }

  test("logical message 'M': transactional rides the tx, standalone does not") {
    val inTx = PgWire.logicalMessage(transactional = true, 55L, "outbox",
      """{"order":42}""".getBytes("UTF-8"))
    val standalone = PgWire.logicalMessage(transactional = false, 66L,
      "heartbeat", Array.empty[Byte])
    val evts = decode(Seq(relMsg, standalone,
      PgWire.begin(10L, t0, 777), inTx, PgWire.commit(11L, 12L, t0)))
    assert(evts.map(_.operation) == List("MESSAGE", "B", "MESSAGE", "C"))
    val solo = evts.head
    assert(solo.schema_name == "pg_message" && solo.table_name == "heartbeat")
    assert(solo.txid == 0L && solo.action_time == null)
    assert(solo.new_values == Map("prefix" -> "heartbeat", "content" -> "",
      "content_base64" -> "", "transactional" -> "false"))
    val tx = evts(2)
    assert(tx.table_name == "outbox" && tx.txid == 777L)
    assert(tx.action_time != null, "transactional message carries the tx ts")
    assert(tx.new_values("content") == """{"order":42}""")
    // binary payloads survive ONLY through content_base64 — the UTF-8
    // `content` rendering is lossy for non-text bytes
    assert(java.util.Base64.getDecoder.decode(
      tx.new_values("content_base64")).sameElements(
      """{"order":42}""".getBytes("UTF-8")))
    assert(tx.old_values == null)
  }

  test("logical message 'M': arbitrary binary payload round-trips via base64") {
    val payload = Array[Byte](0, -1, -2, 127, 10, 0, 65) // not valid UTF-8 text
    val evts = decode(Seq(relMsg,
      PgWire.logicalMessage(transactional = false, 70L, "avro", payload)))
    val m = evts.head.new_values
    assert(java.util.Base64.getDecoder.decode(m("content_base64"))
      .sameElements(payload),
      "the exact bytes must survive the envelope")
  }

  test("logical message 'M': content length past the frame is rejected") {
    val good = PgWire.logicalMessage(transactional = false, 55L, "p",
      "abc".getBytes("UTF-8"))
    // corrupt the declared length (last 4 bytes before content start)
    val bad = good.clone()
    val lenOffset = good.length - 3 - 4
    bad(lenOffset) = 0x7f.toByte
    val e = intercept[PgOutput.CorruptFrameException] { decode(Seq(bad)) }
    assert(e.getMessage.contains("exceeds frame"), e.getMessage)
  }

  test("protocol v2: interleaved streamed segments decode with per-frame " +
      "xids; StreamCommit stamps, StreamAbort retracts") {
    // two large transactions streamed BEFORE commit, their segments
    // interleaved — xid 500 commits, xid 600 aborts wholesale
    val out = decode(Seq(
      PgWire.streamStart(500, firstSegment = true),
      PgWire.streamed(500, relMsg),
      PgWire.streamed(500, PgWire.insert(relUsers,
        Seq(Some("1"), Some("a"), None))),
      PgWire.streamStop(),
      PgWire.streamStart(600, firstSegment = true),
      PgWire.streamed(600, PgWire.insert(relUsers,
        Seq(Some("2"), Some("b"), None))),
      PgWire.streamStop(),
      PgWire.streamStart(500, firstSegment = false),
      PgWire.streamed(500, PgWire.insert(relUsers,
        Seq(Some("3"), Some("c"), None))),
      PgWire.streamStop(),
      PgWire.streamCommit(500, 900L, 901L, t0),
      PgWire.streamAbort(600, 600)))
    val ops = out.map(e => (e.operation, e.txid))
    assert(ops == List(("INSERT", 500L), ("INSERT", 600L), ("INSERT", 500L),
      ("C", 500L), ("ABORT", 600L)), s"decoded stream: $ops")
    // in-segment data rows carry no Begin timestamp; the commit marker does
    assert(out.filter(_.operation == "INSERT").forall(_.action_time == null))
    assert(out.find(_.is_commit).get.action_time != null)
    // assembly drops the aborted tx and stamps the committed one
    import spark.implicits._
    val assembled = graft.cdc.TxAssembly.assemble(
        spark.createDataset(out).toDF())
      .select($"txid", $"seq_in_tx",
        $"new_values".getItem("id").as("id"), $"commit_lsn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(x => (x._1, x._2)).toList
    assert(assembled == List((500L, 0L, "1"), (500L, 1L, "3")),
      s"aborted xid 600 must vanish, xid 500 keeps WAL order: $assembled")
  }

  test("protocol v2: a transactional logical message in a streamed " +
      "segment rides its per-frame subxid and is retracted by that " +
      "subxact's abort") {
    val out = decode(Seq(
      PgWire.streamStart(950, firstSegment = true),
      PgWire.streamed(950, relMsg),
      PgWire.streamed(950, PgWire.insert(relUsers,
        Seq(Some("50"), Some("kept"), None))),
      PgWire.streamed(951, PgWire.logicalMessage(transactional = true,
        10L, "outbox", "m".getBytes("UTF-8"))),
      PgWire.streamStop(),
      PgWire.streamAbort(950, 951),
      PgWire.streamCommit(950, 990L, 991L, t0)))
    val msg = out.find(_.operation == "MESSAGE").get
    assert(msg.txid == 951L,
      "an in-segment message carries the per-frame (sub)transaction xid")
    import spark.implicits._
    val survivors = graft.cdc.TxAssembly.assemble(
        spark.createDataset(out).toDF())
      .select($"operation").as[String].collect().toList
    assert(survivors == List("INSERT"),
      s"the aborted subxact's message vanishes with it: $survivors")
  }

  test("protocol v2: StreamAbort of a SUBtransaction retracts only its " +
      "rows; StreamCommit fans out to surviving subxacts") {
    // top tx 700 streams changes from subxact 701 (aborted via savepoint
    // rollback) and subxact 702 (survives): the commit must cover 702's
    // rows, 701's must vanish
    val out = decode(Seq(
      PgWire.streamStart(700, firstSegment = true),
      PgWire.streamed(700, relMsg),
      PgWire.streamed(700, PgWire.insert(relUsers,
        Seq(Some("10"), Some("top"), None))),
      PgWire.streamed(701, PgWire.insert(relUsers,
        Seq(Some("11"), Some("rolled-back"), None))),
      PgWire.streamed(702, PgWire.insert(relUsers,
        Seq(Some("12"), Some("kept"), None))),
      PgWire.streamStop(),
      PgWire.streamAbort(700, 701),
      PgWire.streamCommit(700, 900L, 901L, t0)))
    // one commit marker per SURVIVING member (700 itself + 702), in
    // observation order; 701 gets only the abort marker
    val commits = out.filter(_.is_commit).map(_.txid)
    assert(commits == List(700L, 702L), s"commit fan-out: $commits")
    import spark.implicits._
    val ids = graft.cdc.TxAssembly.assemble(spark.createDataset(out).toDF())
      .select($"new_values".getItem("id").as(""))
      .as[String].collect().sorted.toList
    assert(ids == List("10", "12"),
      s"subxact 701's row must vanish, 700/702 survive: $ids")
  }

  test("protocol v2: whole-transaction StreamAbort fans out to every " +
      "member subxact — none of their rows survive assembly") {
    // top tx 800 streams rows under its own xid AND subxacts 801/802,
    // then the WHOLE transaction rolls back: every member group must get
    // an ABORT marker (not just the top xid), else assembly's coalesce
    // fallback would emit the subxact rows as committed
    val out = decode(Seq(
      PgWire.streamStart(800, firstSegment = true),
      PgWire.streamed(800, relMsg),
      PgWire.streamed(800, PgWire.insert(relUsers,
        Seq(Some("20"), Some("top"), None))),
      PgWire.streamed(801, PgWire.insert(relUsers,
        Seq(Some("21"), Some("sub1"), None))),
      PgWire.streamed(802, PgWire.insert(relUsers,
        Seq(Some("22"), Some("sub2"), None))),
      PgWire.streamStop(),
      PgWire.streamAbort(800, 800)))
    val aborts = out.filter(_.operation == "ABORT").map(_.txid)
    assert(aborts == List(800L, 801L, 802L),
      s"abort must cover every observed member, got: $aborts")
    assert(!out.exists(_.is_commit))
    import spark.implicits._
    val survivors = graft.cdc.TxAssembly.assemble(
        spark.createDataset(out).toDF())
      .select($"new_values".getItem("id").as(""))
      .as[String].collect().toList
    assert(survivors.isEmpty,
      s"whole-tx rollback must retract subxact rows too: $survivors")
  }

  test("protocol v4: StreamAbort carries abort LSN + timestamp (streaming=" +
      "parallel, PG 16+) — markers stamped; v3 frame still decodes ts-null") {
    // subxact 901 aborts with the v4 fields; the commit covers 900
    val abortUs = t0 - 5000000L
    val out = decode(Seq(
      PgWire.streamStart(900, firstSegment = true),
      PgWire.streamed(900, relMsg),
      PgWire.streamed(900, PgWire.insert(relUsers,
        Seq(Some("30"), Some("top"), None))),
      PgWire.streamed(901, PgWire.insert(relUsers,
        Seq(Some("31"), Some("sub"), None))),
      PgWire.streamStop(),
      PgWire.streamAbortV4(900, 901, 950L, abortUs),
      PgWire.streamCommit(900, 960L, 961L, t0)))
    val ab = out.filter(_.operation == "ABORT")
    assert(ab.map(_.txid) == List(901L), s"aborted member: ${ab.map(_.txid)}")
    assert(ab.head.action_time != null &&
      ab.head.action_time.toInstant.toString == "2024-01-15T10:29:55.123456Z",
      s"v4 abort timestamp must surface: ${ab.head.action_time}")
    assert(out.filter(_.is_commit).map(_.txid) == List(900L))

    // whole-tx v4 abort fans the STAMPED marker to every member
    val out2 = decode(Seq(
      PgWire.streamStart(910, firstSegment = true),
      PgWire.streamed(910, relMsg),
      PgWire.streamed(911, PgWire.insert(relUsers,
        Seq(Some("32"), Some("s"), None))),
      PgWire.streamStop(),
      PgWire.streamAbortV4(910, 910, 970L, abortUs)))
    val ab2 = out2.filter(_.operation == "ABORT")
    assert(ab2.map(_.txid) == List(910L, 911L))
    assert(ab2.forall(_.action_time != null), "fan-out keeps the v4 ts")

    // the 9-byte v2/v3 layout still decodes, with a null timestamp
    val out3 = decode(Seq(
      PgWire.streamStart(920, firstSegment = true),
      PgWire.streamStop(),
      PgWire.streamAbort(920, 920)))
    assert(out3.filter(_.operation == "ABORT").forall(_.action_time == null))
  }

  test("protocol v4: StreamAbort with a truncated OR over-long v4 tail " +
      "is corrupt, not silently v3/v4") {
    val full = PgWire.streamAbortV4(930, 930, 980L, t0)
    intercept[PgOutput.CorruptFrameException] {
      decode(Seq(
        PgWire.streamStart(930, firstSegment = true),
        PgWire.streamStop(),
        full.take(full.length - 3)))
    }
    // the length mirrors the version EXACTLY (0 or 16 trailing bytes):
    // extra garbage after the v4 fields is a corrupt frame, not ignored
    intercept[PgOutput.CorruptFrameException] {
      decode(Seq(
        PgWire.streamStart(931, firstSegment = true),
        PgWire.streamStop(),
        full ++ Array[Byte](1, 2, 3, 4)))
    }
  }

  test("protocol v2: a segment spanning the partition keeps bracketing; " +
      "stray StreamStop and nested StreamStart are corrupt") {
    intercept[PgOutput.CorruptFrameException] {
      decode(Seq(PgWire.streamStop()))
    }
    intercept[PgOutput.CorruptFrameException] {
      decode(Seq(PgWire.streamStart(800, firstSegment = true),
        PgWire.streamStart(801, firstSegment = true)))
    }
  }

  test("two-phase: PREPARE TRANSACTION buffers until CommitPrepared; " +
      "RollbackPrepared retracts; interleaved work is unaffected") {
    // xid 900 prepares and later commits (gets the COMMIT PREPARED
    // timestamp); xid 901 prepares and rolls back; xid 902 is a plain
    // tx committing between the prepares and their resolutions
    val tPrep = t0 - 60000000L // one minute before the commit, in micros
    val out = decode(Seq(
      relMsg,
      PgWire.beginPrepare(100L, 101L, tPrep, 900, "gid-a"),
      PgWire.insert(relUsers, Seq(Some("30"), Some("prep-commit"), None)),
      PgWire.prepare(100L, 101L, tPrep, 900, "gid-a"),
      PgWire.beginPrepare(110L, 111L, tPrep, 901, "gid-b"),
      PgWire.insert(relUsers, Seq(Some("31"), Some("prep-abort"), None)),
      PgWire.prepare(110L, 111L, tPrep, 901, "gid-b"),
      PgWire.begin(120L, t0, 902),
      PgWire.insert(relUsers, Seq(Some("32"), Some("plain"), None)),
      PgWire.commit(120L, 121L, t0),
      PgWire.commitPrepared(130L, 131L, t0, 900, "gid-a"),
      PgWire.rollbackPrepared(110L, 140L, tPrep,
        t0, 901, "gid-b")))
    val ops = out.map(e => (e.operation, e.txid))
    assert(ops == List(("B", 900L), ("INSERT", 900L), ("B", 901L),
      ("INSERT", 901L), ("B", 902L), ("INSERT", 902L), ("C", 902L),
      ("C", 900L), ("ABORT", 901L)), s"decoded: $ops")
    import spark.implicits._
    val assembled = graft.cdc.TxAssembly.assemble(
        spark.createDataset(out).toDF())
      .select($"txid", $"new_values".getItem("id").as("id"), $"commit_time")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
      .sortBy(_._1).toList
    assert(assembled.map(x => (x._1, x._2)) ==
      List((900L, "30"), (902L, "32")),
      s"prepared-committed + plain survive, prepared-rolled-back " +
        s"vanishes: $assembled")
    // the prepared tx's rows carry the COMMIT PREPARED time, not the
    // prepare time — downstream sees when the tx became durable
    assert(assembled.head._3.getTime == t0 / 1000,
      s"commit-prepared ts expected, got ${assembled.head._3}")
  }

  test("two-phase: a STREAMED transaction ending in StreamPrepare " +
      "resolves by CommitPrepared/RollbackPrepared with member fan-out") {
    // tx 910 streams rows under itself + subxact 911, stream-prepares,
    // and commits: every member gets the commit marker. tx 920 streams,
    // stream-prepares, rolls back: every member gets an ABORT.
    val out = decode(Seq(
      PgWire.streamStart(910, firstSegment = true),
      PgWire.streamed(910, relMsg),
      PgWire.streamed(910, PgWire.insert(relUsers,
        Seq(Some("40"), Some("top"), None))),
      PgWire.streamed(911, PgWire.insert(relUsers,
        Seq(Some("41"), Some("sub"), None))),
      PgWire.streamStop(),
      PgWire.streamPrepare(200L, 201L, t0, 910, "gid-s"),
      PgWire.streamStart(920, firstSegment = true),
      PgWire.streamed(920, PgWire.insert(relUsers,
        Seq(Some("50"), Some("doomed"), None))),
      PgWire.streamed(921, PgWire.insert(relUsers,
        Seq(Some("51"), Some("doomed-sub"), None))),
      PgWire.streamStop(),
      PgWire.streamPrepare(210L, 211L, t0, 920, "gid-t"),
      PgWire.commitPrepared(220L, 221L, t0, 910, "gid-s"),
      PgWire.rollbackPrepared(210L, 230L, t0,
        t0, 920, "gid-t")))
    val commits = out.filter(_.is_commit).map(_.txid)
    assert(commits == List(910L, 911L), s"commit fan-out: $commits")
    val aborts = out.filter(_.operation == "ABORT").map(_.txid)
    assert(aborts == List(920L, 921L), s"abort fan-out: $aborts")
    import spark.implicits._
    val ids = graft.cdc.TxAssembly.assemble(spark.createDataset(out).toDF())
      .select($"new_values".getItem("id").as(""))
      .as[String].collect().sorted.toList
    assert(ids == List("40", "41"),
      s"stream-prepared-committed members survive, rolled-back " +
        s"members vanish: $ids")
    // a StreamPrepare naming a transaction this session never saw
    // stream (an archive slice starting mid-transaction) degrades to a
    // singleton member set — the same state-loss posture as the other
    // resolution frames ('c'/'K'/'r' getOrElse fallbacks) — so the
    // later CommitPrepared still resolves it instead of the whole task
    // dying on a structurally-valid frame
    val sliced = decode(Seq(
      PgWire.streamPrepare(300L, 301L, t0, 999, "gid-x"),
      PgWire.commitPrepared(300L, 302L, t0, 999, "gid-x")))
    assert(sliced.filter(_.is_commit).map(_.txid) == List(999L),
      s"mid-transaction slice must still resolve: $sliced")
  }

  test("distributed decode through the DataFrame API") {
    import spark.implicits._
    val msgs = Seq(relMsg, PgWire.begin(1000, t0, 42),
      PgWire.insert(relUsers, Seq(Some("5"), Some("n"), None)),
      PgWire.commit(1000, 1001, t0))
      .zipWithIndex.map { case (m, i) => (i.toLong, m) }
    val df = PgOutput.decode(spark, msgs.toDF("wal_start", "data").coalesce(1))
    val rows = df.filter($"operation" === "INSERT").collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Map[String, String]]("new_values")("id") == "5")
    assert(rows(0).getAs[Long]("txid") == 42L)
  }
}
