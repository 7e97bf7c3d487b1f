package graft.sinks

import java.io.IOException
import java.nio.charset.StandardCharsets.UTF_8

import graft.streaming.{PermanentPublishException, PublishItem, SinkWriter}

/** A real Kafka producer over the raw wire protocol — the broker-backed
  * deployment of the [[graft.streaming.SinkWriter]] seam (reference E6,
  * internal/publisher/jetstream.go:316-474: serialize → publish → await
  * the broker ack per item). No client jar exists in this environment,
  * so like [[graft.sources.SocketReplication]] this speaks the PUBLIC
  * protocol directly: Metadata v4 to find partition leaders, Produce v3
  * with message-format-v2 record batches (CRC32C-framed), acks=-1 and a
  * blocking read of each ack before returning — which IS the ordered
  * mode's contract.
  *
  * Mapping (the reference's subject conventions, publisher.go):
  *  - topic   = sanitized subject (Kafka's legal charset [a-zA-Z0-9._-]);
  *  - key     = subject bytes → murmur2 partitioner, so one subject's
  *              events land on one partition in commit order — Kafka's
  *              per-partition ordering is the JetStream subject-ordering
  *              analog;
  *  - headers = event-id (the broker-side dedup key, Nats-Msg-Id analog)
  *              + wal-position.
  *
  * Failure contract: protocol errors the broker marks retriable (leader
  * moved, timeouts, topic still materializing) throw plain IOException —
  * the publish loops' transient class — after dropping cached metadata so
  * the retry re-resolves the leader; size/validation errors throw
  * [[PermanentPublishException]] (the reference's IsPermanentPublishError
  * classes). PLAINTEXT and SASL_PLAINTEXT listeners (PLAIN or
  * SCRAM-SHA-256 — the same RFC 5802 code path as the Postgres
  * transport, mutual server-signature verification included); TLS is
  * out of scope here.
  *
  * Idempotence scope: the (producerId, sequence) pair dedups RETRIES
  * within this writer's lifetime — the lost-ack window the per-item
  * retry loop creates. A whole-batch REDELIVERY (foreachBatch replay
  * after a checkpoint failure) builds a fresh writer and a fresh pid;
  * that layer is covered by the event-id header (the broker-side
  * Msg-Id dedup key consumers filter on) exactly as in the reference.
  *
  * Transactional mode (`transactionalId = Some(...)`) upgrades a
  * partition task's publish to EXACTLY-ONCE: everything published since
  * construction commits atomically at [[commit]] (one EndTxn — the
  * coordinator writes a control marker to every partition declared via
  * AddPartitionsToTxn), a failed task's partial publish aborts in
  * [[close]], and a task RETRY re-registering the same id fences the
  * zombie attempt (epoch bump: the old incarnation's produce/EndTxn
  * fail INVALID_PRODUCER_EPOCH, surfaced as
  * [[graft.streaming.FencedWriterException]] — never retried into an
  * interleave and never quarantined: the publish loops fail the whole
  * task, because the zombie's remaining items are healthy and belong to
  * the successor). read_committed consumers — this
  * library's own [[graft.sources.KafkaEnvelopeSource]] with
  * `isolation=read_committed` included — therefore see each batch's
  * items exactly once per successful attempt. Scope, honestly: a
  * CROSS-RESTART batch replay is a NEW transaction (the WAL checkpoint,
  * not the broker, owns input progress — there is no consume-offsets leg
  * to commit inside the txn), so replay dedup stays on the event-id
  * header as above; what transactions add is atomicity + zombie fencing
  * within every attempt.
  *
  * Construct per executor partition via factory (connections do not
  * serialize): `CdcStream.start(sinkWriter = Some(() => new
  * KafkaSinkWriter(bootstrap)))` — `tools.Main` wires exactly that for
  * `GRAFT_SINK=kafka`.
  */
final class KafkaSinkWriter(bootstrap: String,
    clientId: String = "graft-cdc",
    acks: Short = -1,
    requestTimeoutMs: Int = 30000,
    user: Option[String] = None,
    password: Option[String] = None,
    mechanism: String = "PLAIN",
    idempotent: Boolean = true,
    tls: Boolean = false,
    tlsTruststore: Option[String] = None,
    tlsTruststorePassword: Option[String] = None,
    compression: String = "none",
    transactionalId: Option[String] = None,
    transactionTimeoutMs: Int = 60000) extends SinkWriter {

  private val codec = compression.toLowerCase match {
    case "none" => KafkaWire.CodecNone
    case "gzip" => KafkaWire.CodecGzip
    case other => throw new IllegalArgumentException(
      s"unsupported compression '$other' (none | gzip)")
  }

  private val client = new KafkaClient(bootstrap, clientId, requestTimeoutMs,
    user, password, mechanism, tls, tlsTruststore, tlsTruststorePassword)
  /** Base offset acked for the most recent publish — lets tests (and
    * operators) observe the broker actually appending.
    */
  @volatile var lastBaseOffset: Long = -1L

  // ---- idempotent producer state (broker-side retry dedup — the
  // JetStream Msg-Id analog at the LOG level): one (producerId, epoch)
  // per writer from InitProducerId, one sequence counter per partition,
  // incremented ONLY on ack. The ordered loop retries a failed item by
  // calling publish() again, which therefore resends the SAME sequence
  // — if the broker had already appended (the ack was lost, not the
  // write), it recognizes the duplicate and never double-appends.
  private var producerId = -1L
  private var producerEpoch: Short = -1
  private val nextSeq = scala.collection.mutable.Map.empty[(String, Int), Int]

  // ---- transactional state (EXACTLY-ONCE publish): the partitions the
  // open transaction has declared via AddPartitionsToTxn (EndTxn's
  // markers reach exactly these) and whether anything was produced. A
  // transaction opens implicitly at the first produce and closes at
  // commit()/abortTransaction(); close() aborts anything left open, so
  // a failed partition task never leaks a dangling visible-later txn.
  private val txnPartitions = scala.collection.mutable.Set.empty[(String, Int)]
  private var txnOpen = false

  private def transactional: Boolean = transactionalId.isDefined

  /** One RPC to the transaction coordinator; a connection/protocol
    * failure drops the cached coordinator so the retry re-resolves a
    * moved one (the exact posture of the group-offset path).
    */
  private def txnRoundTrip(tid: String,
      framed: Int => Array[Byte]): Array[Byte] = {
    val id = client.nextCorr()
    try client.roundTrip(client.txnCoordinator(tid), framed(id), id)
    catch { case e: java.io.IOException =>
      client.invalidateTxnCoordinator(tid); throw e
    }
  }

  private def ensureProducerId(): Unit =
    if ((idempotent || transactional) && producerId < 0L) {
      val (err, pid, epoch) = KafkaWire.parseInitProducerIdV0(
        transactionalId match {
          // transactionTimeoutMs is the COORDINATOR's abort deadline for
          // an open txn (Kafka's transaction.timeout.ms, default 60s) —
          // a different knob from the 30s RPC timeout: a publish+commit
          // span longer than the value passed here gets coordinator-
          // aborted mid-flight, and a task retry hits the same wall
          case Some(tid) => txnRoundTrip(tid, id =>
            KafkaWire.initProducerIdTxnRequestV0(id, clientId, tid,
              transactionTimeoutMs))
          case None =>
            val id = client.nextCorr()
            client.roundTrip(client.bootstrapEndpoint,
              KafkaWire.initProducerIdRequestV0(id, clientId), id)
        })
      if (err != 0)
        throw new java.io.IOException(s"InitProducerId failed: error $err")
      producerId = pid; producerEpoch = epoch
    }

  /** Declare any not-yet-declared partitions of the open transaction to
    * the coordinator. INVALID_PRODUCER_EPOCH means a newer incarnation
    * of this transactional_id fenced us — permanent by definition (no
    * retry of THIS writer can ever succeed); coordinator-busy answers
    * stay transient IOExceptions for the publish loops' retry.
    */
  private def ensurePartitionsInTxn(ps: Seq[(String, Int)]): Unit = {
    val missing = ps.filterNot(txnPartitions.contains)
    if (missing.isEmpty) return
    val tid = transactionalId.get
    val byTopic = missing.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (t, g) => (t, g.map(_._2)) }
    // open BEFORE the RPC: if the coordinator applied the add but the
    // response was lost, close() must still send the abort — a falsely
    // "open" empty txn aborts as a harmless INVALID_TXN_STATE, a falsely
    // "closed" real one would dangle and hold the LSO until timeout
    txnOpen = true
    val results = KafkaWire.parseAddPartitionsToTxnV0(
      txnRoundTrip(tid, id =>
        KafkaWire.addPartitionsToTxnRequestV0(id, clientId, tid,
          producerId, producerEpoch, byTopic)))
    results.foreach { case ((t, p), err) =>
      if (err == KafkaWire.ErrInvalidProducerEpoch ||
          err == KafkaWire.ErrInvalidTxnState)
        throw new graft.streaming.FencedWriterException(
          s"transaction fenced adding $t/$p: error $err " +
            s"(a newer '$tid' incarnation owns the id)")
      else if (err != 0)
        throw new java.io.IOException(
          s"AddPartitionsToTxn $t/$p failed: error $err")
      txnPartitions += ((t, p))
    }
  }

  /** Fold a consumer group's progress INTO the open transaction — the
    * consume-transform-produce loop closure (Kafka Streams' EOS recipe):
    * AddOffsetsToTxn enlists the group's offsets topic, TxnOffsetCommit
    * stages the offsets at the group coordinator, and they become
    * visible to OffsetFetch atomically with [[commit]] (discarded on
    * abort). For kafka→kafka topologies where the input position IS a
    * group offset; the WAL pipeline's input progress lives in the Spark
    * checkpoint instead, which is why [[graft.tools.Main]] does not wire
    * this by default.
    */
  def sendOffsetsToTransaction(groupId: String,
      offsets: Map[(String, Int), Long]): Unit = {
    require(transactional, "sendOffsetsToTransaction needs transactionalId")
    if (offsets.isEmpty) return
    ensureProducerId()
    val tid = transactionalId.get
    txnOpen = true // pre-RPC, same lost-response posture as partitions
    val err1 = KafkaWire.parseAddOffsetsToTxnV0(
      txnRoundTrip(tid, id =>
        KafkaWire.addOffsetsToTxnRequestV0(id, clientId, tid,
          producerId, producerEpoch, groupId)))
    if (err1 == KafkaWire.ErrInvalidProducerEpoch ||
        err1 == KafkaWire.ErrInvalidTxnState)
      throw new graft.streaming.FencedWriterException(
        s"AddOffsetsToTxn fenced: error $err1")
    else if (err1 != 0)
      throw new java.io.IOException(s"AddOffsetsToTxn failed: error $err1")
    val byTopic = offsets.toSeq.groupBy(_._1._1).map { case (t, g) =>
      t -> g.map { case ((_, p), off) => (p, off) }
    }
    val id2 = client.nextCorr()
    val results = KafkaWire.parseTxnOffsetCommitV0(
      try client.roundTrip(client.coordinator(groupId),
        KafkaWire.txnOffsetCommitRequestV0(id2, clientId, tid, groupId,
          producerId, producerEpoch, byTopic), id2)
      catch { case e: java.io.IOException =>
        client.invalidateCoordinator(groupId); throw e
      })
    results.foreach { case ((t, p), err) =>
      if (err == KafkaWire.ErrInvalidProducerEpoch ||
          err == KafkaWire.ErrInvalidTxnState)
        throw new graft.streaming.FencedWriterException(
          s"TxnOffsetCommit $t/$p fenced: error $err")
      else if (err != 0)
        throw new java.io.IOException(
          s"TxnOffsetCommit $t/$p failed: error $err")
    }
  }

  /** Commit the open transaction: one EndTxn(commit) — the coordinator
    * writes a control marker to every declared partition, atomically
    * flipping this writer's whole publish for read_committed consumers.
    * No-op when nothing was produced or the writer is not transactional.
    * Wired to [[graft.streaming.SinkPublisher.writeBatchVia]]'s success
    * hook: a partition task that publishes everything commits once; a
    * failed task aborts in close() and the retry's re-init fences it.
    */
  override def commit(): Unit = endOpenTxn(commitTxn = true)

  /** Abort the open transaction (explicitly — close() also does this). */
  def abortTransaction(): Unit = endOpenTxn(commitTxn = false)

  private def endOpenTxn(commitTxn: Boolean): Unit =
    if (transactional && txnOpen) {
      val tid = transactionalId.get
      val err = KafkaWire.parseEndTxnV0(
        txnRoundTrip(tid, id =>
          KafkaWire.endTxnRequestV0(id, clientId, tid, producerId,
            producerEpoch, commitTxn)))
      if (err == KafkaWire.ErrInvalidProducerEpoch ||
          err == KafkaWire.ErrInvalidTxnState)
        throw new graft.streaming.FencedWriterException(
          s"EndTxn(commit=$commitTxn) fenced: error $err " +
            s"(a newer '$tid' incarnation owns the id)")
      else if (err != 0)
        throw new java.io.IOException(
          s"EndTxn(commit=$commitTxn) failed: error $err")
      txnPartitions.clear()
      txnOpen = false
    }

  /** Kafka's legal topic charset; everything else maps to '_' (the
    * reference sanitizes subject tokens the same way, subjects.go).
    */
  private[graft] def topicFor(subject: String): String = {
    val t = subject.map(c =>
      if (c.isLetterOrDigit || c == '.' || c == '_' || c == '-') c else '_')
    (if (t == "." || t == "..") "_" else t).take(249)
  }

  override def publish(item: PublishItem): Unit = produceGroup(Seq(item))

  override def batches: Boolean = true

  /** Batched produce — the UNORDERED path's throughput shape (reference
    * E3): group items by (topic, partition) and send each group as ONE
    * multi-record v2 batch in one Produce RPC, instead of one RPC per
    * item. Within a group the batch preserves item order and the broker
    * appends it atomically; ordering ACROSS groups is not promised,
    * which is exactly the unordered mode's documented trade-off. The
    * ordered loop keeps calling single-item [[publish]] — its contract
    * is one awaited ack per item.
    */
  override def publishAll(items: Seq[PublishItem]): Unit = {
    val groups = items.groupBy(it => {
      val topic = topicFor(it.subject)
      (topic, KafkaWire.partitionFor(it.subject.getBytes(UTF_8),
        client.partitionLeaders(topic).size))
    }).toSeq.sortBy(_._1)
    if (groups.isEmpty) return
    ensureProducerId()
    // one Produce RPC per LEADER BROKER, carrying every (topic,
    // partition) batch it leads — `[topic_data][partition_data]` is the
    // request's native shape, the producer-side mirror of the consumer's
    // batched ListOffsets: a task fanning out to N partitions pays
    // O(brokers) round trips, not O(partitions)
    groups.groupBy { case ((t, p), _) =>
      client.endpointOf(client.partitionLeaders(t)(p), t)
    }.toSeq.sortBy(_._1.toString)
      .foreach { case (hp, gs) => produceTo(hp, gs) }
  }

  /** One Produce RPC carrying `group` (all same topic+partition when
    * called from publishAll; publish passes a singleton) as a single
    * record batch, ack awaited. Idempotent sequences advance by the
    * GROUP SIZE on ack — a retried group resends the same baseSequence,
    * so the broker dedups the whole batch on a lost ack.
    */
  private def produceGroup(group: Seq[PublishItem]): Unit = {
    val head = group.head
    val topic = topicFor(head.subject)
    val parts = client.partitionLeaders(topic)
    val partition = KafkaWire.partitionFor(head.subject.getBytes(UTF_8),
      parts.size)
    ensureProducerId()
    produceTo(client.endpointOf(parts(partition), topic),
      Seq(((topic, partition), group)))
  }

  /** ONE Produce RPC to `leaderHp` carrying a record batch per (topic,
    * partition) group, all acks awaited in the one response. Sequences
    * advance per partition on ITS ack, so a partial failure leaves the
    * failed partitions' sequences untouched — the retry resends the
    * same baseSequence there and the broker dedups anything that had
    * actually appended.
    */
  private def produceTo(leaderHp: (String, Int),
      gs: Seq[((String, Int), Seq[PublishItem])]): Unit = {
    if (transactional) ensurePartitionsInTxn(gs.map(_._1))
    val entries = gs.groupBy(_._1._1).toSeq.sortBy(_._1).map {
      case (t, tg) => t -> tg.map { case ((_, p), group) =>
        val seq = if (idempotent || transactional)
          nextSeq.getOrElse((t, p), 0) else -1
        p -> KafkaWire.recordBatch(
          group.map(item =>
            (item.subject.getBytes(UTF_8), item.payload.getBytes(UTF_8),
              Seq("event-id" -> item.eventId.getBytes(UTF_8),
                "wal-position" -> item.position.toString.getBytes(UTF_8)))),
          timestampMs = System.currentTimeMillis(),
          producerId = producerId, producerEpoch = producerEpoch,
          baseSequence = seq, compression = codec,
          transactional = transactional)
      }
    }
    val id = client.nextCorr()
    val body = try client.roundTrip(leaderHp, KafkaWire.produceRequestV3(
      id, clientId, entries, acks, requestTimeoutMs,
      transactionalId = transactionalId.orNull), id)
    catch { case e: IOException =>
      gs.foreach { case ((t, _), _) => client.invalidate(t) }; throw e }
    val results = KafkaWire.parseProduceResponseAll(body).toMap
    var firstFailure: Throwable = null
    gs.foreach { case ((topic, partition), group) =>
      val (err, baseOffset) =
        results.getOrElse((topic, partition), ((-1).toShort, -1L))
      if (err == 0) {
        if (idempotent || transactional) nextSeq((topic, partition)) =
          nextSeq.getOrElse((topic, partition), 0) + group.size
        lastBaseOffset = baseOffset
      } else {
        client.invalidate(topic) // leadership may have moved; re-resolve
        val e: Throwable =
          if (err == KafkaWire.ErrInvalidProducerEpoch ||
              err == KafkaWire.ErrInvalidTxnState) {
            // fenced: a newer incarnation of our transactional_id took
            // over (task retry / failover) — permanently fatal for THIS
            // writer, and exactly what must NOT be retried (the zombie
            // would interleave with its successor)
            new graft.streaming.FencedWriterException(
              s"produce to $topic/$partition " +
                s"fenced: error $err (newer transactional incarnation)")
          } else if (err == KafkaWire.ErrOutOfOrderSequence ||
              err == KafkaWire.ErrDuplicateSequence) {
            // the broker's producer-state for our pid is gone or
            // disagrees (state eviction, pid expiry): retrying the SAME
            // sequence can never succeed — it would wedge the retry loop
            // resending one rejected frame forever. Reset to a fresh
            // InitProducerId and sequence 0 and classify transient, so
            // the loop's next attempt re-registers and lands; cross-pid
            // duplicates in the lost-ack window remain covered by the
            // event-id header (reference E7).
            producerId = -1L; producerEpoch = -1; nextSeq.clear()
            new IOException(s"produce to $topic/$partition rejected " +
              s"(sequence error $err): producer id reset, retry re-registers")
          } else if (err == -1)
            new IOException(
              s"produce response missing $topic/$partition")
          else if (KafkaWire.isPermanent(err))
            new PermanentPublishException(
              s"produce to $topic/$partition rejected permanently: error $err")
          else new IOException(
            s"produce to $topic/$partition failed: error $err")
        if (firstFailure == null) firstFailure = e
      }
    }
    if (firstFailure != null) throw firstFailure
  }

  /** Abort any still-open transaction (best effort — the coordinator
    * also times dangling transactions out, and a successor's re-init
    * aborts them immediately), then drop the connections.
    */
  override def close(): Unit = {
    try abortTransaction()
    catch { case _: Throwable => () } // fenced/conn-lost: successor wins
    client.close()
  }
}
