package graft.sinks

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream,
  DataOutputStream, IOException}
import java.net.Socket
import java.nio.ByteBuffer

import scala.collection.mutable

/** Shared connection + metadata plumbing for the wire-protocol Kafka
  * producer ([[KafkaSinkWriter]]) and consumer
  * ([[graft.sources.KafkaEnvelopeSource]]): per-broker sockets,
  * correlation-id bookkeeping, framed request/response round trips, and
  * a topic→partition-leader cache refreshed from Metadata v4. One
  * instance per task/partition — connections never serialize.
  */
final class KafkaClient(bootstrap: String,
    clientId: String = "graft-cdc",
    requestTimeoutMs: Int = 30000,
    user: Option[String] = None,
    password: Option[String] = None,
    mechanism: String = "PLAIN",
    tls: Boolean = false,
    tlsTruststore: Option[String] = None,
    tlsTruststorePassword: Option[String] = None) {

  private case class Conn(socket: Socket, in: DataInputStream,
      out: DataOutputStream)

  /** TLS socket factory: the JVM default trust anchors, or — for
    * self-signed / private-CA deployments — an explicit truststore
    * (PKCS12 or JKS, auto-detected by KeyStore). Hostname verification
    * is ON (the HTTPS endpoint-identification algorithm), matching the
    * ecosystem clients' `ssl.endpoint.identification.algorithm=https`
    * default — a truststore narrows WHICH CAs are trusted, never
    * whether the peer must prove its name.
    */
  private lazy val sslFactory: javax.net.ssl.SSLSocketFactory =
    tlsTruststore match {
      case Some(path) =>
        val ks = java.security.KeyStore.getInstance(
          if (path.endsWith(".jks")) "JKS" else "PKCS12")
        val is = new java.io.FileInputStream(path)
        try ks.load(is, tlsTruststorePassword.getOrElse("").toCharArray)
        finally is.close()
        val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
          javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
        tmf.init(ks)
        val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
        ctx.init(null, tmf.getTrustManagers, null)
        ctx.getSocketFactory
      case None =>
        javax.net.ssl.SSLContext.getDefault.getSocketFactory
    }

  private val conns = mutable.Map.empty[(String, Int), Conn]
  private val leaders = mutable.Map.empty[String, Map[Int, Int]]
  private var brokers = Map.empty[Int, (String, Int)]
  private var corr = 0

  def bootstrapEndpoint: (String, Int) = {
    val i = bootstrap.lastIndexOf(':')
    require(i > 0, s"bootstrap must be host:port, got '$bootstrap'")
    (bootstrap.substring(0, i), bootstrap.substring(i + 1).toInt)
  }

  private def connect(hp: (String, Int)): Conn = synchronized {
    conns.getOrElseUpdate(hp, {
      val s =
        if (tls) {
          val ssl = sslFactory.createSocket(hp._1, hp._2)
            .asInstanceOf[javax.net.ssl.SSLSocket]
          val params = ssl.getSSLParameters
          params.setEndpointIdentificationAlgorithm("HTTPS")
          ssl.setSSLParameters(params)
          ssl.startHandshake()
          ssl
        } else new Socket(hp._1, hp._2)
      s.setSoTimeout(requestTimeoutMs)
      s.setTcpNoDelay(true)
      val c = Conn(s,
        new DataInputStream(new BufferedInputStream(s.getInputStream)),
        new DataOutputStream(new BufferedOutputStream(s.getOutputStream)))
      user.foreach { u =>
        try authenticate(c, u, password.getOrElse(""))
        catch { case e: Throwable =>
          try s.close() catch { case _: IOException => }
          throw e
        }
      }
      c
    })
  }

  private def dropConn(hp: (String, Int)): Unit = synchronized {
    conns.remove(hp).foreach(c =>
      try c.socket.close() catch { case _: IOException => })
  }

  def nextCorr(): Int = synchronized { corr += 1; corr }

  private def sendRecv(c: Conn, framed: Array[Byte],
      expectCorr: Int): Array[Byte] = {
    c.out.write(framed); c.out.flush()
    val len = c.in.readInt()
    if (len < 4 || len > 64 * 1024 * 1024)
      throw new IOException(s"bad response frame length $len")
    val payload = new Array[Byte](len)
    c.in.readFully(payload)
    val b = ByteBuffer.wrap(payload)
    val got = b.getInt()
    if (got != expectCorr)
      throw new IOException(s"correlation mismatch: $got != $expectCorr")
    java.util.Arrays.copyOfRange(payload, 4, payload.length)
  }

  /** SASL on a fresh connection — SaslHandshake v1 proposing the
    * configured mechanism, then the mechanism's token exchange over
    * SaslAuthenticate v0. PLAIN is one NUL-delimited token (RFC 4616);
    * SCRAM-SHA-256 is the same RFC 5802 exchange the Postgres transport
    * speaks, reusing [[graft.sources.PgWireProtocol.Scram]] verbatim —
    * including mutual server-signature verification. Credential
    * rejection is PERMANENT (retrying wrong credentials burns the
    * budget without progress).
    */
  private def authenticate(c: Conn, u: String, pw: String): Unit = {
    import java.nio.charset.StandardCharsets.UTF_8
    val hid = nextCorr()
    val (herr, mechanisms) = KafkaWire.parseSaslHandshakeV1(
      sendRecv(c, KafkaWire.saslHandshakeRequestV1(hid, clientId, mechanism), hid))
    if (herr != 0)
      throw new graft.streaming.PermanentPublishException(
        s"broker rejected SASL mechanism $mechanism (error $herr; " +
          s"supported: ${mechanisms.mkString(",")})")
    def round(token: Array[Byte]): Array[Byte] = {
      val id = nextCorr()
      val (err, msg, bytes) = KafkaWire.parseSaslAuthenticateV0(
        sendRecv(c, KafkaWire.saslAuthenticateRequestV0(id, clientId, token), id))
      if (err != 0)
        throw new graft.streaming.PermanentPublishException(
          s"SASL authentication failed (error $err${Option(msg)
            .map(m => s": $m").getOrElse("")})")
      bytes
    }
    mechanism match {
      case "PLAIN" =>
        // RFC 4616: [authzid] NUL authcid NUL passwd (empty authzid)
        round(Array[Byte](0) ++ u.getBytes(UTF_8) ++
          Array[Byte](0) ++ pw.getBytes(UTF_8))
        ()
      case "SCRAM-SHA-256" =>
        val scram = graft.sources.PgWireProtocol.Scram
        val r = new Array[Byte](18)
        new java.security.SecureRandom().nextBytes(r)
        val nonce = scram.b64(r)
        val firstBare = s"n=$u,r=$nonce"
        val serverFirst = new String(
          round(s"n,,$firstBare".getBytes(UTF_8)), UTF_8)
        val a = scram.attrs(serverFirst)
        require(a('r').startsWith(nonce), "server nonce must extend ours")
        val noProof = s"c=biws,r=${a('r')}"
        val (proof, sig) = scram.proofs(pw, firstBare, serverFirst, noProof)
        val fin = new String(
          round(s"$noProof,p=${scram.b64(proof)}".getBytes(UTF_8)), UTF_8)
        require(java.security.MessageDigest.isEqual(
          scram.unb64(scram.attrs(fin)('v')), sig),
          "server signature verification failed")
        ()
      case other => throw new IllegalArgumentException(
        s"unsupported SASL mechanism '$other' (PLAIN | SCRAM-SHA-256)")
    }
  }

  /** One request/response round trip; returns the body after the
    * correlation id (responses arrive in request order per connection).
    * Serialized per connection, so parallel snapshots (one thread per
    * broker) can never interleave frames on a shared socket.
    */
  def roundTrip(hp: (String, Int), framed: Array[Byte],
      expectCorr: Int): Array[Byte] = {
    val c = connect(hp)
    try c.synchronized { sendRecv(c, framed, expectCorr) }
    catch {
      case e: IOException => dropConn(hp); throw e
    }
  }

  /** Refresh and cache the topic's partition→leader map (Metadata v4 to
    * the bootstrap). Throws IOException for retriable topic states.
    */
  def refreshMetadata(topic: String): Unit = refreshMetadata(Seq(topic))

  /** Refresh MANY topics' partition→leader maps with ONE Metadata v4
    * round trip (the request body is `[topics]` by spec) — a
    * subscription over N topics must not pay N metadata RTTs per cache
    * refresh. Throws IOException for retriable topic states.
    */
  def refreshMetadata(topics: Seq[String]): Unit = {
    if (topics.isEmpty) return
    val id = nextCorr()
    val resp = KafkaWire.parseMetadataV4(roundTrip(bootstrapEndpoint,
      KafkaWire.metadataRequestV4(id, clientId, topics.distinct), id))
    synchronized { brokers = resp.brokers }
    topics.distinct.foreach { topic =>
      val tm = resp.topics.find(_.name == topic).getOrElse(
        throw new IOException(s"metadata response missing topic $topic"))
      if (tm.errorCode != 0) {
        if (KafkaWire.isPermanent(tm.errorCode))
          throw new graft.streaming.PermanentPublishException(
            s"topic $topic rejected: error ${tm.errorCode}")
        throw new IOException(s"topic $topic metadata error ${tm.errorCode}" +
          " (retriable — auto-creation may still be materializing)")
      }
      val byPart = tm.partitions.map(p => p.index -> p.leader).toMap
      if (byPart.isEmpty || byPart.valuesIterator.contains(-1))
        throw new IOException(s"topic $topic has no elected leaders yet")
      synchronized { leaders(topic) = byPart }
    }
  }

  /** Every topic name the broker knows (Metadata v4 with a null topics
    * array) — the discovery half of a pattern subscription; errored
    * entries are skipped (a sane pattern never matches the `__`-internal
    * topics, so they are left to the regex).
    */
  def allTopics(): Seq[String] = {
    val id = nextCorr()
    val resp = KafkaWire.parseMetadataV4(roundTrip(bootstrapEndpoint,
      KafkaWire.metadataAllRequestV4(id, clientId), id))
    brokers = resp.brokers
    resp.topics.filter(_.errorCode == 0).map(_.name)
  }

  /** The topic's partition→leader map, fetching metadata on first use. */
  def partitionLeaders(topic: String): Map[Int, Int] = {
    if (!synchronized(leaders.contains(topic))) refreshMetadata(topic)
    synchronized(leaders(topic))
  }

  /** Prefetch leader maps for every listed topic not yet cached — ONE
    * metadata round trip for the whole missing set.
    */
  def prefetchLeaders(topics: Seq[String]): Unit =
    refreshMetadata(topics.filterNot(t => synchronized(leaders.contains(t))))

  def endpointOf(brokerId: Int, topic: String): (String, Int) =
    synchronized(brokers.get(brokerId)).getOrElse {
      invalidate(topic)
      throw new IOException(s"leader $brokerId unknown")
    }

  /** Drop the topic's cached leadership so the next use re-resolves. */
  def invalidate(topic: String): Unit = synchronized { leaders.remove(topic); () }

  // ---------- consumer-group offsets (checkpoint mirror / import) ----------

  private val coordinators = mutable.Map.empty[String, (String, Int)]

  /** The broker hosting `groupId`'s offsets — resolved once via
    * FindCoordinator v2 and cached; every OffsetCommit/OffsetFetch must
    * target it (any other broker answers NOT_COORDINATOR).
    */
  def coordinator(groupId: String): (String, Int) = {
    synchronized(coordinators.get(groupId)).getOrElse {
      val id = nextCorr()
      val (err, _, host, port) = KafkaWire.parseFindCoordinatorV2(
        roundTrip(bootstrapEndpoint,
          KafkaWire.findCoordinatorRequestV2(id, clientId, groupId), id))
      if (err != 0)
        throw new IOException(s"find-coordinator($groupId): error $err")
      val hp = (host, port)
      synchronized { coordinators(groupId) = hp }
      hp
    }
  }

  /** Drop the group's cached coordinator (a coordinator move answers
    * NOT_COORDINATOR=16 until re-resolved).
    */
  def invalidateCoordinator(groupId: String): Unit =
    synchronized { coordinators.remove(groupId); () }

  /** The broker hosting `transactionalId`'s slice of the transaction-
    * state topic — FindCoordinator with key_type 1; InitProducerId /
    * AddPartitionsToTxn / EndTxn must target it. Cached under a
    * type-disambiguated key so a group of the same name can't collide.
    */
  /** Drop a transactional id's cached coordinator — coordinator-RPC
    * failures call this so the retry re-resolves a moved coordinator
    * instead of hammering the stale broker (the exact mirror of
    * [[invalidateCoordinator]] on the group path).
    */
  def invalidateTxnCoordinator(transactionalId: String): Unit =
    synchronized { coordinators.remove(s"txn:$transactionalId"); () }

  def txnCoordinator(transactionalId: String): (String, Int) = {
    val key = s"txn:$transactionalId"
    synchronized(coordinators.get(key)).getOrElse {
      val id = nextCorr()
      val (err, _, host, port) = KafkaWire.parseFindCoordinatorV2(
        roundTrip(bootstrapEndpoint,
          KafkaWire.findCoordinatorRequestV2(id, clientId, transactionalId,
            keyType = 1), id))
      if (err != 0)
        throw new IOException(s"find-txn-coordinator($transactionalId): " +
          s"error $err")
      val hp = (host, port)
      synchronized { coordinators(key) = hp }
      hp
    }
  }

  /** Commit `offsets` under `groupId` as a STANDALONE consumer — one
    * batched OffsetCommit v2 to the group's coordinator. Throws
    * IOException on any per-partition error (after dropping the
    * coordinator cache, so the retry re-resolves a moved coordinator).
    */
  def commitOffsets(groupId: String,
      offsets: Map[(String, Int), Long]): Unit = {
    if (offsets.isEmpty) return
    val byTopic = offsets.groupBy(_._1._1).map { case (t, m) =>
      t -> m.toSeq.map { case ((_, p), off) => (p, off) }.sortBy(_._1)
    }
    val id = nextCorr()
    val errs = KafkaWire.parseOffsetCommitV2(roundTrip(coordinator(groupId),
      KafkaWire.offsetCommitRequestV2(id, clientId, groupId, byTopic), id))
    val bad = errs.filter(_._2 != 0)
    if (bad.nonEmpty) {
      invalidateCoordinator(groupId)
      throw new IOException(s"offset-commit($groupId) failed: " +
        bad.map { case ((t, p), e) => s"$t/$p=$e" }.mkString(","))
    }
  }

  /** The group's committed offset per (topic, partition) — one batched
    * OffsetFetch v1 to the coordinator. Partitions with no commit are
    * ABSENT from the result (the broker answers them as -1).
    */
  def fetchCommitted(groupId: String,
      tps: Seq[(String, Int)]): Map[(String, Int), Long] = {
    if (tps.isEmpty) return Map.empty
    val byTopic = tps.groupBy(_._1).map { case (t, ps) =>
      t -> ps.map(_._2).sorted
    }
    val id = nextCorr()
    val got = KafkaWire.parseOffsetFetchV1(roundTrip(coordinator(groupId),
      KafkaWire.offsetFetchRequestV1(id, clientId, groupId, byTopic), id))
    val bad = got.filter(_._2._1 != 0)
    if (bad.nonEmpty) {
      invalidateCoordinator(groupId)
      throw new IOException(s"offset-fetch($groupId) failed: " +
        bad.map { case ((t, p), (e, _)) => s"$t/$p=$e" }.mkString(","))
    }
    got.collect { case (tp, (_, off)) if off >= 0 => tp -> off }
  }

  def close(): Unit = {
    synchronized(conns.keys.toSeq).foreach(dropConn)
    synchronized { leaders.clear(); coordinators.clear() }
  }
}
