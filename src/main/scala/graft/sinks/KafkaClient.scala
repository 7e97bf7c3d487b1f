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
    requestTimeoutMs: Int = 30000) {

  private case class Conn(socket: Socket, in: DataInputStream,
      out: DataOutputStream)

  private val conns = mutable.Map.empty[(String, Int), Conn]
  private val leaders = mutable.Map.empty[String, Map[Int, Int]]
  private var brokers = Map.empty[Int, (String, Int)]
  private var corr = 0

  def bootstrapEndpoint: (String, Int) = {
    val i = bootstrap.lastIndexOf(':')
    require(i > 0, s"bootstrap must be host:port, got '$bootstrap'")
    (bootstrap.substring(0, i), bootstrap.substring(i + 1).toInt)
  }

  private def connect(hp: (String, Int)): Conn =
    conns.getOrElseUpdate(hp, {
      val s = new Socket(hp._1, hp._2)
      s.setSoTimeout(requestTimeoutMs)
      s.setTcpNoDelay(true)
      Conn(s, new DataInputStream(new BufferedInputStream(s.getInputStream)),
        new DataOutputStream(new BufferedOutputStream(s.getOutputStream)))
    })

  private def dropConn(hp: (String, Int)): Unit =
    conns.remove(hp).foreach(c =>
      try c.socket.close() catch { case _: IOException => })

  def nextCorr(): Int = { corr += 1; corr }

  /** One request/response round trip; returns the body after the
    * correlation id (responses arrive in request order per connection).
    */
  def roundTrip(hp: (String, Int), framed: Array[Byte],
      expectCorr: Int): Array[Byte] = {
    val c = connect(hp)
    try {
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
    } catch {
      case e: IOException => dropConn(hp); throw e
    }
  }

  /** Refresh and cache the topic's partition→leader map (Metadata v4 to
    * the bootstrap). Throws IOException for retriable topic states.
    */
  def refreshMetadata(topic: String): Unit = {
    val id = nextCorr()
    val resp = KafkaWire.parseMetadataV4(roundTrip(bootstrapEndpoint,
      KafkaWire.metadataRequestV4(id, clientId, topic), id))
    brokers = resp.brokers
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
    leaders(topic) = byPart
    ()
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
    if (!leaders.contains(topic)) refreshMetadata(topic)
    leaders(topic)
  }

  def endpointOf(brokerId: Int, topic: String): (String, Int) =
    brokers.getOrElse(brokerId, {
      invalidate(topic)
      throw new IOException(s"leader $brokerId unknown")
    })

  /** Drop the topic's cached leadership so the next use re-resolves. */
  def invalidate(topic: String): Unit = { leaders.remove(topic); () }

  def close(): Unit = {
    conns.keys.toSeq.foreach(dropConn)
    leaders.clear()
  }
}
