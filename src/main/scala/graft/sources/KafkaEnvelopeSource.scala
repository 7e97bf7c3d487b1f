package graft.sources

import java.io.IOException
import java.util.{Map => JMap}

import scala.collection.mutable

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sinks.{KafkaClient, KafkaWire}

/** Per-(topic, partition) next-offset positions of the consumed topic
  * set — the stream's checkpointable offset (what a consumer group's
  * committed offsets are to the ecosystem client; here the Spark
  * checkpoint IS the group). Topic names use Kafka's legal charset
  * ([a-zA-Z0-9._-]), so ':' and ',' are safe separators.
  */
final case class KafkaPartitionOffsets(positions: Map[(String, Int), Long])
    extends Offset {
  override def json(): String =
    positions.toSeq.sortBy { case ((t, p), _) => (t, p) }
      .map { case ((t, p), o) => s"$t:$p:$o" }.mkString(",")
}

object KafkaPartitionOffsets {
  def parse(s: String): KafkaPartitionOffsets =
    KafkaPartitionOffsets(
      if (s.isEmpty) Map.empty
      else s.split(",").map { kv =>
        val Array(t, p, o) = kv.split(":")
        (t, p.toInt) -> o.toLong
      }.toMap)
}

final case class KafkaRangePartition(bootstrap: String, topic: String,
    partition: Int, startOffset: Long, endOffset: Long,
    user: Option[String] = None, password: Option[String] = None,
    mechanism: String = "PLAIN", tls: Boolean = false,
    tlsTruststore: Option[String] = None,
    tlsTruststorePassword: Option[String] = None,
    readCommitted: Boolean = false) extends InputPartition

/** Consume a topic the [[graft.sinks.KafkaSinkWriter]] (or any producer)
  * wrote — the SUBSCRIBER half of the reference's pub/sub deployment
  * (its consumers apply changes from JetStream subjects,
  * cmd/consumer/main.go; they never re-read the WAL). Speaks the same
  * raw wire protocol as the producer: ListOffsets v2 resolves each
  * partition's log start/end, Fetch v4 streams message-format-v2 record
  * batches (CRC32C-verified on decode).
  *
  * Scale shape: ONE InputPartition per Kafka partition per micro-batch —
  * partition-parallel consumption, each reader fetching only its own
  * (start, end) offset range from that partition's leader; the driver
  * touches only offsets — O(brokers) round trips per trigger (one
  * BATCHED ListOffsets per leader, parallel across brokers; one batched
  * Metadata covers every uncached topic), never O(partitions) and never
  * records. Offsets live in the Spark checkpoint, so
  * replay re-fetches exactly the planned range — the broker's log is the
  * retention (the slot-retention analog of the CopyBoth source).
  */
final class KafkaEnvelopeStream(bootstrap: String, topics: Seq[String],
    topicPattern: Option[String], startLatest: Boolean,
    user: Option[String] = None, password: Option[String] = None,
    mechanism: String = "PLAIN", maxOffsetsPerTrigger: Option[Long] = None,
    tls: Boolean = false, tlsTruststore: Option[String] = None,
    tlsTruststorePassword: Option[String] = None,
    groupId: Option[String] = None, startGroup: Boolean = false,
    readCommitted: Boolean = false)
    extends MicroBatchStream with SupportsAdmissionControl {

  private lazy val log = graft.logging.Log(getClass)

  private val client = new KafkaClient(bootstrap, clientId = "graft-consumer",
    user = user, password = password, mechanism = mechanism, tls = tls,
    tlsTruststore = tlsTruststore,
    tlsTruststorePassword = tlsTruststorePassword)
  private val patternRe = topicPattern.map(_.r)

  /** The subscribed topic set THIS trigger: the fixed list, plus every
    * broker topic matching the pattern — re-resolved per poll, so topics
    * born mid-stream join the subscription (the reference's wildcard
    * subjects: its consumers bind `cdc.db.>` and new tables just
    * appear).
    */
  private def resolveTopics(): Seq[String] =
    (topics ++ patternRe.toSeq.flatMap(re =>
      client.allTopics().filter(t => re.pattern.matcher(t).matches())))
      .distinct.sorted

  /** Resolve offsets for MANY (topic, partition)s at `ts`: group the
    * partitions by leader broker and issue ONE batched ListOffsets v2
    * per broker — `[topics][partitions]` is the request's native shape —
    * in parallel across brokers. Driver cost per snapshot is therefore
    * O(brokers) round trips (wall = the slowest single RTT), not
    * O(partitions) serial RTTs: at thousands of partitions the
    * per-partition loop this replaces was tens of seconds of serial
    * driver network per trigger.
    */
  private def batchedOffsets(tps: Seq[(String, Int)],
      ts: Long): Map[(String, Int), Long] = {
    if (tps.isEmpty) return Map.empty
    client.prefetchLeaders(tps.map(_._1).distinct)
    val byBroker = tps.groupBy { case (t, p) =>
      client.endpointOf(client.partitionLeaders(t)(p), t)
    }
    def listOn(hp: (String, Int),
        group: Seq[(String, Int)]): Seq[((String, Int), Long)] = {
      val id = client.nextCorr()
      val req = group.groupBy(_._1).map { case (t, ps) =>
        t -> ps.map { case (_, p) => (p, ts) }
      }
      // under read_committed, TsLatest resolves to the LAST STABLE
      // offset — a trigger never plans into an open transaction, so a
      // reader can't block on records the broker withholds
      val all = KafkaWire.parseListOffsetsV2All(client.roundTrip(hp,
        KafkaWire.listOffsetsRequestV2(id, "graft-consumer", req,
          isolation = if (readCommitted) 1 else 0), id))
      group.map { tp =>
        val (err, off) = all.getOrElse(tp, ((-1).toShort, -1L))
        if (err != 0) {
          client.invalidate(tp._1)
          throw new IOException(
            s"list-offsets ${tp._1}/${tp._2}: error $err")
        }
        tp -> off
      }
    }
    byBroker.toSeq match {
      case Seq((hp, group)) => listOn(hp, group).toMap // common 1-broker case
      case groups =>
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        Await.result(
          Future.sequence(groups.map { case (hp, g) =>
            Future(listOn(hp, g))
          }), Duration.Inf).flatten.toMap
    }
  }

  private def snapshot(ts: Long): KafkaPartitionOffsets = {
    val ts0 = resolveTopics()
    client.prefetchLeaders(ts0) // ONE metadata RPC for every uncached topic
    KafkaPartitionOffsets(batchedOffsets(
      ts0.flatMap(t =>
        client.partitionLeaders(t).keys.toSeq.sorted.map(t -> _)), ts))
  }

  /** Log-start offsets of partitions first seen in an END snapshot
    * (pattern-matched topics born mid-stream, or retention-truncated
    * logs): their consume floor, resolved batched in `latestOffset` and
    * reused by `planInputPartitions` so planning re-lists nothing.
    */
  private val earliestFloor = mutable.Map.empty[(String, Int), Long]

  override def initialOffset(): Offset =
    if (startGroup) {
      // startingOffsets=group: begin from the offsets an ECOSYSTEM
      // consumer committed under `groupId` (OffsetFetch to the group's
      // coordinator — the migration path from any existing consumer:
      // point this source at the same group and it picks up exactly
      // where that consumer stopped). Partitions the group never
      // committed fall back to their log start.
      val g = groupId.getOrElse(throw new IllegalArgumentException(
        "startingOffsets=group requires the groupId option"))
      val ts0 = resolveTopics()
      client.prefetchLeaders(ts0)
      val tps = ts0.flatMap(t =>
        client.partitionLeaders(t).keys.toSeq.sorted.map(t -> _))
      val committed = client.fetchCommitted(g, tps)
      val uncommitted = tps.filterNot(committed.contains)
      KafkaPartitionOffsets(committed ++
        batchedOffsets(uncommitted, KafkaWire.TsEarliest))
    } else
      snapshot(if (startLatest) KafkaWire.TsLatest else KafkaWire.TsEarliest)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(start, limit)")

  override def getDefaultReadLimit: ReadLimit =
    maxOffsetsPerTrigger.map(n => ReadLimit.maxRows(n))
      .getOrElse(ReadLimit.allAvailable())

  /** Admission control — the consumer's backpressure (the source-side
    * bounded-channel analog): a per-trigger offset budget prorated by
    * each partition's LAG (end − from), so one trigger can never pull an
    * unbounded catch-up range (first start against a long-retained
    * topic, or recovery after downtime, would otherwise materialize the
    * whole backlog as one micro-batch) and a skewed backlog spends the
    * whole budget on the partitions that actually have data — an even
    * split wastes the caught-up partitions' shares and drains a hot
    * partition N× slower. Every lagging partition keeps a ≥1-offset
    * floor so proration can never starve a trickle partition behind one
    * huge backlog.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val latest = snapshot(KafkaWire.TsLatest)
    val lo = start.asInstanceOf[KafkaPartitionOffsets].positions
    // `start` is durably COMMITTED progress (the engine constructs batch
    // N only after batch N-1's commit log write), and this method fires
    // on every trigger tick including idle ones — so mirroring here
    // converges the broker-side lag view to 0 after the final batch,
    // where the engine's own commit(end) callback lags one batch (it
    // runs during the NEXT batch's cleanup). Deduped by lastMirrored.
    mirror(lo)
    // partitions absent from the start offset consume from the LOG
    // START, not 0: a retention-truncated log (or a pattern-matched
    // topic joining mid-stream with a truncated history) has
    // log-start > 0, and capping from a 0 floor could checkpoint an end
    // offset BELOW the real log start — subsequent fetches at an
    // out-of-range offset would then crash or stall the stream. One
    // extra batched round trip, only on triggers that see new partitions.
    val born = latest.positions.keys
      .filterNot(tp => lo.contains(tp) || earliestFloor.contains(tp)).toSeq
    earliestFloor ++= batchedOffsets(born, KafkaWire.TsEarliest)
    // partitions that left the subscription (pattern-matched topic
    // deleted/recreated) never come back under the same key — drop their
    // floors so the map tracks the LIVE subscription, not every
    // partition ever seen
    earliestFloor.filterInPlace((tp, _) => latest.positions.contains(tp))
    limit match {
      case r: ReadMaxRows =>
        val from = latest.positions.keys.map(tp =>
          tp -> lo.getOrElse(tp, earliestFloor.getOrElse(tp, 0L))).toMap
        val lag = latest.positions.map { case (tp, end) =>
          tp -> math.max(0L, end - from(tp)) }
        val totalLag = lag.values.sum
        if (totalLag <= r.maxRows()) latest
        else KafkaPartitionOffsets(latest.positions.map { case (tp, end) =>
          // integer proration floors each share; the ≥1 floor on lagging
          // partitions means the admitted total can exceed the budget by
          // at most #partitions − 1 — the same rounding slop the
          // ecosystem connector accepts
          val share =
            if (lag(tp) == 0L) 0L
            else math.max(1L,
              (r.maxRows().toDouble * lag(tp) / totalLag).toLong)
          tp -> math.min(end, from(tp) + share)
        })
      case _ => latest
    }
  }

  override def deserializeOffset(json: String): Offset =
    KafkaPartitionOffsets.parse(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[KafkaPartitionOffsets].positions
    val hi = end.asInstanceOf[KafkaPartitionOffsets].positions
    // a (topic, partition) first seen in the END snapshot (pattern match
    // on a topic born mid-stream) consumes from its LOG START — normally
    // already cached by latestOffset; the batched fallback covers
    // checkpoint recovery, where planInputPartitions replays a planned
    // batch without latestOffset having run in this incarnation
    val missing = hi.keys
      .filterNot(tp => lo.contains(tp) || earliestFloor.contains(tp)).toSeq
    earliestFloor ++= batchedOffsets(missing, KafkaWire.TsEarliest)
    hi.toSeq.sortBy { case ((t, p), _) => (t, p) }
      .flatMap { case ((t, p), endOff) =>
        val startOff = lo.getOrElse((t, p), earliestFloor((t, p)))
        if (endOff > startOff)
          Some(KafkaRangePartition(bootstrap, t, p, startOff, endOff,
            user, password, mechanism, tls, tlsTruststore,
            tlsTruststorePassword, readCommitted))
        else None
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new KafkaRangeReader(p.asInstanceOf[KafkaRangePartition])
    }

  /** The Spark checkpoint IS the consumer group — but with `groupId`
    * set, each completed batch's end offsets are additionally MIRRORED
    * to the broker (one batched OffsetCommit v2 to the coordinator, as a
    * standalone member). That makes progress visible to the ecosystem's
    * lag tooling (`kafka-consumer-groups --describe`, Burrow, exporter
    * dashboards) and lets an ecosystem consumer take over from the
    * mirrored position. The mirror is OBSERVABILITY, not correctness:
    * a failed commit logs a warning and the stream continues — the
    * checkpoint stays the source of truth, and the next trigger's
    * commit (freshly re-resolving a moved coordinator) self-heals the
    * lag view.
    */
  override def commit(end: Offset): Unit =
    mirror(end.asInstanceOf[KafkaPartitionOffsets].positions)

  /** Last offsets mirrored to the broker — the commit RPC fires only on
    * CHANGE, so an idle stream costs zero group-commit round trips.
    */
  private var lastMirrored: Map[(String, Int), Long] = Map.empty

  private def mirror(pos: Map[(String, Int), Long]): Unit =
    groupId.foreach { g =>
      if (pos.nonEmpty && pos != lastMirrored) {
        try { client.commitOffsets(g, pos); lastMirrored = pos }
        catch {
          case e: IOException =>
            client.invalidateCoordinator(g)
            log.warn("offset mirror commit failed; checkpoint remains " +
              "the source of truth", "group" -> g, "error" -> e.getMessage)
        }
      }
    }

  override def stop(): Unit = client.close()
}

/** Executor-side reader for one partition's (start, end) offset range:
  * its own connection to the partition leader, fetch-decode loop until
  * the range is exhausted.
  */
final class KafkaRangeReader(part: KafkaRangePartition)
    extends PartitionReader[InternalRow] {
  private val client = new KafkaClient(part.bootstrap,
    clientId = "graft-consumer", user = part.user, password = part.password,
    mechanism = part.mechanism, tls = part.tls,
    tlsTruststore = part.tlsTruststore,
    tlsTruststorePassword = part.tlsTruststorePassword)
  private var pos = part.startOffset
  private val queue = mutable.Queue.empty[KafkaWire.FetchedRecord]
  private var current: KafkaWire.FetchedRecord = _

  private def fill(): Unit = {
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (queue.isEmpty && pos < part.endOffset) {
      if (System.nanoTime() > deadline)
        throw new IOException(s"fetch stalled at ${part.topic}/" +
          s"${part.partition} offset $pos (end ${part.endOffset})")
      val leaders = client.partitionLeaders(part.topic)
      val hp = client.endpointOf(leaders(part.partition), part.topic)
      val id = client.nextCorr()
      val (err, _, _, abortedTxns, set) =
        KafkaWire.parseFetchV4Txn(client.roundTrip(hp,
          KafkaWire.fetchRequestV4(id, "graft-consumer", part.topic,
            part.partition, pos, maxWaitMs = 500,
            maxBytes = 4 * 1024 * 1024,
            isolation = if (part.readCommitted) 1 else 0),
          id))
      if (err != 0) {
        client.invalidate(part.topic)
        throw new IOException(
          s"fetch ${part.topic}/${part.partition}@$pos: error $err")
      }
      val batches = KafkaWire.decodeBatches(set)
      val decoded =
        if (part.readCommitted)
          KafkaWire.committedRecords(batches, abortedTxns)
        else batches.filter(_.control.isEmpty).flatMap(_.records)
      val recs = decoded
        .filter(r => r.offset >= pos && r.offset < part.endOffset)
      queue.enqueueAll(recs)
      // advance pos from the UNFILTERED batch set (control markers and
      // aborted-transaction batches included), capped at endOffset: a
      // range whose offsets no longer exist (log compaction / retention
      // removed them), or one holding only aborted data under
      // read_committed, yields zero surfaced records — advancing on the
      // surfaced set alone would spin to the 60 s deadline and
      // permanently fail the stream (replay hits the same gap). Capped
      // advance completes the planned range with zero rows instead.
      val before = pos
      if (batches.nonEmpty)
        pos = math.min(part.endOffset,
          math.max(pos, batches.map(_.lastOffset).max + 1))
      if (recs.isEmpty && pos == before) Thread.sleep(10)
    }
  }

  override def next(): Boolean = {
    if (queue.isEmpty) fill()
    if (queue.isEmpty) false
    else { current = queue.dequeue(); true }
  }

  override def get(): InternalRow = new GenericInternalRow(Array[Any](
    UTF8String.fromString(part.topic),
    part.partition,
    current.offset,
    if (current.key == null) null else UTF8String.fromBytes(current.key),
    if (current.value == null) null else UTF8String.fromBytes(current.value),
    current.timestampMs))

  override def close(): Unit = client.close()
}

/** DSv2 entry point:
  *
  *   spark.readStream.format("graft.sources.KafkaEnvelopeSource")
  *     .option("bootstrap", "host:9092")
  *     .option("topic", "cdc.db.public.users")      // one or comma-list, and/or
  *     .option("topicPattern", "cdc\\.db\\..*")     // regex over broker topics
  *     .option("startingOffsets", "earliest"|"latest"|"group") // default earliest
  *     .option("maxOffsetsPerTrigger", n)   // per-trigger admission cap
  *     .option("groupId", "graft-cdc")      // mirror commits to the broker
  *     .option("isolation", "read_committed") // default read_uncommitted
  *     .load()
  *
  * With `groupId` set, each completed micro-batch's end offsets are
  * mirrored to the broker under that consumer group (standalone-member
  * OffsetCommit) so ecosystem lag tooling sees the stream's progress;
  * `startingOffsets=group` starts a FRESH checkpoint from the group's
  * broker-committed offsets (the handover path from an ecosystem
  * consumer), falling back to each uncommitted partition's log start.
  *
  * `topicPattern` is the reference's wildcard-subject subscription
  * (consumers bind `cdc.db.>`): re-resolved against broker metadata
  * every trigger, so a topic born mid-stream (a newly replicated table)
  * joins the subscription and is consumed from its log's start.
  *
  * Emits (topic STRING, partition INT, offset LONG, key STRING,
  * value STRING, timestamp LONG) — the envelope JSON rides `value`;
  * [[graft.cdc.Transform.parseEnvelope]] turns it back into typed CDC
  * event columns for the consumer loops (`GRAFT_MODE=mv`/`scd2` with
  * `CDC_SOURCE=kafka` wires exactly that).
  */
class KafkaEnvelopeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaEnvelopeSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val bootstrap = Option(properties.get("bootstrap")).getOrElse(
      throw new IllegalArgumentException("bootstrap option is required"))
    val topics = Option(properties.get("topic")).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val pattern = Option(properties.get("topicPattern")).filter(_.nonEmpty)
    require(topics.nonEmpty || pattern.nonEmpty,
      "either topic or topicPattern is required")
    val topicLabel = (topics ++ pattern).mkString(",")
    val startingOffsets = properties.getOrDefault("startingOffsets", "earliest")
    val startLatest = "latest".equalsIgnoreCase(startingOffsets)
    val startGroup = "group".equalsIgnoreCase(startingOffsets)
    val groupId = Option(properties.get("groupId")).filter(_.nonEmpty)
    require(!startGroup || groupId.nonEmpty,
      "startingOffsets=group requires the groupId option")
    val user = Option(properties.get("user")).filter(_.nonEmpty)
    val pw = Option(properties.get("password")).filter(_.nonEmpty)
    val mech = properties.getOrDefault("mechanism", "PLAIN")
    val maxOffsets = Option(properties.get("maxOffsetsPerTrigger"))
      .map(_.toLong)
    val tls = "true".equalsIgnoreCase(properties.getOrDefault("tls", "false"))
    val tlsStore = Option(properties.get("tlsTruststore")).filter(_.nonEmpty)
    val tlsStorePw = Option(properties.get("tlsTruststorePassword"))
      .filter(_.nonEmpty)
    val isolation = properties.getOrDefault("isolation", "read_uncommitted")
    val readCommitted = "read_committed".equalsIgnoreCase(isolation)
    require(readCommitted || "read_uncommitted".equalsIgnoreCase(isolation),
      s"isolation must be read_uncommitted or read_committed, got $isolation")
    new Table with SupportsRead {
      override def name(): String = s"kafka:$topicLabel"
      override def schema(): StructType = KafkaEnvelopeSource.schema
      override def capabilities(): java.util.Set[TableCapability] =
        java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        new ScanBuilder {
          override def build(): Scan = new Scan {
            override def readSchema(): StructType = KafkaEnvelopeSource.schema
            override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
              new KafkaEnvelopeStream(bootstrap, topics, pattern, startLatest,
                user, pw, mech, maxOffsets, tls, tlsStore, tlsStorePw,
                groupId, startGroup, readCommitted)
          }
        }
    }
  }
}

object KafkaEnvelopeSource {
  val schema: StructType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("topic",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("partition",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("offset",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("key",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("value",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("timestamp",
      org.apache.spark.sql.types.LongType)))
}
