package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.cdc.Transform

/** Kafka producer-record shape for the CDC sink (reference E6: the
  * JetStream publisher, internal/publisher/jetstream.go; SURVEY §2.1 E6
  * maps it to `writeStream.format("kafka")`).
  *
  * There is no broker in this environment, so the *testable* surface is
  * the mapping and the producer configuration, both of which carry the
  * reference's delivery semantics:
  *
  *  - topic = the routed subject (`cdc.db.schema.table` with dots — legal
  *    Kafka topic characters), so per-table streams are separable;
  *  - key = the subject, putting every event of one table on one
  *    partition — Kafka's per-partition order then gives exactly the E2
  *    per-subject commit-order guarantee;
  *  - value = the JSON envelope ([[Transform.envelopeJson]]);
  *  - the `event_id` header carries the idempotency key the reference
  *    sets as Nats-Msg-Id (E7) for consumer-side dedup.
  *
  * `producerOptions` encodes E2 vs E3 as producer config: ordered =
  * idempotent producer with one in-flight request (no reorder on retry);
  * unordered = five in-flight (the throughput mode, order not preserved
  * across retries — exactly `UNSAFE_UNORDERED_ASYNC_PUBLISH`).
  */
object KafkaSinkShape {

  /** Normalized events -> (topic, key, value, headers) producer records. */
  def toProducerRecords(events: DataFrame): DataFrame =
    events.select(
      col("subject").as("topic"),
      col("subject").cast("binary").as("key"),
      Transform.envelopeJson(events).cast("binary").as("value"),
      array(struct(lit("event_id").as("key"),
        col("event_id").cast("binary").as("value"))).as("headers"))

  /** Producer options for `.writeStream.format("kafka")`, keyed by publish
    * mode (reference config `UNSAFE_UNORDERED_ASYNC_PUBLISH`,
    * `MAX_PUBLISH_RETRIES`).
    */
  def producerOptions(bootstrapServers: String, ordered: Boolean,
      maxRetries: Int = 3): Map[String, String] = {
    val base = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "kafka.enable.idempotence" -> "true",
      "kafka.acks" -> "all",
      "kafka.retries" -> maxRetries.toString)
    if (ordered) base + ("kafka.max.in.flight.requests.per.connection" -> "1")
    else base + ("kafka.max.in.flight.requests.per.connection" -> "5")
  }
}
