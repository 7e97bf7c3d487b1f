package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered, idempotent batch sink (reference E2/E6:
  * internal/engine/engine.go:447-534, internal/publisher/jetstream.go).
  *
  * The reference serializes publishes per subject and acks one-by-one to
  * preserve CDC order through retries. The Spark restatement:
  *  - repartition by `subject` so each subject's events land in a single
  *    task (per-key order is preservable; global order would need one
  *    partition — the documented trade-off, SURVEY.md §7.4.1);
  *  - sortWithinPartitions (subject, lsn, seq-bearing event_id) so rows are
  *    written in commit order per subject;
  *  - write under `batch_id=<id>` with overwrite: re-running a failed
  *    micro-batch (at-least-once redelivery) replaces rather than appends —
  *    the sink-side idempotence the reference gets from Nats-Msg-Id dedup
  *    (E7). A Kafka-backed deployment would instead use the idempotent
  *    producer with max.in.flight=1 per partition.
  */
object OrderedSink {

  import org.apache.spark.sql.Column

  /** Numeric WAL position from the canonical `X/Y` lower-hex rendering.
    * Sorting on the hex STRING is not numeric order for variable-width hex
    * ('2' > '10' lexicographically), so within a transaction (equal
    * commit_time) rows could be written out of WAL order whenever the hex
    * digit count changes. Decoding back to the 64-bit position restores
    * true commit order without widening the normalize schema.
    */
  private[graft] def lsnNumeric(lsn: Column): Column =
    conv(split(lsn, "/").getItem(0), 16, 10).cast("long") * lit(4294967296L) +
      conv(split(lsn, "/").getItem(1), 16, 10).cast("long")

  /** seq_in_tx from the event-id tail (`lsn:txid:op:schema.table:seq`) —
    * decimal, so the string form of the id does not sort numerically either.
    */
  private[graft] def seqNumeric(eventId: Column): Column =
    element_at(split(eventId, ":"), -1).cast("long")

  def writeBatch(batch: DataFrame, batchId: Long, outPath: String,
      numPartitions: Int = 0): Unit = {
    val parts = if (numPartitions > 0) numPartitions
      else batch.sparkSession.sessionState.conf.numShufflePartitions
    batch
      .repartition(parts, col("subject"))
      .sortWithinPartitions(col("subject"), col("commit_time"),
        lsnNumeric(col("lsn")), seqNumeric(col("event_id")))
      .write.mode("overwrite")
      .parquet(s"$outPath/batch_id=$batchId")
  }
}

/** Explicitly-unsafe unordered publish (reference E3:
  * `UNSAFE_UNORDERED_ASYNC_PUBLISH`, internal/engine/engine.go:539-661).
  *
  * The reference's unordered path publishes the whole batch async and
  * retries ONLY the failed items, so later events can commit before
  * earlier failed ones — maximum throughput, no order guarantee. The
  * Spark restatement drops the subject repartition and the in-partition
  * sort entirely: every input partition writes concurrently with no
  * shuffle, and Spark's task-level retry re-executes only failed
  * partitions (the retry-only-failed semantics at partition granularity)
  * while the parquet job commit keeps redelivered batches idempotent via
  * the `batch_id=` overwrite. Opt-in only — [[CdcStream.start]] selects it
  * from the same config flag name the reference uses.
  */
object UnorderedSink {

  def writeBatch(batch: DataFrame, batchId: Long, outPath: String): Unit =
    batch.write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
}
