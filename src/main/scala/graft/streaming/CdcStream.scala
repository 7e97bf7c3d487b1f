package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.cdc.{Transform, Wal2Json}

/** The streaming CDC pipeline (SURVEY.md §3.4):
  *
  * readStream (wal2json lines) -> Wal2Json.decode -> StreamingTxAssembly ->
  * Transform.normalize -> dropDuplicatesWithinWatermark(event_id) ->
  * foreachBatch OrderedSink, with checkpointLocation for recovery.
  *
  * Semantics vs the reference (SURVEY.md §7.4):
  *  - at-least-once base + deterministic event_id dedup = effectively-once
  *    (reference E7, DUPLICATE_WINDOW); here the window is the watermark
  *    delay on commit_time.
  *  - order preserved per subject (db.schema.table), the reference's E2
  *    guarantee; global order only with one partition — the analog of its
  *    explicitly-unsafe unordered mode (E3).
  *  - checkpointLocation replaces the replication-slot store (C1/C2): a
  *    restarted query resumes from the last committed micro-batch offset.
  */
object CdcStream {

  /** Decode + assemble + normalize a streaming DataFrame of
    * (wal_start: long, data: string) wal2json lines.
    */
  def pipeline(spark: SparkSession, raw: DataFrame, database: String,
      tableAllowlist: Seq[String] = Nil, dedupWatermark: String = "2 minutes",
      txTtl: Option[String] = None): DataFrame = {
    val decoded = Wal2Json.filterTables(Wal2Json.decode(raw), tableAllowlist)
    val sequenced = StreamingTxAssembly.assemble(spark, decoded, txTtl).toDF()
      .withColumn("is_begin", lit(false))
      .withColumn("is_commit", lit(false))
    Transform.normalize(sequenced, database)
      .withWatermark("commit_time", dedupWatermark)
      .dropDuplicatesWithinWatermark("event_id")
  }

  /** Start the pipeline into an ordered parquet sink with checkpointed
    * recovery. `trigger` mirrors the reference's BATCH_TIMEOUT micro-batch
    * cadence (E1).
    */
  def start(spark: SparkSession, raw: DataFrame, database: String,
      outPath: String, checkpointPath: String,
      tableAllowlist: Seq[String] = Nil,
      trigger: Trigger = Trigger.ProcessingTime("100 milliseconds")): StreamingQuery = {
    val events = pipeline(spark, raw, database, tableAllowlist)
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // E4: transient sink failures retried with capped backoff; fatal
        // errors propagate and fail the batch (at-least-once redelivery +
        // the sink's batch_id idempotence make the retry safe).
        Reliability.withRetry()(() => OrderedSink.writeBatch(batch.toDF(), batchId, outPath))
      }
      .start()
  }
}
