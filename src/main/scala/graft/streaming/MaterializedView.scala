package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.cdc.Apply

/** Incremental materialized view: maintain current table state from a CDC
  * stream (the consumer-side companion of [[CdcStream]] — what the
  * reference's JetStream subscribers do with the published events; SURVEY
  * E7 names Delta/Iceberg `MERGE` as the Spark analog, this is that loop
  * without the table format).
  *
  * Each micro-batch folds onto the latest state VERSION via
  * [[graft.cdc.Apply.applyChanges]] and writes `v<batchId>`; because a
  * replayed batch (crash between state write and checkpoint commit)
  * overwrites its own version and re-reads the version BELOW its id, the
  * maintenance is idempotent under foreachBatch's at-least-once contract.
  * Old versions are pruned, keeping `retainVersions` for readers in
  * flight.
  *
  * Scale shape: per batch, one ranking window over the (small) batch and
  * one key-partitioned join against the previous state. At 100 TB the
  * state write is the cost driver — write it bucketed by the key (see
  * `ops/DedupIndex`) so the next batch's join reads co-located and only
  * the batch shuffles.
  */
object MaterializedView {

  /** Latest state version strictly below `below` (None = empty state). */
  def latestVersion(stateDir: String, below: Long = Long.MaxValue): Option[Long] = {
    val vs = Option(new java.io.File(stateDir).listFiles()).toSeq.flatten
      .map(_.getName).filter(_.matches("v\\d+")).map(_.drop(1).toLong)
      .filter(_ < below)
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Read the current materialized state (empty frame with (keys..., image)
    * schema when no version exists yet).
    */
  def currentState(spark: SparkSession, stateDir: String,
      keyCols: Seq[String], below: Long = Long.MaxValue): DataFrame =
    latestVersion(stateDir, below) match {
      case Some(v) => spark.read.parquet(s"$stateDir/v$v")
      case None =>
        val schema = org.apache.spark.sql.types.StructType(
          keyCols.map(k => org.apache.spark.sql.types.StructField(k,
            org.apache.spark.sql.types.StringType)) :+
          org.apache.spark.sql.types.StructField("image",
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.StringType)))
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** Maintain an SCD Type-2 HISTORY table from the CDC stream instead of
    * current state: same versioned-state idempotence scheme as [[start]],
    * but each micro-batch folds via [[graft.cdc.Apply.scd2Apply]] (first
    * batch: [[graft.cdc.Apply.scd2]]), so every change becomes a
    * versioned row with a validity interval — intra-batch versions
    * preserved. `seq` must be a monotone WAL-order column (e.g. numeric
    * LSN); validity bounds are expressed in it. Scale shape per batch:
    * one lead() window over the batch + one key join against the prior
    * history version (bucket it) + append.
    */
  def startScd2(spark: SparkSession, events: DataFrame, stateDir: String,
      checkpointPath: String, keyCols: Seq[String],
      seq: org.apache.spark.sql.Column, retainVersions: Int = 2,
      trigger: Trigger = Trigger.ProcessingTime("100 milliseconds")): StreamingQuery = {
    require(keyCols.nonEmpty, "keyCols must name the history key")
    new java.io.File(stateDir).mkdirs()
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val keyed = keyCols.foldLeft(batch.toDF()) { (df, k) =>
          df.withColumn(k, coalesce(element_at(col("after"), k),
            element_at(col("before"), k)))
        }.withColumn("_mv_seq", seq)
        val hist = latestVersion(stateDir, below = batchId) match {
          case Some(v) => Apply.scd2Apply(
            spark.read.parquet(s"$stateDir/v$v"), keyed, keyCols,
            col("operation"), col("_mv_seq"), col("after"))
          case None => Apply.scd2(keyed, keyCols,
            col("operation"), col("_mv_seq"), col("after"))
        }
        hist.write.mode("overwrite").parquet(s"$stateDir/v$batchId")
        pruneVersions(stateDir, retainVersions)
      }.start()
  }

  private def pruneVersions(stateDir: String, retainVersions: Int): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete(); ()
    }
    Option(new java.io.File(stateDir).listFiles()).toSeq.flatten
      .filter(f => f.getName.matches("v\\d+"))
      .sortBy(-_.getName.drop(1).toLong).drop(retainVersions)
      .foreach(rm)
  }

  /** Start maintaining the view. `events` is a streaming frame of
    * normalized CdcEvents ([[graft.cdc.Transform.normalize]] columns);
    * keys are extracted from the row image (`after`, falling back to
    * `before` for DELETEs) by name. `seq` supplies the WAL order used to
    * pick each key's winner within a batch (e.g. a numeric wal position
    * carried through the pipeline, or `txid` when transactions are the
    * batch grain).
    */
  def start(spark: SparkSession, events: DataFrame, stateDir: String,
      checkpointPath: String, keyCols: Seq[String], seq: org.apache.spark.sql.Column,
      retainVersions: Int = 2,
      trigger: Trigger = Trigger.ProcessingTime("100 milliseconds")): StreamingQuery = {
    require(keyCols.nonEmpty, "keyCols must name the view key")
    new java.io.File(stateDir).mkdirs()
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val keyed = keyCols.foldLeft(batch.toDF()) { (df, k) =>
          df.withColumn(k, coalesce(element_at(col("after"), k),
            element_at(col("before"), k)))
        }.withColumn("_mv_seq", seq)
        val base = currentState(spark, stateDir, keyCols, below = batchId)
        Apply.applyChanges(base, col("image"), keyed, col("after"),
            col("_mv_seq"), keyCols)
          .write.mode("overwrite").parquet(s"$stateDir/v$batchId")
        // prune old versions, keep the newest `retainVersions` (replay
        // only ever revisits the newest uncommitted batch, so retained
        // versions always cover the re-read)
        pruneVersions(stateDir, retainVersions)
      }.start()
  }
}
