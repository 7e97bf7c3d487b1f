package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized dedup index for a GROWING corpus — the incremental path
  * SCALE.md prescribes: at 100 TB you do not re-shingle the whole corpus
  * per ingest batch; you build the shingle inverted index ONCE as a
  * bucketed table and check each new batch against it.
  *
  * Index layout (`build`):
  *  - `<name>`       : distinct (id, shingle), bucketed+sorted by shingle —
  *                     the new batch's shingle join needs no corpus-side
  *                     exchange (only the small new side shuffles into the
  *                     bucket layout);
  *  - `<name>_sizes` : (id, n) per-doc distinct-shingle counts, so exact
  *                     Jaccard needs no corpus re-aggregation.
  *
  * All hashing upstream is md5-derived (TextAnalysis.hash48), so an index
  * written by one engine/cluster remains valid for any other — the property
  * that makes incremental dedup auditable.
  */
object DedupIndex {

  /** Materialize the shingle index for `docs`. `buckets` sizes the layout:
    * at 100 TB pick buckets so each holds ~128-256 MB of shingle rows.
    */
  def build(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, name: String, n: Int = 3, buckets: Int = 8): Unit = {
    val sh = Dedup.shingles(docs, idCol, textCol, n)
    sh.write.mode("overwrite")
      .bucketBy(buckets, "shingle").sortBy("shingle").saveAsTable(name)
    // sizes ride the same shuffle shape as any per-doc aggregate; tiny table
    sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
      .write.mode("overwrite").saveAsTable(s"${name}_sizes")
  }

  /** Near-duplicate pairs between a NEW batch and the indexed corpus:
    * exact Jaccard >= threshold, computed as one shingle join against the
    * bucketed index + the stored size table. Returns
    * (new_id, old_id, inter, n_new, n_old, jaccard).
    *
    * Scale shape: the intersection join's corpus side is the bucketed
    * index (no exchange); only the new batch (small by definition of
    * incremental ingest) shuffles. `maxDf > 0` drops shingles whose
    * CORPUS document frequency exceeds it from the candidate/intersection
    * stage — the standard hot-shingle ("of the …") guard; it makes Jaccard
    * a lower-bound approximation, so leave 0 where exactness is required.
    */
  def incrementalNearDups(spark: SparkSession, newDocs: DataFrame,
      idCol: String, textCol: String, name: String, threshold: Double,
      n: Int = 3, maxDf: Long = 0L): DataFrame = {
    val newSh = Dedup.shingles(newDocs, idCol, textCol, n)
    val idx0 = spark.table(name)
    val idx = if (maxDf > 0) Dedup.dfCapped(idx0, maxDf) else idx0
    val newSizes = newSh.groupBy(col("id")).agg(count(lit(1)).as("n_new"))
      .withColumnRenamed("id", "new_id")
    val oldSizes = spark.table(s"${name}_sizes")
      .select(col("id").as("old_id"), col("n").as("n_old"))
    newSh.as("nw").join(idx.as("ix"), col("nw.shingle") === col("ix.shingle"))
      .groupBy(col("nw.id").as("new_id"), col("ix.id").as("old_id"))
      .agg(count(lit(1)).as("inter"))
      .join(newSizes, "new_id")
      .join(oldSizes, "old_id")
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_new") + col("n_old") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("old_id"), col("inter"), col("n_new"),
        col("n_old"), col("jaccard"))
  }

  /** Fold a verified new batch into the index (append both tables) — the
    * ingest loop's closing step. The append re-declares the bucket spec
    * (must match `build`'s) so the new files land in the same layout.
    */
  def append(spark: SparkSession, newDocs: DataFrame, idCol: String,
      textCol: String, name: String, n: Int = 3, buckets: Int = 8): Unit = {
    val sh = Dedup.shingles(newDocs, idCol, textCol, n)
    sh.write.mode("append")
      .bucketBy(buckets, "shingle").sortBy("shingle").saveAsTable(name)
    sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
      .write.mode("append").saveAsTable(s"${name}_sizes")
  }

  /** STREAMING index maintenance: keep the shingle index current from a
    * document stream — the ingest-pipeline shape where dedup state lives
    * in a queryable bucketed table instead of (only) the streaming
    * funnel's digest registry ([[graft.streaming.StreamingCuration]]).
    * Each micro-batch lands as its own `ingest_batch=<id>` partition of
    * the SAME bucketed layout [[build]] uses, so [[incrementalNearDups]]
    * keeps its zero-corpus-exchange join against the maintained table.
    *
    * Idempotence under foreachBatch's at-least-once contract: a replayed
    * batch first drops its own partition, then re-appends — the rewrite
    * is confined to `ingest_batch=<batchId>`, so a crash between write
    * and checkpoint commit replays to identical table contents (the MV
    * loop's per-bucket `v<batchId>` overwrite, in catalog-partition
    * form). Ids are expected unique across batches (ingest semantics —
    * re-sends of the same id should be deduped upstream by digest, e.g.
    * [[graft.streaming.StreamingCuration.dedupStream]]).
    */
  /** Recover a compaction that crashed between table swap steps: the
    * rebuilt `<t>_compacted` exists but `<t>` is gone → finish the
    * rename. Safe to call any time; no-op when nothing is pending.
    */
  private def recoverCompaction(spark: SparkSession, t: String): Unit =
    if (!spark.catalog.tableExists(t) &&
        spark.catalog.tableExists(s"${t}_compacted")) {
      spark.sql(s"ALTER TABLE ${t}_compacted RENAME TO $t")
      // the rename moves the directory but the catalog's per-partition
      // locations still point at the staged path — re-discover them
      spark.sql(s"MSCK REPAIR TABLE $t")
    }

  /** QUIESCED maintenance for the streamed index: fold the accumulated
    * per-batch `ingest_batch` partitions into one. [[startMaintenance]]
    * lands one partition per micro-batch — at ingest-pipeline batch
    * grains (seconds-to-minutes) that is fine for days, but unbounded it
    * is the same small-files scale-killer the SCD2 closed log compacts
    * away. Contents are immutable, so compaction is a pure rebuild into
    * a sibling table (same bucket spec — the zero-exchange join
    * property survives) followed by a drop+rename swap; the folded rows
    * land under `ingest_batch = -1` (never a real batch id, so a
    * replayed batch can never drop them). Run with the maintenance
    * stream STOPPED — the swap is not atomic against a concurrent
    * append; a crash between swap steps is healed by
    * [[recoverCompaction]] at the next compact() or maintenance batch.
    */
  def compact(spark: SparkSession, name: String, buckets: Int = 8): Unit = {
    Seq(name, s"${name}_sizes").foreach { t =>
      recoverCompaction(spark, t)
      require(spark.catalog.tableExists(t), s"no index table $t")
      val staged = s"${t}_compacted"
      spark.sql(s"DROP TABLE IF EXISTS $staged")
      val folded = spark.table(t).drop("ingest_batch")
        .withColumn("ingest_batch", lit(-1L))
      val w = folded.write.partitionBy("ingest_batch")
      (if (t == name) w.bucketBy(buckets, "shingle").sortBy("shingle") else w)
        .saveAsTable(staged)
      spark.sql(s"DROP TABLE $t")
      spark.sql(s"ALTER TABLE $staged RENAME TO $t")
      // rename moves the data dir; partition catalog entries still point
      // at the staged path — re-discover from the filesystem
      spark.sql(s"MSCK REPAIR TABLE $t")
      spark.catalog.refreshTable(t)
    }
  }

  def startMaintenance(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, name: String, checkpointPath: String, n: Int = 3,
      buckets: Int = 8,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val sh = Dedup.shingles(batch.toDF(), idCol, textCol, n)
          .withColumn("ingest_batch", lit(batchId))
        val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
          .withColumn("ingest_batch", lit(batchId))
        // each table decides create-vs-append for ITSELF: a crash between
        // the two creations must not wedge the replay (an ALTER on the
        // not-yet-created sizes table would fail every retry)
        def land(df: org.apache.spark.sql.DataFrame, table: String,
            bucketed: Boolean): Unit = {
          recoverCompaction(s, table) // heal a crashed offline compaction
          def writer(mode: String) = {
            val w = df.write.mode(mode).partitionBy("ingest_batch")
            if (bucketed) w.bucketBy(buckets, "shingle").sortBy("shingle") else w
          }
          if (!s.catalog.tableExists(table))
            writer("errorifexists").saveAsTable(table)
          else {
            // replay-idempotent: confine the rewrite to this batch's
            // partition
            s.sql(s"ALTER TABLE $table DROP IF EXISTS " +
              s"PARTITION (ingest_batch=$batchId)")
            writer("append").saveAsTable(table)
            // the drop+append invalidated cached file listings; refresh
            // BOTH sessions — `s` is foreachBatch's cloned session,
            // `spark` the caller's (whose readers hold the stale cache)
            s.catalog.refreshTable(table)
            spark.catalog.refreshTable(table)
          }
        }
        land(sh, name, bucketed = true)
        land(sizes, s"${name}_sizes", bucketed = false)
      }.start()
}
