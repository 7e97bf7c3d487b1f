package graft.streaming

import java.io.File

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.cdc.Apply

/** Incremental materialized view: maintain current table state from a CDC
  * stream (the consumer-side companion of [[CdcStream]] — what the
  * reference's JetStream subscribers do with the published events; SURVEY
  * E7 names Delta/Iceberg `MERGE` as the Spark analog, this is that loop
  * without the table format).
  *
  * State is BUCKETED by key hash (`b<bucket>/v<batchId>` per-bucket
  * version chains — the `ops/DedupIndex` layout): each micro-batch folds
  * via [[graft.cdc.Apply.applyChanges]] against ONLY the buckets its keys
  * touch and rewrites only those buckets' next versions. Untouched
  * buckets are never read or written, so the per-batch cost is
  * O(batch + table·k/N) for k touched of N buckets — never the O(table)
  * full-state rewrite (which at 100 TB is a rewrite-the-world-per-batch
  * scale-killer; the reference's consumers apply per-event and pay
  * per-change, this is the bucketed batch analog).
  *
  * Idempotence under foreachBatch's at-least-once contract is per
  * bucket: a replayed batch overwrites its own `v<batchId>` in exactly
  * the buckets it touches and re-reads each bucket's latest version
  * BELOW its id, so a crash between state write and checkpoint commit
  * replays to the identical result. Old bucket versions are pruned,
  * keeping `retainVersions` for readers in flight.
  *
  * [[startScd2]] additionally splits history the way validity intervals
  * want: CLOSED versions (valid_to set — immutable forever) append to a
  * `closed/v<batchId>` log and are never rewritten; OPEN versions (one
  * row per live key — small) live bucketed under `open/b<bucket>/`. A
  * batch closes open versions only in touched buckets and appends only
  * its own closed rows, so per-batch write volume is O(batch +
  * open-rows-in-touched-buckets) no matter how long history grows.
  *
  * Both folds are EXACT under the split: closed rows and untouched
  * buckets are fixed points of `scd2Apply`/`applyChanges` (a closed row
  * keeps its interval, an untouched key keeps its image), so restricting
  * the fold input to touched-open state changes nothing — the
  * incremental≡rebuild property (ApplySpec) carries over unchanged.
  */
object MaterializedView {

  // ---------- layout helpers ----------

  private def bucketOf(keyCols: Seq[String], buckets: Int): Column =
    pmod(hash(keyCols.map(col): _*), lit(buckets))

  /** Latest version id strictly below `below` inside one directory of
    * `v<id>` children (None = no version yet).
    */
  private def latestVersionIn(dir: File, below: Long): Option[Long] = {
    val vs = Option(dir.listFiles()).toSeq.flatten
      .map(_.getName).filter(_.matches("v\\d+")).map(_.drop(1).toLong)
      .filter(_ < below)
    if (vs.isEmpty) None else Some(vs.max)
  }

  private def bucketDirs(root: File): Seq[File] =
    Option(root.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.matches("b\\d+"))

  /** A version directory "has data" when it holds at least one part file
    * (a bucket whose keys were all deleted is a bare directory — it still
    * supersedes older versions but contributes no rows).
    */
  private def hasDataFiles(dir: File): Boolean =
    Option(dir.listFiles()).toSeq.flatten
      .exists(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))

  private def rm(f: File): Unit = {
    Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete(); ()
  }

  /** Record/validate the bucket count: the hash layout is only stable if
    * every (re)start folds with the SAME N.
    */
  private def pinBuckets(stateDir: String, buckets: Int): Unit = {
    val f = new File(stateDir, "_buckets")
    if (f.exists()) {
      val pinned = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim.toInt
      require(pinned == buckets,
        s"state at $stateDir was bucketed with N=$pinned, restart passed N=$buckets")
    } else {
      new File(stateDir).mkdirs()
      java.nio.file.Files.write(f.toPath, buckets.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      ()
    }
  }

  /** Write `df` (rows of touched buckets only) as the `v<batchId>` of each
    * touched bucket under `root/b<k>/`: one partitioned Spark job into a
    * staging dir, then per-bucket directory moves. A touched bucket with
    * zero surviving rows gets a bare version dir (supersedes, holds
    * nothing) — without it, deleted keys would resurrect from the
    * bucket's previous version.
    */
  private def writeBuckets(df: DataFrame, keyCols: Seq[String], buckets: Int,
      root: String, batchId: Long, touched: Seq[Int]): Unit = {
    val stage = s"$root/_stage_v$batchId"
    rm(new File(stage))
    df.withColumn("_mv_bucket", bucketOf(keyCols, buckets))
      .write.mode("overwrite").partitionBy("_mv_bucket").parquet(stage)
    touched.foreach { b =>
      val src = new File(s"$stage/_mv_bucket=$b")
      val dst = new File(s"$root/b$b/v$batchId")
      rm(dst)
      dst.getParentFile.mkdirs()
      if (src.isDirectory) {
        java.nio.file.Files.move(src.toPath, dst.toPath)
        ()
      } else dst.mkdirs() // all of the bucket's keys were deleted
    }
    rm(new File(stage))
  }

  /** Union-read one parquet frame from `paths`, falling back to an empty
    * (keys..., image) frame when nothing has data yet.
    */
  private def readState(spark: SparkSession, paths: Seq[File],
      keyCols: Seq[String]): DataFrame = {
    val withData = paths.filter(hasDataFiles).map(_.toString)
    if (withData.nonEmpty) spark.read.parquet(withData: _*)
    else {
      val schema = org.apache.spark.sql.types.StructType(
        keyCols.map(k => org.apache.spark.sql.types.StructField(k,
          org.apache.spark.sql.types.StringType)) :+
        org.apache.spark.sql.types.StructField("image",
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  /** Per bucket keep the newest `retain` versions (replay only ever
    * revisits the newest uncommitted batch, so retained versions always
    * cover the re-read).
    */
  private def pruneBuckets(root: File, retain: Int): Unit =
    bucketDirs(root).foreach { b =>
      Option(b.listFiles()).toSeq.flatten
        .filter(f => f.getName.matches("v\\d+"))
        .sortBy(-_.getName.drop(1).toLong).drop(retain)
        .foreach(rm)
    }

  // ---------- readers ----------

  /** Read the current materialized state (MV layout: each bucket's latest
    * version below `below`; SCD2 layout: additionally the full closed
    * log). Empty frame with (keys..., image) schema when no state exists.
    */
  def currentState(spark: SparkSession, stateDir: String,
      keyCols: Seq[String], below: Long = Long.MaxValue): DataFrame = {
    val root = new File(stateDir)
    val closed = Option(new File(root, "closed").listFiles()).toSeq.flatten
      .filter(f => f.getName.matches("v\\d+") && f.getName.drop(1).toLong < below)
    val openRoot =
      if (new File(root, "open").isDirectory) new File(root, "open") else root
    val latest = bucketDirs(openRoot).flatMap { b =>
      latestVersionIn(b, below).map(v => new File(b, s"v$v"))
    }
    readState(spark, closed ++ latest, keyCols)
  }

  // ---------- maintenance loops ----------

  /** Start maintaining the view. `events` is a streaming frame of
    * normalized CdcEvents ([[graft.cdc.Transform.normalize]] columns);
    * keys are extracted from the row image (`after`, falling back to
    * `before` for DELETEs) by name. `seq` supplies the WAL order used to
    * pick each key's winner within a batch (e.g. a numeric wal position
    * carried through the pipeline, or `txid` when transactions are the
    * batch grain). `buckets` sizes the state layout (pinned at first
    * start): at 100 TB pick N so one bucket holds ~128-256 MB.
    */
  def start(spark: SparkSession, events: DataFrame, stateDir: String,
      checkpointPath: String, keyCols: Seq[String], seq: Column,
      retainVersions: Int = 2, buckets: Int = 8,
      trigger: Trigger = Trigger.ProcessingTime("100 milliseconds")): StreamingQuery = {
    require(keyCols.nonEmpty, "keyCols must name the view key")
    // a replayed batch re-reads each touched bucket's version BELOW its
    // own — with only 1 retained version, pruning after the crashed
    // attempt would have deleted exactly that version (silent data loss)
    require(retainVersions >= 2, "retainVersions must be >= 2 to cover replay")
    pinBuckets(stateDir, buckets)
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val keyed = keyCols.foldLeft(batch.toDF()) { (df, k) =>
          df.withColumn(k, coalesce(element_at(col("after"), k),
            element_at(col("before"), k)))
        }.withColumn("_mv_seq", seq)
          .withColumn("_mv_bucket", bucketOf(keyCols, buckets))
        // driver-side by design and bounded by N buckets (≤ N ints — the
        // path-pruning decision, like a partition-pruning predicate)
        val touched = keyed.select(col("_mv_bucket")).distinct()
          .collect().map(_.getInt(0)).sorted.toSeq
        if (touched.nonEmpty) {
          val root = new File(stateDir)
          val basePaths = touched.flatMap { b =>
            latestVersionIn(new File(root, s"b$b"), below = batchId)
              .map(v => new File(root, s"b$b/v$v"))
          }
          val base = readState(spark, basePaths, keyCols)
          val folded = Apply.applyChanges(base, col("image"),
            keyed.drop("_mv_bucket"), col("after"), col("_mv_seq"), keyCols)
          writeBuckets(folded, keyCols, buckets, stateDir, batchId, touched)
          pruneBuckets(root, retainVersions)
        }
      }.start()
  }

  /** Maintain an SCD Type-2 HISTORY table from the CDC stream instead of
    * current state: closed versions (immutable) append to `closed/
    * v<batchId>`; open versions fold bucketed exactly like [[start]],
    * via [[graft.cdc.Apply.scd2Apply]] restricted to the touched
    * buckets' open rows (first batch for a bucket: [[graft.cdc.Apply
    * .scd2]] over the batch alone — same function, empty history).
    * `seq` must be a monotone WAL-order column (e.g. numeric LSN);
    * validity bounds are expressed in it.
    */
  def startScd2(spark: SparkSession, events: DataFrame, stateDir: String,
      checkpointPath: String, keyCols: Seq[String], seq: Column,
      retainVersions: Int = 2, buckets: Int = 8,
      trigger: Trigger = Trigger.ProcessingTime("100 milliseconds")): StreamingQuery = {
    require(keyCols.nonEmpty, "keyCols must name the history key")
    // same replay-coverage bound as start()
    require(retainVersions >= 2, "retainVersions must be >= 2 to cover replay")
    pinBuckets(stateDir, buckets)
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val keyed = keyCols.foldLeft(batch.toDF()) { (df, k) =>
          df.withColumn(k, coalesce(element_at(col("after"), k),
            element_at(col("before"), k)))
        }.withColumn("_mv_seq", seq)
          .withColumn("_mv_bucket", bucketOf(keyCols, buckets))
        // bounded by N buckets, driver-side by design (path pruning)
        val touched = keyed.select(col("_mv_bucket")).distinct()
          .collect().map(_.getInt(0)).sorted.toSeq
        if (touched.nonEmpty) {
          val root = new File(stateDir)
          val openRoot = new File(root, "open")
          val openPaths = touched.flatMap { b =>
            latestVersionIn(new File(openRoot, s"b$b"), below = batchId)
              .map(v => new File(openRoot, s"b$b/v$v"))
          }
          val changes = keyed.drop("_mv_bucket")
          val folded = (if (openPaths.nonEmpty)
            Apply.scd2Apply(spark.read.parquet(openPaths.map(_.toString): _*),
              changes, keyCols, col("operation"), col("_mv_seq"), col("after"))
          else
            Apply.scd2(changes, keyCols, col("operation"), col("_mv_seq"),
              col("after"))).cache()
          try {
            // newly closed versions: immutable from here on — append-only
            val closedDst = new File(root, s"closed/v$batchId")
            rm(closedDst); closedDst.getParentFile.mkdirs()
            folded.filter(!col("is_current"))
              .write.mode("overwrite").parquet(closedDst.toString)
            // open versions: small, rewritten only for touched buckets
            writeBuckets(folded.filter(col("is_current")), keyCols, buckets,
              openRoot.toString, batchId, touched)
            pruneBuckets(openRoot, retainVersions)
          } finally { folded.unpersist(); () }
        }
      }.start()
  }
}
