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

  // ---------- size-tiered compaction (manifest-protocol folds) ----------

  /** Partition ids present in `t` (`ingest_batch` values). */
  private def partitionIds(spark: SparkSession, t: String): Seq[Long] =
    spark.sql(s"SHOW PARTITIONS $t").collect()
      .map(_.getString(0).split("=")(1).toLong).toSeq

  private def tableProps(spark: SparkSession, t: String): Map[String, String] =
    spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(t)).properties

  private def setProps(spark: SparkSession, t: String,
      kv: Seq[(String, String)]): Unit =
    if (kv.nonEmpty) {
      val body = kv.map { case (k, v) => s"'$k'='$v'" }.mkString(", ")
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ($body)")
      ()
    }

  /** The compaction horizon: every batch id ≤ it has been folded into a
    * negative partition (and [[landBatch]] consults the stored per-batch
    * fingerprints before re-landing such an id).
    */
  def compactionHorizon(spark: SparkSession, t: String): Option[Long] =
    tableProps(spark, t).get("graft.compaction_horizon").map(_.toLong)

  /** Span (number of original per-batch partitions transitively folded)
    * of negative partition `id` — 1 when unrecorded (legacy folds).
    */
  private def spanOf(props: Map[String, String], id: Long): Long =
    props.getOrElse(s"graft.fold.span.$id", "1").toLong

  /** A fold's size tier = floor(log_fanout span) — [[compact]] merges
    * only ≥ `fanout` SAME-tier partitions, into a strictly higher tier
    * (the [[graft.streaming.MaterializedView]] closed-log rule in
    * catalog-partition form), so no fold is ever re-folded with fresh
    * arrivals: each row is rewritten ≤ once per tier, O(log M) ever.
    */
  private def tierOf(span: Long, fanout: Int): Int = {
    var t = 0; var s = span
    while (s >= fanout) { s /= fanout; t += 1 }
    t
  }

  /** Order-insensitive fingerprint of a frame: (row count, bit_xor of
    * xxhash64 over all columns — commutative and overflow-free under
    * ANSI arithmetic, unlike a sum) — what [[landBatch]] compares
    * against the fold-time value to tell a true crash REPLAY of a
    * folded batch (identical rows → skip) from a fresh-checkpoint batch
    * that merely reuses the id (different rows → land).
    */
  private def fingerprint(df: DataFrame): String = {
    val cols = df.columns.sorted.map(col)
    val r = df.agg(count(lit(1)),
      coalesce(bit_xor(xxhash64(cols: _*)), lit(0L))).head()
    s"${r.getLong(0)}:${r.getLong(1)}"
  }

  private[graft] def manifestPath(spark: SparkSession, t: String)
      : org.apache.hadoop.fs.Path = {
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t)).location)
    new org.apache.hadoop.fs.Path(loc, "_graft_fold.json")
  }

  private val manifestRe =
    """\{"dest":(-\d+),"span":(\d+),"horizon":(-?\d+),"sources":\[([-\d,]*)\]\}""".r

  private[graft] def readManifest(spark: SparkSession, t: String)
      : Option[(Long, Long, Long, Seq[Long])] = {
    val p = manifestPath(spark, t)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      s.trim match {
        case manifestRe(dest, span, hor, srcs) =>
          Some((dest.toLong, span.toLong, hor.toLong,
            srcs.split(",").filter(_.nonEmpty).map(_.toLong).toSeq))
        case _ => None // unreadable: treat as absent (crash mid-create)
      }
    }
  }

  private[graft] def writeManifest(spark: SparkSession, t: String, dest: Long,
      span: Long, horizon: Long, sources: Seq[Long]): Unit = {
    val p = manifestPath(spark, t)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(p.getParent, "._graft_fold.tmp")
    val out = fs.create(tmp, true)
    try out.write(
      s"""{"dest":$dest,"span":$span,"horizon":$horizon,"sources":[${sources.mkString(",")}]}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(p, false)
    fs.rename(tmp, p)
    ()
  }

  private def deleteManifest(spark: SparkSession, t: String): Unit = {
    val p = manifestPath(spark, t)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, false)
    ()
  }

  /** Execute (or re-execute — every step is idempotent) a fold described
    * by its manifest: rewrite dest from the sources, record span +
    * horizon + per-batch fingerprints, drop the sources, drop the
    * manifest. The write step reuses [[landBatch]]'s drop-own-partition+
    * append shape, so a crash mid-write heals on redo exactly like a
    * replayed batch.
    */
  /** Per-table fold mutex. A fold executes in exactly one thread at a
    * time: [[landBatch]] (the maintenance stream's foreachBatch thread)
    * heals pending manifests via [[recoverFold]], and an out-of-band
    * [[compact]] writes + executes them — unserialized, both threads can
    * pick up the SAME manifest and run the SAME fold concurrently, and
    * interleaved DROP-dest + append from two writers double-appends the
    * fold's rows (silently inflating shingle counts). The lock makes
    * manifest-write → fold → manifest-delete atomic per table within
    * this JVM — the deployment shape, since compact() runs on the same
    * driver as the stream it maintains; two separate DRIVERS maintaining
    * one index still require quiescing one of them.
    */
  private val foldLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def foldLock(t: String): Object =
    foldLocks.computeIfAbsent(t, _ => new Object)

  private def runFold(spark: SparkSession, t: String, bucketed: Boolean,
      buckets: Int, dest: Long, span: Long, horizon: Long,
      sources: Seq[Long], bucketCol: String,
      foldAgg: DataFrame => DataFrame = identity): Unit = {
    val present = partitionIds(spark, t).toSet
    val live = sources.filter(present)
    if (live.size == sources.size) {
      // nothing dropped yet -> (re)write dest wholesale from the sources
      // (fold-time fingerprints first: they read the SAME source scan)
      val fps =
        if (horizon == Long.MinValue) Seq.empty
        else sources.map(b => s"graft.fold.fp.$b" -> fingerprint(
          spark.table(t).where(col("ingest_batch") === b)
            .drop("ingest_batch")))
      val folded = foldAgg(spark.table(t)
        .where(col("ingest_batch").isin(sources: _*))
        .drop("ingest_batch")).withColumn("ingest_batch", lit(dest))
      spark.sql(s"ALTER TABLE $t DROP IF EXISTS " +
        s"PARTITION (ingest_batch=$dest)")
      val w = folded.write.mode("append").partitionBy("ingest_batch")
      (if (bucketed) w.bucketBy(buckets, bucketCol).sortBy(bucketCol) else w)
        .saveAsTable(t)
      setProps(spark, t, fps ++ Seq(s"graft.fold.span.$dest" -> span.toString) ++
        (if (horizon == Long.MinValue) Seq.empty
         else Seq("graft.compaction_horizon" ->
           math.max(horizon, compactionHorizon(spark, t)
             .getOrElse(Long.MinValue)).toString)))
    }
    // dest is complete from here (sources are only dropped after the
    // write + props landed) — finish the drops whatever subset remains
    live.foreach(b => spark.sql(
      s"ALTER TABLE $t DROP IF EXISTS PARTITION (ingest_batch=$b)"))
    deleteManifest(spark, t)
    spark.catalog.refreshTable(t)
  }

  /** Heal a fold that crashed between manifest write and manifest
    * delete. Safe to call any time; no-op without a pending manifest.
    * Holds the table's [[foldLock]]: the manifest is re-read INSIDE the
    * lock, so a fold another thread just completed (and whose manifest
    * it deleted) is never re-executed.
    */
  private def recoverFold(spark: SparkSession, t: String, bucketed: Boolean,
      buckets: Int, bucketCol: String = "shingle",
      foldAgg: DataFrame => DataFrame = identity): Unit =
    foldLock(t).synchronized {
      readManifest(spark, t).foreach { case (dest, span, hor, srcs) =>
        runFold(spark, t, bucketed, buckets, dest, span, hor, srcs, bucketCol,
          foldAgg)
      }
    }

  /** SIZE-TIERED maintenance for the streamed index — fold accumulated
    * `ingest_batch` partitions without ever rewriting a prior fold's
    * rows alongside fresh arrivals. [[startMaintenance]] lands one
    * partition per micro-batch; unbounded that is the small-files
    * scale-killer, but the r7 answer (fold EVERYTHING into one
    * partition per call) made the Nth compaction rewrite the whole
    * index — O(N·index) cumulative I/O. Now each call:
    *
    *  1. folds the current per-batch partitions (ids ≥ 0) into ONE new
    *     negative partition (ids −1, −2, … — never a real batch id, so
    *     a replayed batch can never drop them), leaving every previous
    *     fold untouched;
    *  2. merges ≥ `tierFanout` negative partitions of the SAME size
    *     tier (floor(log_fanout span)) into one of a strictly higher
    *     tier — the LSM rule: each row is rewritten at most once per
    *     tier, O(log batches) ever, and the partition count stays
    *     ≤ fanout per tier.
    *
    * Crash-safety is a per-fold MANIFEST at the table location: written
    * atomically before the fold, deleted after the source-partition
    * drops; every step between is idempotent, and recovery (next
    * compact() or maintenance batch) re-runs the fold if all sources
    * survive or finishes the drops if any is gone (sources are only
    * dropped once the fold partition + properties are complete).
    *
    * Replay duplication (the r7 flaw): a maintenance stream killed
    * after landing batch N but before its checkpoint commit would
    * re-land N after a compact() had folded it — rows in both the fold
    * and the fresh partition. compact() therefore records a per-batch
    * FINGERPRINT at fold time and [[landBatch]] skips a batch id ≤ the
    * horizon whose rows fingerprint identically (a true replay); a
    * fresh-checkpoint batch that merely reuses the id lands normally.
    * Safe to run with the maintenance stream live — folds touch only
    * partitions whose batches are fully landed (never an id the stream
    * could still be writing, since ids are monotone per checkpoint).
    */
  def compact(spark: SparkSession, name: String, buckets: Int = 8,
      tierFanout: Int = 8): Unit = {
    compactTable(spark, name, bucketed = true, "shingle", buckets, tierFanout)
    compactTable(spark, s"${name}_sizes", bucketed = false, "shingle",
      buckets, tierFanout)
  }

  /** The size-tiered fold loop for ONE `ingest_batch`-partitioned table —
    * the machinery behind [[compact]], generalized over the bucket column
    * so other maintained bucketed indexes (e.g. the cell-bucketed ANN
    * index, [[Similarity.compactIvfPqIndex]]) reuse the identical
    * manifest-crash-safe, fingerprint-guarded lifecycle.
    */
  /** `foldAgg` (optional): a row-compression step applied to the fold's
    * source rows — e.g. a cube's sketch-union rollup, so folding merges
    * per-batch partials instead of concatenating them. It must be a pure
    * semantic no-op for the table's serve path (serve results identical
    * whether or not any fold applied it): a crashed fold healed by the
    * maintenance stream's own landBatch recovery runs WITHOUT it (the
    * manifest does not record transforms), which is then correct but
    * uncompressed until the next compact call.
    */
  private[graft] def compactTable(spark: SparkSession, t: String,
      bucketed: Boolean, bucketCol: String, buckets: Int,
      tierFanout: Int, foldAgg: DataFrame => DataFrame = identity): Unit = {
    require(tierFanout >= 2, "tierFanout must be >= 2")
    recoverCompaction(spark, t) // heal a legacy (r7 swap-style) crash
    require(spark.catalog.tableExists(t), s"no index table $t")
    recoverFold(spark, t, bucketed, buckets, bucketCol, foldAgg)
    def nextDest: Long =
      (partitionIds(spark, t).filter(_ < 0L) :+ 0L).min - 1L
    // tier 0 -> 1: fold the per-batch partitions. Each manifest-write +
    // fold holds the table's foldLock so the maintenance stream's own
    // recoverFold (landBatch) can never execute the same manifest
    // concurrently — and a second compact() can never clobber a pending
    // manifest between our write and its execution.
    foldLock(t).synchronized {
      val batches = partitionIds(spark, t).filter(_ >= 0L).sorted
      if (batches.size >= 2) {
        writeManifest(spark, t, nextDest, batches.size, batches.max, batches)
        recoverFold(spark, t, bucketed, buckets, bucketCol, foldAgg)
      }
    }
    // tiered merges: repeat while any tier is at fanout
    var go = true
    while (go) {
      foldLock(t).synchronized {
        val props = tableProps(spark, t)
        val negs = partitionIds(spark, t).filter(_ < 0L)
          .map(id => id -> spanOf(props, id))
        negs.groupBy { case (_, s) => tierOf(s, tierFanout) }
          .find(_._2.size >= tierFanout) match {
          case Some((_, group)) =>
            // horizon Long.MinValue: a tier merge folds already-folded
            // rows — no new batch ids, no fingerprints to record
            writeManifest(spark, t, nextDest, group.map(_._2).sum,
              Long.MinValue, group.map(_._1))
            recoverFold(spark, t, bucketed, buckets, bucketCol, foldAgg)
          case None => go = false
        }
      }
    }
  }

  /** Land one micro-batch's rows (already carrying `ingest_batch` =
    * `batchId`) into `table` — the maintenance loop's unit, extracted so
    * the replay/compaction interplay is directly testable. Each table
    * decides create-vs-append for ITSELF: a crash between the two
    * creations must not wedge the replay (an ALTER on the
    * not-yet-created sizes table would fail every retry).
    *
    * Replay-idempotence: the rewrite is confined to this batch's
    * partition (drop own + append). A batch id at or below the
    * compaction horizon has NO partition to drop — its rows live in a
    * fold — so landing it blind would duplicate them; it lands only if
    * its rows do NOT fingerprint-match the fold-time record (i.e. it is
    * a fresh-checkpoint batch reusing the id, not a crash replay).
    */
  private[graft] def landBatch(s: SparkSession, outer: SparkSession,
      df: DataFrame, table: String, batchId: Long, bucketed: Boolean,
      buckets: Int, bucketCol: String = "shingle"): Unit = {
    recoverCompaction(s, table) // heal a crashed legacy compaction
    def writer(mode: String) = {
      val w = df.write.mode(mode).partitionBy("ingest_batch")
      if (bucketed) w.bucketBy(buckets, bucketCol).sortBy(bucketCol) else w
    }
    if (!s.catalog.tableExists(table))
      writer("errorifexists").saveAsTable(table)
    else foldLock(table).synchronized {
      // the whole check-then-land is inside the table's fold lock: a
      // concurrent compact() folding THIS batch id (a crash-replay
      // landing an id compact is mid-fold on) would otherwise read the
      // horizon/fingerprint before the fold records them and land the
      // rows a second time
      recoverFold(s, table, bucketed, buckets, bucketCol) // heal a crashed fold
      val folded = compactionHorizon(s, table).exists(batchId <= _) && {
        val fp = tableProps(s, table).get(s"graft.fold.fp.$batchId")
        fp.isDefined && fp.contains(fingerprint(df.drop("ingest_batch")))
      }
      if (!folded) {
        s.sql(s"ALTER TABLE $table DROP IF EXISTS " +
          s"PARTITION (ingest_batch=$batchId)")
        writer("append").saveAsTable(table)
      }
      // the drop+append invalidated cached file listings; refresh BOTH
      // sessions — `s` is foreachBatch's cloned session, `outer` the
      // caller's (whose readers hold the stale cache)
      s.catalog.refreshTable(table)
      outer.catalog.refreshTable(table)
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
        landBatch(s, spark, sh, name, batchId, bucketed = true, buckets)
        landBatch(s, spark, sizes, s"${name}_sizes", batchId,
          bucketed = false, buckets)
      }.start()

  // --------------------------------------------- repeated-span index

  /** Materialize the POSITIONAL fingerprint index for incremental
    * repeated-span dedup ([[Dedup.repeatedSpans]]'s stage 1 as a
    * bucketed table): (id, pos, fp) bucketed+sorted on fp, so every
    * later batch-vs-corpus seed join reads the corpus side with ZERO
    * exchange — the ingest-time form of Lee et al.'s suffix-array scan.
    * At 100 TB the index is corpus-token-count sized; bucket it like the
    * shingle index (~128-256 MB of rows per bucket).
    */
  def buildSpanIndex(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, name: String, minLen: Int = 20,
      buckets: Int = 8): Unit =
    Dedup.spanFingerprints(docs, idCol, textCol, minLen)
      .write.mode("overwrite")
      .bucketBy(buckets, "fp").sortBy("fp").saveAsTable(name)

  /** Maximal verbatim spans between a NEW batch and the indexed corpus:
    * the batch's positional fingerprints seed against the bucketed index
    * and extend on diagonals exactly as [[Dedup.repeatedSpans]] —
    * id_a = corpus doc, id_b = new doc, so the rows feed
    * [[Dedup.exciseSpans]] keep-first: the corpus copy survives and the
    * ARRIVAL is stripped. `maxBucket` df-caps the CORPUS side only (a
    * fingerprint shared by more than maxBucket corpus docs is
    * boilerplate; the batch side is small by the ingest contract).
    *
    * Scale shape: corpus side scans bucket-local (no exchange — the
    * bucketed layout IS the join partitioning); only the batch
    * fingerprints shuffle. The df-cap window rides the same fp
    * clustering.
    */
  def incrementalSpans(spark: SparkSession, newDocs: DataFrame,
      idCol: String, textCol: String, name: String, minLen: Int = 20,
      maxBucket: Int = 64, beforeBatch: Option[Long] = None): DataFrame = {
    val newFp = Dedup.spanFingerprints(newDocs, idCol, textCol, minLen)
    // beforeBatch pins the index view to partitions strictly earlier —
    // a crash-replayed batch whose own fingerprints already landed must
    // not match ITSELF (the streaming path always passes it)
    val t0 = spark.table(name)
    val t1 = beforeBatch match {
      case Some(b) if t0.columns.contains("ingest_batch") =>
        t0.filter(col("ingest_batch") < b)
      case _ => t0
    }
    val idx = Dedup.capBuckets(
      t1.select(col("id"), col("pos"), col("fp")), "fp", maxBucket)
    val pairs = idx.as("a").join(newFp.as("b"),
        col("a.fp") === col("b.fp"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.pos").as("pos_a"), col("b.pos").as("pos_b"))
    Dedup.extendSeeds(pairs, minLen)
  }

  /** STREAMING span-index maintenance: per micro-batch, detect each
    * arrival's verbatim spans against the PRE-batch index (landed as the
    * append-only `<name>_spans` changelog, one `ingest_batch` partition
    * per batch), then fold the batch's own fingerprints into the index —
    * both through [[landBatch]]'s idempotent drop-partition+append, so a
    * crash-replayed batch re-lands identical contents and the span
    * changelog never double-reports. Arrivals therefore never match
    * LATER arrivals here (within-batch pairs are the caller's
    * [[Dedup.repeatedSpans]] pass if wanted) — the keep-first direction
    * is always corpus-or-earlier-batch → arrival.
    */
  def startSpanMaintenance(spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String, name: String, checkpointPath: String,
      minLen: Int = 20, buckets: Int = 8, maxBucket: Int = 64,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val fp = Dedup.spanFingerprints(batch.toDF(), idCol, textCol,
          minLen).withColumn("ingest_batch", lit(batchId))
        // fp lands FIRST so the seed join reads BOTH sides from the
        // bucketed table: the arrival's fingerprints are computed once
        // (landed, then re-read columnar — the previous spans-first
        // order re-ran the whole gram+hash chain a second time for the
        // index landing) and the join is bucket-local on fp for corpus
        // AND arrival side. Replay idempotence is unchanged: a replayed
        // batch drops + re-appends its own fp partition (identical
        // contents), and the spans below are still defined against the
        // strictly-pre-batch index (`ingest_batch < batchId`), so a
        // batch can never match itself.
        landBatch(s, spark, fp, name, batchId, bucketed = true, buckets,
          bucketCol = "fp")
        val t = s.table(name)
        val idx = Dedup.capBuckets(
          t.filter(col("ingest_batch") < batchId)
            .select(col("id"), col("pos"), col("fp")), "fp", maxBucket)
        val arr = t.filter(col("ingest_batch") === batchId)
          .select(col("id"), col("pos"), col("fp"))
        val spans = Dedup.extendSeeds(
          idx.as("a").join(arr.as("b"), col("a.fp") === col("b.fp"))
            .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
              col("a.pos").as("pos_a"), col("b.pos").as("pos_b")),
          minLen).withColumn("ingest_batch", lit(batchId))
        landBatch(s, spark, spans, s"${name}_spans", batchId,
          bucketed = false, buckets)
      }.start()

  // --------------------------------------------- cluster maintenance

  /** STREAMING cluster maintenance — the full corpus-as-CDC loop: keep
    * the shingle index AND a near-dup CLUSTER table current from a
    * document stream, emitting an append-only survivor CHANGELOG per
    * micro-batch. Each batch:
    *  1. derives its near-dup edges (within-batch pairs + batch-vs-index
    *     pairs against the PRE-batch index — one bucketed shingle join);
    *  2. lands in the shingle index (the existing idempotent path);
    *  3. applies [[Dedup.clusterDelta]]: components over the CONTRACTED
    *     graph (batch nodes + touched cluster labels) reassign only the
    *     touched clusters' members — O(batch + touched), never
    *     O(corpus) — and the add/retract events append to
    *     `<name>_changelog` (its own ingest_batch partition, replay-
    *     idempotent via [[landBatch]]).
    *
    * `<name>_clusters` (id, cluster, bucket = cluster mod buckets) is
    * partitioned by bucket so a rewrite touches only the buckets whose
    * clusters changed. The rewrite is crash-safe by a mini-manifest:
    * stage the affected buckets' new contents to a durable dir, record
    * `graft.cluster.pending` in table props, drop + re-append, then
    * clear the marker and advance `graft.cluster.last_batch`; recovery
    * re-executes a pending rewrite from the stage (idempotent — the
    * drop removes any partial append), and a replayed batch at or below
    * last_batch is skipped entirely. Because labels follow the min-id
    * policy, the maintained table is bit-identical to a from-scratch
    * [[Dedup.components]] labelling after every batch — the l88 gate.
    *
    * At 100 TB: the contraction needs each corpus ENDPOINT's label —
    * here a distributed join against the cluster table; co-locate it by
    * also bucketing on id if batch-vs-corpus lookups dominate.
    */
  def startClusterMaintenance(spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String, name: String, checkpointPath: String,
      threshold: Double = 0.8, n: Int = 3, buckets: Int = 8,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        maintainClusters(batch.sparkSession, spark, batch.toDF(), idCol,
          textCol, name, batchId, threshold, n, buckets)
      }.start()

  /** True while a cluster-table bucket rewrite is mid-flight — i.e. the
    * pending marker is set (test/forensics accessor).
    */
  def clusterPending(spark: SparkSession, cl: String): Boolean =
    spark.catalog.tableExists(cl) &&
      tableProps(spark, cl).contains("graft.cluster.pending")

  private def clusterStagePath(s: SparkSession, cl: String): String =
    new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath +
      s"/${cl}__stage"

  /** Re-execute a cluster-table rewrite that crashed between its
    * partition drops and the props advance — the stage dir is durable
    * and the drop is idempotent, so finishing is always safe.
    */
  private def recoverClusterRewrite(s: SparkSession, cl: String): Unit =
    if (s.catalog.tableExists(cl))
      tableProps(s, cl).get("graft.cluster.pending").foreach { spec =>
        val Array(bid, csv) = spec.split(":", 2)
        val staged = s.read.parquet(clusterStagePath(s, cl))
        csv.split(",").filter(_.nonEmpty).foreach(b =>
          s.sql(s"ALTER TABLE $cl DROP IF EXISTS PARTITION (bucket=$b)"))
        staged.select(col("id"), col("cluster"), col("bucket"))
          .write.insertInto(cl)
        s.sql(s"ALTER TABLE $cl SET TBLPROPERTIES " +
          s"('graft.cluster.last_batch'='$bid')")
        s.sql(s"ALTER TABLE $cl UNSET TBLPROPERTIES ('graft.cluster.pending')")
        s.catalog.refreshTable(cl)
      }

  /** TAKEDOWN — the deletion half of the corpus-as-CDC loop: remove
    * documents (copyright/PII removal requests) from the maintained
    * cluster state, emitting the survivor changelog the removal
    * implies. Removal is harder than ingest: deleting a doc can SPLIT
    * its cluster (it was the bridge), so labels alone are not enough —
    * the remaining members' pairwise edges are re-derived from the
    * shingle INDEX (restricted to those members: O(touched clusters),
    * never O(corpus)) and re-clustered. Changelog events:
    *  - a removed survivor → `retract` it; each resulting sub-cluster's
    *    survivor that wasn't one before → `add`;
    *  - a removed non-survivor that bridged → `add` per split-off
    *    sub-cluster; absorbed removals emit nothing.
    *
    * The index keeps the removed docs' rows physically (rewriting a
    * bucketed layout per takedown would be O(index)); instead they land
    * in `<name>_tombstones` and every future batch's cross-pairs
    * anti-join it — logical deletion now, physical purge deferred to an
    * index rebuild/compaction cycle. Cluster-table buckets rewrite
    * under the same stage→pending-marker protocol as ingest; the whole
    * call is idempotent for a fixed `opId` (re-running finds the docs
    * already gone → no touched clusters, and the changelog partition
    * re-lands identically).
    */
  def retractDocs(spark: SparkSession, name: String, removeIds: DataFrame,
      opId: Long, threshold: Double = 0.8, buckets: Int = 8): Unit = {
    val cl = s"${name}_clusters"; val logT = s"${name}_changelog"
    recoverClusterRewrite(spark, cl)
    spark.catalog.refreshTable(cl) // fresh resolution before the snapshot
    val rm = removeIds.select(col("id")).localCheckpoint(true)
    landBatch(spark, spark, rm.withColumn("ingest_batch", lit(opId)),
      s"${name}_tombstones", opId, bucketed = false, buckets)
    // one materialized snapshot of the pre-takedown table, reused by
    // every derivation below — the same single-read-point discipline as
    // maintainClusters (no re-list can race the bucket rewrite)
    val cur = spark.table(cl)
      .select(col("id"), col("cluster"), col("bucket")).localCheckpoint(true)
    val touched = cur.join(rm, Seq("id"), "left_semi")
      .select(col("cluster")).distinct().localCheckpoint(true)
    val oldSurv = cur.join(touched, Seq("cluster"), "left_semi")
      .groupBy(col("cluster")).agg(min(col("id")).as("sv"))
      .select(col("sv"))
    val memIds = cur.join(touched, Seq("cluster"), "left_semi")
      .join(rm, Seq("id"), "left_anti").select(col("id"))
    // re-derive the remaining members' edges from the index and
    // re-cluster — splits fall out naturally
    val idx = spark.table(name).join(memIds, Seq("id"), "left_semi")
    val sizes = spark.table(s"${name}_sizes")
      .join(memIds, Seq("id"), "left_semi").select(col("id"), col("n"))
    val pairs = idx.as("a")
      .join(idx.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), "id_b")
      .filter(col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")) >= threshold)
      .select(col("id_a"), col("id_b"))
    val newAssign = {
      val base =
        if (pairs.isEmpty) memIds.withColumn("cluster", col("id"))
        else memIds.join(Dedup.components(pairs), Seq("id"), "left")
          .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
      base.localCheckpoint(true)
    }
    val newSurv = newAssign.select(col("cluster").as("sv")).distinct()
    val changelog =
      oldSurv.join(newSurv, Seq("sv"), "left_anti")
        .select(lit("retract").as("op"), col("sv").as("doc_id"))
      .union(newSurv.join(oldSurv, Seq("sv"), "left_anti")
        .select(lit("add").as("op"), col("sv").as("doc_id")))
      .localCheckpoint(true)
    landBatch(spark, spark,
      changelog.withColumn("ingest_batch", lit(opId)), logT, opId,
      bucketed = false, buckets)
    if (touched.isEmpty) return
    // bucket rewrite: everything in a touched cluster leaves its old
    // bucket; remaining members re-land under their new labels
    val assignB = newAssign
      .withColumn("bucket", pmod(col("cluster"), lit(buckets.toLong)))
    val affected = (assignB.select(col("bucket")) union
        cur.join(touched, Seq("cluster"), "left_semi").select(col("bucket")))
      .distinct().collect().map(_.getLong(0)).sorted
    val keep = cur.filter(col("bucket").isin(affected: _*))
      .join(touched, Seq("cluster"), "left_anti")
      .select(col("id"), col("cluster"), col("bucket"))
    val stage = clusterStagePath(spark, cl)
    keep.union(assignB.select(col("id"), col("cluster"), col("bucket")))
      .write.mode("overwrite").parquet(stage)
    val last = tableProps(spark, cl)("graft.cluster.last_batch")
    spark.sql(s"ALTER TABLE $cl SET TBLPROPERTIES ('graft.cluster.pending'=" +
      s"'$last:${affected.mkString(",")}')")
    affected.foreach(b =>
      spark.sql(s"ALTER TABLE $cl DROP IF EXISTS PARTITION (bucket=$b)"))
    spark.read.parquet(stage).select(col("id"), col("cluster"), col("bucket"))
      .write.insertInto(cl)
    spark.sql(s"ALTER TABLE $cl UNSET TBLPROPERTIES ('graft.cluster.pending')")
    spark.catalog.refreshTable(cl)
  }

  private[graft] def maintainClusters(s: SparkSession, outer: SparkSession,
      batch: DataFrame, idCol: String, textCol: String, name: String,
      batchId: Long, threshold: Double, n: Int, buckets: Int): Unit = {
    val cl = s"${name}_clusters"; val logT = s"${name}_changelog"
    recoverClusterRewrite(s, cl)
    // evict any cached relation/file listing before the snapshot read:
    // this session may hold a resolution from before the previous
    // batch's bucket rewrite (or, in a shared-JVM harness, from a
    // previous table incarnation at the same path)
    if (s.catalog.tableExists(cl)) s.catalog.refreshTable(cl)
    // a cluster table without last_batch is a crashed CREATION — its
    // contents are this very batch's partial state, not a pre-state
    if (s.catalog.tableExists(cl) &&
        !tableProps(s, cl).contains("graft.cluster.last_batch"))
      s.sql(s"DROP TABLE $cl")
    val applied =
      if (s.catalog.tableExists(cl))
        tableProps(s, cl)("graft.cluster.last_batch").toLong
      else -1L
    // Phase labels (optimization-guide §1.5): every job inside this
    // foreachBatch otherwise reports the stream's start callsite, which
    // makes the batch loop unattributable in the UI/listeners.
    def phase(tag: String): Unit =
      s.sparkContext.setJobDescription(s"maintainClusters[$batchId] $tag")
    phase("edges")
    val batchIds = batch.select(col(idCol).cast("long").as("id"))
    val bSh = Dedup.shingles(batch, idCol, textCol, n)
    // 1. edges from the PRE-batch state (ingest_batch < batchId keeps a
    // replayed batch's own landed rows out; fold partitions are negative
    // and always below any live id, and a folded replay's self-pairs
    // die on the id inequality)
    val within = Dedup.ngramJaccardPairs(bSh, threshold, maxDf = Long.MaxValue)
      .select(col("id_a"), col("id_b"))
    val cross =
      if (s.catalog.tableExists(name)) {
        // tombstoned docs (takedowns — retractDocs) are logically gone:
        // new batches must not pair against them
        val dropTomb = (df: DataFrame) =>
          if (s.catalog.tableExists(s"${name}_tombstones"))
            df.join(s.table(s"${name}_tombstones").select(col("id")),
              Seq("id"), "left_anti")
          else df
        val idx = dropTomb(s.table(name).filter(col("ingest_batch") < batchId))
        val oldSizes = dropTomb(s.table(s"${name}_sizes")
            .filter(col("ingest_batch") < batchId))
          .select(col("id").as("old_id"), col("n").as("n_old"))
        val newSizes = bSh.groupBy(col("id")).agg(count(lit(1)).as("n_new"))
          .withColumnRenamed("id", "new_id")
        bSh.as("nw").join(idx.as("ix"), col("nw.shingle") === col("ix.shingle"))
          .groupBy(col("nw.id").as("new_id"), col("ix.id").as("old_id"))
          .agg(count(lit(1)).as("inter"))
          .join(newSizes, "new_id").join(oldSizes, "old_id")
          .filter(col("inter").cast("double") /
            (col("n_new") + col("n_old") - col("inter")) >= threshold)
          .filter(col("new_id") =!= col("old_id"))
          .select(col("new_id").as("id_a"), col("old_id").as("id_b"))
      } else within.limit(0)
    val newEdges = within.union(cross).localCheckpoint(true)
    // 2. the shingle index lands exactly as startMaintenance does
    phase("land-index")
    landBatch(s, outer,
      bSh.withColumn("ingest_batch", lit(batchId)), name, batchId,
      bucketed = true, buckets)
    landBatch(s, outer,
      bSh.groupBy(col("id")).agg(count(lit(1)).as("n"))
        .withColumn("ingest_batch", lit(batchId)),
      s"${name}_sizes", batchId, bucketed = false, buckets)
    // 3. cluster update + changelog, skipped wholesale on replay of an
    // applied batch (the pre-state no longer exists)
    if (applied >= batchId) return
    phase("cluster-delta")
    // ONE snapshot read of the pre-batch cluster table, materialized
    // immediately (localCheckpoint) and reused by the delta, the
    // affected-bucket scan and the keep-set below. Before r9 each of
    // those re-listed and re-scanned the table's files independently;
    // besides the redundant full scans, a re-list late in the batch
    // raced file-level rewrites in the loaded bench JVM
    // (FAILED_READ_FILE on files a fresh listing would not contain).
    // With the snapshot, table files are read at exactly one
    // well-defined point per batch.
    val pre =
      if (s.catalog.tableExists(cl))
        s.table(cl).select(col("id"), col("cluster"), col("bucket"))
          .localCheckpoint(true)
      else batchIds.limit(0).withColumn("cluster", col("id"))
        .withColumn("bucket", pmod(col("cluster"), lit(buckets.toLong)))
    val clusterOf = pre.select(col("id"), col("cluster"))
    val (changelog0, assign0) =
      Dedup.clusterDelta(clusterOf, newEdges, batchIds)
    val changelog = changelog0.localCheckpoint(true)
    val assign = assign0
      .withColumn("bucket", pmod(col("cluster"), lit(buckets.toLong)))
      .localCheckpoint(true)
    // the changelog lands BEFORE the cluster rewrite advances
    // last_batch: a crash after the advance skips this whole section on
    // replay, so everything the skip covers must already be durable
    phase("land-changelog")
    landBatch(s, outer,
      changelog.withColumn("ingest_batch", lit(batchId)), logT, batchId,
      bucketed = false, buckets)
    phase("cluster-rewrite")
    if (!s.catalog.tableExists(cl)) {
      assign.write.partitionBy("bucket").saveAsTable(cl)
      s.sql(s"ALTER TABLE $cl SET TBLPROPERTIES " +
        s"('graft.cluster.last_batch'='$batchId')")
    } else {
      // affected buckets: where reassigned rows LIVE now + where they GO
      val affected = (assign.select(col("bucket")) union
          pre.join(assign.select(col("id")), Seq("id"), "left_semi")
            .select(col("bucket")))
        .distinct().collect().map(_.getLong(0)).sorted
      val keep = pre
        .filter(col("bucket").isin(affected: _*))
        .join(assign.select(col("id")), Seq("id"), "left_anti")
        .select(col("id"), col("cluster"), col("bucket"))
      val stage = clusterStagePath(s, cl)
      keep.union(assign.select(col("id"), col("cluster"), col("bucket")))
        .write.mode("overwrite").parquet(stage)
      s.sql(s"ALTER TABLE $cl SET TBLPROPERTIES ('graft.cluster.pending'=" +
        s"'$batchId:${affected.mkString(",")}')")
      affected.foreach(b =>
        s.sql(s"ALTER TABLE $cl DROP IF EXISTS PARTITION (bucket=$b)"))
      s.read.parquet(stage).select(col("id"), col("cluster"), col("bucket"))
        .write.insertInto(cl)
      s.sql(s"ALTER TABLE $cl SET TBLPROPERTIES " +
        s"('graft.cluster.last_batch'='$batchId')")
      s.sql(s"ALTER TABLE $cl UNSET TBLPROPERTIES ('graft.cluster.pending')")
    }
    s.catalog.refreshTable(cl); outer.catalog.refreshTable(cl)
  }
}
