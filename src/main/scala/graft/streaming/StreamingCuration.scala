package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One quality-passing document arriving at the ingest-dedup stage.
  * `event_ts` (null when the caller runs without event time) is the
  * watermark column — it must stay a TIMESTAMP through the projection so
  * its event-time tag survives into the stateful operator; it only
  * matters when the digest registry runs with a dedup window.
  */
case class CurationArrival(digest: String, doc_id: Long, source: String,
    event_ts: java.sql.Timestamp = null)

/** Exact-dedup verdict: `dup_of` is the first-seen holder of the same
  * content digest (null for the first arrival, which registers).
  */
case class ExactDedupVerdict(doc_id: Long, source: String, dup_of: Option[Long])

/** Per-digest state: the first-seen document id, plus every doc id already
  * flagged as a duplicate of it — so a redelivered duplicate is recognized
  * and NOT re-verdicted (exactly-once verdict rows under at-least-once
  * delivery between stages). The flagged list is small by construction
  * (it holds only the copies of one digest, not the corpus).
  */
case class DigestOwner(doc_id: Long, flagged: Seq[Long] = Seq.empty)

/** Quota admission verdict: `admit_rank` is the document's 1-based
  * arrival rank among its source's candidates; `admitted` iff the rank is
  * within the source's cap.
  */
case class QuotaVerdict(doc_id: Long, source: String, admit_rank: Long,
    admitted: Boolean)

/** Per-source admission state: every candidate id already ranked, with its
  * rank. Replay detection is by id membership — replay-SPECIFIC, so a
  * genuinely new document whose id sits below the source's high-water mark
  * still gets its verdict (ids carry no cross-batch monotonicity
  * guarantee; a high-water-mark guard would silently drop such rows).
  * Also the per-shard state of [[StreamingCuration.shardQuotaStream]],
  * where `ranked` holds at most `quota` entries.
  */
case class SourceQuotaState(ranked: Map[Long, Long])

/** Stage-1 output of the sharded quota path: `survivor` = proceeds to the
  * exact serial ranking stage; false = definite global reject (its shard
  * alone already held `quota` earlier arrivals).
  */
case class ShardSurvivor(doc_id: Long, source: String, survivor: Boolean)

/** Ingest-time curation as staged streaming operators — the
  * quality→dedup→quota admission funnel of a training-data pipeline
  * (batch form: `ops/Curation`), run AT INGEST so rejected mass never
  * lands in the corpus store:
  *
  *  1. a stateless quality gate (`ops/TextAnalysis.qualityScore`) drops
  *     low-quality docs before any state is touched;
  *  2. [[exactDedupStream]] — stateful first-seen registry keyed by
  *     content digest; later holders of a digest are flagged with their
  *     `dup_of`;
  *  3. [[quotaStream]] — stateful per-source admission counter; each
  *     source admits its first N candidates (arrival order), the rest are
  *     flagged over-quota.
  *
  * The stages are separate streaming queries composed through storage
  * (dedup output → quota input), the production shape for multi-key
  * stateful chains: each stage keys its own state (digest vs source), gets
  * its own checkpoint, and restarts/scales independently — no multi-
  * stateful-operator coupling inside one query plan.
  *
  * Both stages are idempotent under at-least-once delivery between the
  * stages: a redelivered row (same id seen before) emits nothing and
  * moves no counter — detection is by id membership in state, never by a
  * high-water mark, so out-of-order NEW ids are ranked normally.
  *
  * Scale shape: stage 2's only exchange is on the digest — state per
  * digest is the owner id plus its (few) flagged copies, uniformly
  * hash-spread regardless of corpus skew; with `dedupWindowMs` set the
  * registry is additionally bounded by event time (entries expire a
  * window after their digest's last arrival — dedup-window semantics,
  * like the assembly tombstones). Stage 3 keys by source (low
  * cardinality): its state is the source's ranked-id map — O(candidates
  * per source), the price of exactly-once verdicts under redelivery; at
  * 100 TB shard hot sources upstream (the quota splits with them) or
  * compact the map once the source's intake closes.
  */
object StreamingCuration {

  /** Per-digest first-seen check: arrivals in doc_id order; the first
    * registers, later ones emit their `dup_of`. Replays are idempotent by
    * id membership: the owner neither re-registers nor flags itself, and
    * an already-flagged duplicate does NOT re-emit its verdict. With
    * `windowMs` set (event-time timeout), an expired digest's registry
    * entry is removed — the next holder re-registers as a fresh owner.
    */
  def checkDigest(windowMs: Option[Long])(digest: String,
      it: Iterator[CurationArrival],
      state: GroupState[DigestOwner]): Iterator[ExactDedupVerdict] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val arrivals = it.toList.sortBy(_.doc_id)
    var owner = state.getOption.map(_.doc_id)
    var flagged = state.getOption.map(_.flagged.toSet).getOrElse(Set.empty[Long])
    val out = scala.collection.mutable.ArrayBuffer[ExactDedupVerdict]()
    arrivals.foreach { a =>
      owner match {
        case None =>
          owner = Some(a.doc_id)
          out += ExactDedupVerdict(a.doc_id, a.source, None)
        case Some(first) if first == a.doc_id => // replay of the owner
        case Some(_) if flagged.contains(a.doc_id) => // replayed duplicate
        case Some(first) =>
          flagged += a.doc_id
          out += ExactDedupVerdict(a.doc_id, a.source, Some(first))
      }
    }
    owner.foreach(id => state.update(DigestOwner(id, flagged.toSeq.sorted)))
    windowMs.foreach { w =>
      // refresh on every TIMESTAMPED arrival: the entry lives `w` past
      // the digest's latest event time (never at/below the watermark,
      // which would be an immediate-timeout error). A batch whose
      // arrivals all carry NULL event_ts keeps the prior timeout —
      // refreshing from a null-ts arrival would floor the timeout at
      // watermark+1 and silently expire (= disable) dedup for the
      // digest at the next watermark advance. A digest REGISTERED by a
      // null-ts arrival carries no timeout until a timestamped arrival
      // supplies one (unbounded beats silently wrong).
      val ts = arrivals.flatMap(a => Option(a.event_ts)).map(_.getTime)
      if (ts.nonEmpty) {
        val floor = state.getCurrentWatermarkMs() + 1
        state.setTimeoutTimestamp(math.max(ts.max + w, floor))
      }
    }
    out.iterator
  }

  /** Exact content dedup over a streaming docs frame: one verdict row per
    * first arrival of each doc id (`dup_of` null = this id owns its
    * digest). Digest = md5 of the text column — portable, and collisions
    * at 128 bits are not a design concern.
    *
    * Default is an unbounded registry (`GroupStateTimeout.NoTimeout`) —
    * correct for exact whole-corpus dedup; RocksDB spills it. Passing
    * `eventTimeCol` + `dedupWindowMs` bounds state by event time instead:
    * a digest unseen for the window expires, and a later holder of the
    * same content re-registers (window-dedup semantics). `watermarkDelay`
    * is the out-of-orderness bound handed to `withWatermark`.
    */
  def exactDedupStream(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, sourceCol: String,
      eventTimeCol: Option[String] = None,
      dedupWindowMs: Option[Long] = None,
      watermarkDelay: String = "0 seconds"): Dataset[ExactDedupVerdict] = {
    import spark.implicits._
    require(eventTimeCol.isDefined == dedupWindowMs.isDefined,
      "eventTimeCol and dedupWindowMs come together (windowed dedup) or not at all")
    val arrivals = eventTimeCol match {
      case Some(ts) =>
        docs.withWatermark(ts, watermarkDelay)
          .select(md5(col(textCol)).as("digest"), col(idCol).as("doc_id"),
            col(sourceCol).as("source"), col(ts).as("event_ts"))
      case None =>
        docs.select(md5(col(textCol)).as("digest"), col(idCol).as("doc_id"),
          col(sourceCol).as("source"),
          lit(null).cast("timestamp").as("event_ts"))
    }
    val timeout =
      if (dedupWindowMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    arrivals.as[CurationArrival]
      .groupByKey(_.digest)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        checkDigest(dedupWindowMs))
  }

  /** Per-source admission count: arrivals in doc_id order get 1-based
    * ranks continuing across micro-batches; `admitted` iff rank <= quota.
    * A redelivered id (already in the source's ranked map) emits nothing
    * and does not advance the counter; a genuinely NEW id always gets a
    * verdict, wherever it falls relative to ids seen before.
    */
  def checkQuota(quota: Long)(source: String,
      it: Iterator[ExactDedupVerdict],
      state: GroupState[SourceQuotaState]): Iterator[QuotaVerdict] = {
    var ranked = state.getOption.map(_.ranked).getOrElse(Map.empty[Long, Long])
    val out = scala.collection.mutable.ArrayBuffer[QuotaVerdict]()
    it.toList.sortBy(_.doc_id).foreach { a =>
      if (!ranked.contains(a.doc_id)) {
        val rank = ranked.size + 1L
        out += QuotaVerdict(a.doc_id, source, rank, rank <= quota)
        ranked += (a.doc_id -> rank)
      }
    }
    state.update(SourceQuotaState(ranked))
    out.iterator
  }

  /** Quota admission over the dedup stage's survivors (`dup_of` null).
    *
    * STATE TRADEOFF: exactly-once verdicts under redelivery cost
    * O(candidates-per-source) state — the source's full ranked-id map,
    * reserialized on every batch the source appears in. That is the
    * exact serial semantics; for a HOT source route through
    * [[shardQuotaStream]] instead, whose per-shard state is bounded by
    * `quota` ids (admits provably identical; reject verdicts become
    * at-least-once).
    */
  def quotaStream(spark: SparkSession, dedupVerdicts: DataFrame,
      quota: Long): Dataset[QuotaVerdict] = {
    import spark.implicits._
    dedupVerdicts
      .filter(col("dup_of").isNull)
      .select(col("doc_id"), col("source"),
        lit(null).cast("long").as("dup_of"))
      .as[ExactDedupVerdict]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        checkQuota(quota))
  }

  /** Stage-1 verdict of the SHARDED quota path: survivors proceed to the
    * exact serial stage; non-survivors are DEFINITE global rejects.
    */
  def checkShardQuota(quota: Long)(key: (String, Long),
      it: Iterator[ExactDedupVerdict],
      state: GroupState[SourceQuotaState]): Iterator[ShardSurvivor] = {
    var ranked = state.getOption.map(_.ranked).getOrElse(Map.empty[Long, Long])
    val out = scala.collection.mutable.ArrayBuffer[ShardSurvivor]()
    it.toList.sortBy(_.doc_id).foreach { a =>
      if (!ranked.contains(a.doc_id)) {
        if (ranked.size < quota) {
          ranked += (a.doc_id -> (ranked.size + 1L))
          out += ShardSurvivor(a.doc_id, a.source, survivor = true)
        } else {
          // beyond-quota ids are NOT stored (that is what bounds the
          // state); a redelivered definite-reject re-emits its verdict —
          // reject rows are at-least-once on this path, admits stay
          // exactly-once
          out += ShardSurvivor(a.doc_id, a.source, survivor = false)
        }
      }
    }
    state.update(SourceQuotaState(ranked))
    out.iterator
  }

  /** Sharded per-source quota — the hot-source scale path. The serial
    * [[quotaStream]] is exact but keys ALL of a source's candidates
    * through one state row (O(candidates) state, one task per source).
    * This splits admission in two stages composed through storage:
    *
    *  1. THIS stage keys by (source, doc_id % shards) and passes through
    *     each shard's first `quota` candidates; a candidate beyond its
    *     shard's quota has ≥ quota earlier arrivals in that shard alone,
    *     so its GLOBAL arrival rank must exceed the quota — it is a
    *     definite reject, emitted here with no rank. State per shard is
    *     AT MOST `quota` ids — bounded however large the source.
    *  2. the survivors (≤ shards·quota per source) feed the serial
    *     [[quotaStream]], whose state is now bounded too.
    *
    * EXACTNESS: the admitted set and every admitted rank equal the
    * serial path's (a survivor whose survivor-relative rank is within
    * quota cannot be preceded by any dropped candidate — each dropped
    * candidate is preceded by `quota` same-shard survivors, which would
    * push the later survivor's rank past the quota). Only the rank
    * VALUES reported for stage-2 rejects differ: they count survivors
    * only, so they are lower bounds on the true arrival rank
    * (StreamingCurationSpec pins the equivalence property).
    */
  def shardQuotaStream(spark: SparkSession, dedupVerdicts: DataFrame,
      quota: Long, shards: Int): Dataset[ShardSurvivor] = {
    import spark.implicits._
    require(shards > 0, "shards must be positive")
    dedupVerdicts
      .filter(col("dup_of").isNull)
      .select(col("doc_id"), col("source"),
        lit(null).cast("long").as("dup_of"))
      .as[ExactDedupVerdict]
      .groupByKey(v => (v.source, v.doc_id % shards))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        checkShardQuota(quota))
  }

  /** Streaming drift alarm: every micro-batch of the ingest feed is
    * scored per group against a FROZEN reference histogram
    * (`refCounts` = the collected B rows of
    * [[graft.ops.Curation.bucketCounts]] over the blessed snapshot —
    * B ≈ 512 driver-resident longs however big the reference corpus
    * was, rebuilt as a broadcast local relation each batch; the
    * reference data itself is never rescanned). Appends one row per
    * (group values..., batch) to `outPath`: tv_ppm plus `alert` =
    * tv_ppm > thresholdPpm — the feed-changed-character pager signal.
    *
    * foreachBatch, not a stateful operator: drift is a pure per-batch
    * aggregate (no cross-batch state), and the per-batch frame after
    * the group×bucket combine is tiny, so the batch-mode plan
    * (map-side combined shuffle + broadcast reference join) is exactly
    * the right physical shape — nothing for a state store to add.
    */
  def driftMonitorStream(spark: SparkSession, docs: DataFrame,
      groupCols: Seq[String], textCol: String,
      refCounts: Seq[(Long, Long)], outPath: String, checkpoint: String,
      buckets: Int = 512, thresholdPpm: Long = 500000L)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] = {
    import spark.implicits._
    val refTotal = refCounts.map(_._2).sum
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ref = refCounts.toDF("b", "cb")
        graft.ops.Curation.driftAgainst(batch, groupCols, col(textCol),
            ref, refTotal, buckets)
          .withColumn("batch", lit(batchId))
          .withColumn("alert", col("tv_ppm") > thresholdPpm)
          .write.mode("append").parquet(outPath)
        ()
      }
  }
}
