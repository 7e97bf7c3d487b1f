package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One quality-passing document arriving at the ingest-dedup stage. */
case class CurationArrival(digest: String, doc_id: Long, source: String)

/** Exact-dedup verdict: `dup_of` is the first-seen holder of the same
  * content digest (null for the first arrival, which registers).
  */
case class ExactDedupVerdict(doc_id: Long, source: String, dup_of: Option[Long])

/** Per-digest state: the first-seen document id. */
case class DigestOwner(doc_id: Long)

/** Quota admission verdict: `admit_rank` is the document's 1-based
  * arrival rank among its source's candidates; `admitted` iff the rank is
  * within the source's cap.
  */
case class QuotaVerdict(doc_id: Long, source: String, admit_rank: Long,
    admitted: Boolean)

/** Per-source admission state: candidates counted so far + the highest
  * doc id processed (replay guard).
  */
case class SourceQuotaState(count: Long, maxSeen: Long)

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
  * Scale shape: stage 2's only exchange is on the digest — state per
  * digest is ONE (id) pair, uniformly hash-spread regardless of corpus
  * skew. Stage 3 keys by source (low cardinality): its state is one
  * counter per source — bytes, not documents — so the skew that matters
  * (one giant source) concentrates *counting*, not data; the verdict rows
  * themselves never collect anywhere.
  */
object StreamingCuration {

  /** Per-digest first-seen check: arrivals in doc_id order; the first
    * registers, later ones emit their `dup_of`. A replayed id is
    * idempotent (the registered owner neither re-registers nor flags
    * itself).
    */
  def checkDigest(digest: String, it: Iterator[CurationArrival],
      state: GroupState[DigestOwner]): Iterator[ExactDedupVerdict] = {
    var owner = state.getOption.map(_.doc_id)
    val out = scala.collection.mutable.ArrayBuffer[ExactDedupVerdict]()
    it.toList.sortBy(_.doc_id).foreach { a =>
      owner match {
        case None =>
          owner = Some(a.doc_id)
          out += ExactDedupVerdict(a.doc_id, a.source, None)
        case Some(first) if first == a.doc_id => // replay of the owner
        case Some(first) =>
          out += ExactDedupVerdict(a.doc_id, a.source, Some(first))
      }
    }
    owner.foreach(id => state.update(DigestOwner(id)))
    out.iterator
  }

  /** Exact content dedup over a streaming docs frame: one verdict row per
    * first arrival of each doc id (`dup_of` null = this id owns its
    * digest). Digest = md5 of the text column — portable, and collisions
    * at 128 bits are not a design concern.
    */
  def exactDedupStream(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, sourceCol: String): Dataset[ExactDedupVerdict] = {
    import spark.implicits._
    docs
      .select(md5(col(textCol)).as("digest"), col(idCol).as("doc_id"),
        col(sourceCol).as("source"))
      .as[CurationArrival]
      .groupByKey(_.digest)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        checkDigest)
  }

  /** Per-source admission count: arrivals in doc_id order get 1-based
    * ranks continuing across micro-batches; `admitted` iff rank <= quota.
    * Replays (doc_id at or below the source's high-water mark) emit
    * nothing and do not advance the counter.
    */
  def checkQuota(quota: Long)(source: String,
      it: Iterator[ExactDedupVerdict],
      state: GroupState[SourceQuotaState]): Iterator[QuotaVerdict] = {
    var s = state.getOption.getOrElse(SourceQuotaState(0L, Long.MinValue))
    val out = scala.collection.mutable.ArrayBuffer[QuotaVerdict]()
    it.toList.sortBy(_.doc_id).foreach { a =>
      if (a.doc_id > s.maxSeen) {
        val rank = s.count + 1
        out += QuotaVerdict(a.doc_id, source, rank, rank <= quota)
        s = SourceQuotaState(rank, a.doc_id)
      }
    }
    state.update(s)
    out.iterator
  }

  /** Quota admission over the dedup stage's survivors (`dup_of` null). */
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
}
