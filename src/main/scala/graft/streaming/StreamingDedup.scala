package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.Dedup

/** One document's arrival in one LSH band bucket: its id + full k-minhash
  * signature (the signature is what membership checks compare).
  */
case class DocSigArrival(bucket: Long, doc_id: Long, sig: Seq[Long])

/** Per-bucket registry of first-seen documents (id, signature). */
case class BucketMembers(members: List[(Long, Seq[Long])])

/** A near-dup hit: `doc_id` agreed with prior member `dup_of` on
  * `matches` of `k` minhash components in bucket `bucket`.
  */
case class NearDupEvidence(doc_id: Long, bucket: Long, dup_of: Long,
    matches: Int, k: Int)

/** Streaming ingest-time near-duplicate detection — the dedup-on-ingest
  * stage of a training-data pipeline, as a stateful streaming operator:
  * documents arrive as a stream, each is MinHash-signed (narrow native
  * kernel, zero shuffle), exploded into its LSH band buckets, and checked
  * against every PRIOR document registered in the same bucket. State per
  * bucket is the first-seen member registry; a new document whose
  * signature agreement with any member reaches the threshold emits
  * [[NearDupEvidence]] per matching bucket.
  *
  * Semantics:
  *  - first-seen wins: `dup_of` is a member that arrived earlier (within
  *    a batch, arrivals are processed in doc_id order, so evidence is
  *    deterministic for a given batch decomposition);
  *  - a replayed doc_id is idempotent — already-registered ids neither
  *    re-register nor match themselves;
  *  - every new id registers (up to `maxBucket`) whether or not it was
  *    flagged, so downstream survivor policy stays a separate concern;
  *  - agreement is integer-exact: `matches·den >= num·k` (no float
  *    threshold drift).
  *
  * Scale shape: the only exchange is the groupByKey on the band-bucket
  * key — the same partitioning the batch LSH path shuffles on — and
  * state is bounded per bucket by `maxBucket` (the degenerate-bucket
  * guard of [[Dedup.lshCandidates]]: a bucket at cap stops registering,
  * trading recall on that degenerate mass for bounded state, never
  * unbounded growth). At 100 TB, bucket keys are high-cardinality
  * (band × k-hash) so state spreads evenly; RocksDB holds it.
  */
object StreamingDedup {

  /** The per-bucket stateful check ([[NearDupEvidence]] for hits). */
  def checkBucket(thresholdNum: Int, thresholdDen: Int, maxBucket: Int)(
      bucket: Long, it: Iterator[DocSigArrival],
      state: GroupState[BucketMembers]): Iterator[NearDupEvidence] = {
    var members = state.getOption.map(_.members).getOrElse(Nil)
    val out = scala.collection.mutable.ArrayBuffer[NearDupEvidence]()
    it.toList.sortBy(_.doc_id).foreach { a =>
      if (!members.exists(_._1 == a.doc_id)) {
        val k = a.sig.length
        members.reverseIterator // registration order = arrival order
          .map { case (mid, msig) =>
            (mid, msig.iterator.zip(a.sig.iterator).count { case (x, y) => x == y })
          }
          .find { case (_, m) => m.toLong * thresholdDen >= thresholdNum.toLong * k }
          .foreach { case (mid, m) =>
            out += NearDupEvidence(a.doc_id, bucket, mid, m, k)
          }
        if (members.size < maxBucket)
          members = (a.doc_id, a.sig) :: members
      }
    }
    state.update(BucketMembers(members))
    out.iterator
  }

  /** Apply ingest dedup to a streaming `docs` frame. Output: one
    * [[NearDupEvidence]] row per (new doc, matching bucket); a document is
    * a near-dup iff it has ≥1 evidence row — aggregate per batch (e.g.
    * `groupBy(doc_id).agg(min(dup_of))` in foreachBatch) for the verdict.
    *
    * `thresholdNum/thresholdDen` is the minimum fraction of agreeing
    * minhash components (an unbiased Jaccard estimate): 4/5 with k=32
    * requires ≥26 agreeing components.
    */
  def nearDupStream(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, k: Int = 32, rowsPerBand: Int = 2,
      thresholdNum: Int = 4, thresholdDen: Int = 5,
      maxBucket: Int = 10000): Dataset[NearDupEvidence] = {
    import spark.implicits._
    require(k % rowsPerBand == 0, "k must be divisible by rowsPerBand")
    val bands = k / rowsPerBand
    val sig = Dedup.minhashSignaturesNarrow(docs, idCol, textCol, k)
    // band key = hash(band, its signature slice): a hash collision merely
    // merges two buckets, adding candidates the signature check filters —
    // never a correctness hazard
    val bandKeys = (0 until bands).map { b =>
      val cols = (1 to rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}"))
      xxhash64(lit(b) +: cols: _*)
    }
    sig
      .withColumn("sig", array((1 to k).map(i => col(s"mh_$i")): _*))
      .select(col("id").as("doc_id"), col("sig"),
        explode(array(bandKeys: _*)).as("bucket"))
      .as[DocSigArrival]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        checkBucket(thresholdNum, thresholdDen, maxBucket))
  }
}
