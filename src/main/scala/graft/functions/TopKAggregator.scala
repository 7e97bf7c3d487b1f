package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One (score, key) entry of a bounded top-k buffer. */
case class ScoredKey(bal: Double, key: Long)

/** Exact bounded top-k as a typed `Aggregator` (the custom-UDAF surface,
  * SURVEY.md §2.2): per group, the k largest entries by (bal desc, key asc).
  *
  * Scale rationale: the window formulation (`row_number() over (partition
  * by g order by ...) <= k`) shuffles EVERY row to its group's partition
  * before ranking. This aggregator is map-side combinable — each partition
  * keeps at most k entries per group, so the shuffle carries k rows per
  * (partition, group) instead of the whole table. At 100 TB that is the
  * difference between shuffling the corpus and shuffling a bounded digest.
  *
  * The buffer is kept sorted and bounded at k (insertion cost O(k) per row
  * for the small k this is meant for — top-3/top-100, not top-1M).
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredKey, Seq[ScoredKey], Seq[ScoredKey]] {

  private def ord: Ordering[ScoredKey] =
    Ordering.by((e: ScoredKey) => (-e.bal, e.key))

  override def zero: Seq[ScoredKey] = Vector.empty

  override def reduce(buf: Seq[ScoredKey], a: ScoredKey): Seq[ScoredKey] =
    if (buf.size >= k && ord.lteq(buf.last, a)) buf
    else ((buf :+ a).sorted(ord)).take(k)

  override def merge(b1: Seq[ScoredKey], b2: Seq[ScoredKey]): Seq[ScoredKey] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(r: Seq[ScoredKey]): Seq[ScoredKey] = r

  override def bufferEncoder: Encoder[Seq[ScoredKey]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredKey]]()

  override def outputEncoder: Encoder[Seq[ScoredKey]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredKey]]()
}
