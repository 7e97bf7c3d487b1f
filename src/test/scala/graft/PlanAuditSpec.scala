package graft

import org.scalatest.funsuite.AnyFunSuite

/** Repo-wide plan audit: EVERY declared query's physical plan is swept for
  * the scale anti-patterns that must never regress:
  *
  *  - `CartesianProduct` — an unbounded n×m join. The engine's only
  *    nested-loop joins are broadcast ones (BroadcastNestedLoopJoin with a
  *    1-row/tiny build side: brute-force ANN queries, centroid frames),
  *    which are deliberate and bounded.
  *  - RDD lineage in a query plan (`Scan ExistingRDD`) — would mean a
  *    collect+parallelize round-trip hiding a driver bottleneck.
  *
  * Plans are built (not executed) on sf0.001, so the sweep is cheap; AQE
  * replacements only ever turn sort-merge joins INTO broadcast joins,
  * never into cartesian products, so auditing the initial plan is
  * conservative for these patterns.
  */
class PlanAuditSpec extends AnyFunSuite with SparkSpec {

  /** localCheckpoint-based lineage truncation surfaces as `Scan
    * ExistingRDD` but keeps data distributed on executors — it is the
    * documented pattern for iterative algorithms, not a driver round-trip.
    * Only the iterative connected-components queries may carry it.
    */
  private val rddAllowlist =
    Set("l20_dedup_clusters", "l44_survivor_by_rank", "l45_dedup_clusters_star",
      "l61_dedup_savings", "l68_cluster_purity",
      "l83_semantic_dedup", // components() inside semanticDedup
      "l87_survivor_changelog", // components() twice: before + contracted
      "l96_pagerank", // per-iteration lineage truncation in Graph.pageRank
      "l100_seed_quality_rank", // same truncation in personalizedPageRank
      "l104_bpe_segment", // joins bpeTrain's per-iteration-checkpointed
                          // word table (vocabulary-sized, executor-held)
      "l135_bpe_encode",  // same: bpeEncode folds merges over the
                          // checkpointed unique-word table
      "l136_bpe_pack",    // packSequences on top of the l135 chain
      "l144_byte_fallback", // bpeEncode's checkpointed word table again
                            // (frozen-vocab byte-fallback variant)
      "l113_pps_global")  // ppsSampleGlobal's eager localCheckpoint pins
                          // the range-exchange cuts so both prefix-sum
                          // phases see one layout (executor-held, never
                          // collected)

  test("no query plan contains a CartesianProduct or driver RDD round-trip") {
    val offenders = SparkEntry.all.toSeq.sortBy(_._1).flatMap { case (name, d) =>
      val plan = d.fn(spark, sf0001).queryExecution.executedPlan.toString
      val bad = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "Scan ExistingRDD" -> (plan.contains("Scan ExistingRDD") &&
          !rddAllowlist.contains(name))
      ).collect { case (label, true) => label }
      if (bad.nonEmpty) Some(s"$name: ${bad.mkString(", ")}") else None
    }
    assert(offenders.isEmpty, s"scale anti-patterns found:\n${offenders.mkString("\n")}")
  }
}
