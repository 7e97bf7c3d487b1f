package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** The narrow native SimHash kernel must be bit-identical to the
  * explode+groupBy aggregate formulation — that identity keeps the
  * l09/l10 DuckDB oracles valid while the Spark side computes signatures
  * with zero shuffle.
  */
class NativeSimHashSpec extends AnyFunSuite with SparkSpec {

  test("narrow simhash equals aggregate simhash on real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val agg = Dedup.simhash(docs, "doc_id", "text")
    val narrow = Dedup.simhashNarrow(docs, "doc_id", "text")
    assert(narrow.count() === agg.count())
    val mismatches = narrow.join(agg,
      narrow("id") === agg("id") && narrow("simhash") === agg("simhash"),
      "left_anti").count()
    assert(mismatches === 0)
  }

  test("null text dropped in both forms; empty text agrees") {
    import spark.implicits._
    val df = Seq((1L, Option("a b c")), (2L, None: Option[String]),
      (3L, Option(""))).toDF("doc_id", "text")
    val agg = Dedup.simhash(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val narrow = Dedup.simhashNarrow(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(agg.keySet === Set(1L, 3L))
    assert(narrow === agg)
  }

  test("narrow plan is shuffle-free") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Dedup.simhashNarrow(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
  }
}
