package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** The narrow native MinHash kernel must be bit-identical to the
  * explode+groupBy aggregate formulation — that identity is what lets
  * l06/l07 keep their DuckDB oracles while the Spark side computes
  * signatures with zero shuffle.
  */
class NativeMinHashSpec extends AnyFunSuite with SparkSpec {

  private val K = 32

  test("narrow signatures equal aggregate signatures on real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val agg = Dedup.minhashSignatures(
      Dedup.shinglesAll(docs, "doc_id", "text"), k = K)
    val narrow = Dedup.minhashSignaturesNarrow(docs, "doc_id", "text", k = K)
    assert(narrow.count() === agg.count())
    // anti-join on ALL columns: any value difference leaves a row
    val mismatches = narrow.join(agg,
      (1 to K).map(j => narrow(s"mh_$j") === agg(s"mh_$j"))
        .foldLeft(narrow("id") === agg("id"))(_ && _), "left_anti").count()
    assert(mismatches === 0)
  }

  test("documents with fewer than n tokens are absent in both forms") {
    import spark.implicits._
    val df = Seq((1L, "one two"), (2L, "one two three four")).toDF("doc_id", "text")
    val agg = Dedup.minhashSignatures(
      Dedup.shinglesAll(df, "doc_id", "text"), k = 4)
    val narrow = Dedup.minhashSignaturesNarrow(df, "doc_id", "text", k = 4)
    assert(agg.select("id").as[Long].collect().toSeq === Seq(2L))
    assert(narrow.select("id").as[Long].collect().toSeq === Seq(2L))
  }

  test("null text is dropped, not nulled") {
    import spark.implicits._
    val df = Seq((1L, Option("a b c d")), (2L, None: Option[String]))
      .toDF("doc_id", "text")
    val narrow = Dedup.minhashSignaturesNarrow(df, "doc_id", "text", k = 2)
    assert(narrow.select("id").as[Long].collect().toSeq === Seq(1L))
  }

  test("narrow plan has no exchange and evaluates the kernel once") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Dedup.minhashSignaturesNarrow(docs, "doc_id", "text", k = K)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
    val kernelCalls = "graft_minhash".r.findAllIn(plan).size
    assert(kernelCalls === 1,
      s"kernel must appear exactly once (CollapseProject would duplicate it x$K):\n$plan")
  }
}
