package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, TextAnalysis}

/** The native distinct-shingle kernel must produce the identical row set
  * as array_distinct over the HOF shingleArray — that identity keeps every
  * shingle-derived oracle (l07/l08/l24, the dedup index) valid.
  */
class NativeShinglesSpec extends AnyFunSuite with SparkSpec {

  private def hofShingles(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id").as("id"),
      explode(array_distinct(Dedup.shingleArray(
        TextAnalysis.tokens(col("text")), 3))).as("shingle"))

  test("native shingles equal HOF shingles on real corpus (exact multiset)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val native = Dedup.shingles(docs, "doc_id", "text")
    val hof = hofShingles(docs)
    assert(native.count() === hof.count())
    assert(native.exceptAll(hof).count() === 0)
    assert(hof.exceptAll(native).count() === 0)
  }

  test("short and empty docs yield no shingle rows in both forms") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "a b"), (3L, "a b c")).toDF("doc_id", "text")
    assert(Dedup.shingles(df, "doc_id", "text").count() === 1)
    assert(hofShingles(df).count() === 1)
  }

  test("first-occurrence order matches array_distinct semantics") {
    import spark.implicits._
    val df = Seq((1L, "x y z x y z x y")).toDF("doc_id", "text")
    val native = df.select(graft.functions.NativeShingles
      .distinctShinglesNative(col("text"), 3).as("a")).head.getSeq[String](0)
    val hof = df.select(array_distinct(Dedup.shingleArray(
      TextAnalysis.tokens(col("text")), 3)).as("a")).head.getSeq[String](0)
    assert(native === hof)
    assert(native === Seq("x y z", "y z x", "z x y"))
  }
}
