package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextAnalysis

/** The native codegen'd RepetitionRatio must be numerically identical to
  * the HOF formulation it replaced (transform + array_distinct over
  * 2-grams) — that identity keeps the l17/l27/l33 oracles portable to
  * DuckDB, whose SQL mirrors the HOF arithmetic.
  */
class NativeTextStatsSpec extends AnyFunSuite with SparkSpec {

  /** The original column-function formulation, kept here as the oracle. */
  private def hofRepetition(text: org.apache.spark.sql.Column) = {
    val toks = TextAnalysis.tokens(text)
    val n = size(toks)
    val grams = when(n >= 2, sequence(lit(0), n - 2))
      .otherwise(array().cast("array<int>"))
    val g = transform(grams, i =>
      concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2)))
    when(size(g) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(g)).cast("double") / size(g))
  }

  test("native repetition ratio equals HOF formulation") {
    import spark.implicits._
    val df = Seq(
      "", "one", "a b", "a b a b a b", "the the the the",
      "x y z x y z w", "  leading double space", "Iñtë rnâtiô nàl ✓ Iñtë rnâtiô"
    ).toDF("text")
    val n = df.filter(
      TextAnalysis.repetitionRatio(col("text")) =!= hofRepetition(col("text"))
    ).count()
    assert(n === 0)
  }

  test("native repetition ratio on real corpus matches HOF bit-for-bit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.filter(
      TextAnalysis.repetitionRatio(col("text")) =!= hofRepetition(col("text"))
    ).count()
    assert(n === 0)
  }

  test("null text -> null ratio") {
    import spark.implicits._
    val rows = Seq(Some("a b a b"), None).toDF("text")
      .select(TextAnalysis.repetitionRatio(col("text")).as("r"))
      .collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
  }

  test("langId: argmax with earliest-code tie-break, und on zero hits") {
    import spark.implicits._
    val df = Seq(
      ("en beats others", "the of and is to x"),
      ("de/en tie -> de (earliest)", "der die the of"),
      ("no markers", "zzz qqq"),
      ("zh", "的 是 了")
    ).toDF("label", "text")
    val got = df.select(col("label"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("en beats others") === "en")
    assert(got("de/en tie -> de (earliest)") === "de")
    assert(got("no markers") === "und")
    assert(got("zh") === "zh")
  }
}
