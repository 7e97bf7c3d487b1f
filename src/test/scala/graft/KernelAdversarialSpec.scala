package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, TextAnalysis}

/** Adversarial-input parity for every native kernel vs its declarative
  * formulation: the strings below exercise the tokenization edge cases
  * (leading/trailing/double spaces -> empty tokens, unicode, long
  * repetition runs, single chars) where a hand-rolled kernel and the HOF
  * chain could plausibly diverge.
  */
class KernelAdversarialSpec extends AnyFunSuite with SparkSpec {

  private val adversarial = Seq(
    " ", "  ", "a", " a", "a ", "a  b", "  a b c  ",
    "Iñtërnâtiônàlizætiøn ✓ 漢字 テスト données",
    "的 是 了 的 是 了 的 是 了",
    ("x " * 500).trim, ("a b c " * 200).trim,
    "tab\tinside token", "emoji 😀 token 😀 emoji",
    "a-b c_d e.f g,h", "UPPER lower MiXeD UPPER lower"
  )

  private def df = {
    import spark.implicits._
    adversarial.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("minhash: narrow kernel equals aggregate form on adversarial strings") {
    val agg = Dedup.minhashSignatures(
      Dedup.shinglesAll(df, "doc_id", "text"), k = 8)
    val narrow = Dedup.minhashSignaturesNarrow(df, "doc_id", "text", k = 8)
    assert(narrow.count() === agg.count())
    assert(narrow.exceptAll(agg).count() === 0)
  }

  test("simhash: narrow kernel equals aggregate form on adversarial strings") {
    val agg = Dedup.simhash(df, "doc_id", "text")
    val narrow = Dedup.simhashNarrow(df, "doc_id", "text")
    assert(narrow.exceptAll(agg).count() === 0)
    assert(agg.exceptAll(narrow).count() === 0)
  }

  test("shingles: native kernel equals HOF form on adversarial strings") {
    val hof = df.select(col("doc_id").as("id"),
      explode(array_distinct(Dedup.shingleArray(
        TextAnalysis.tokens(col("text")), 3))).as("shingle"))
    val native = Dedup.shingles(df, "doc_id", "text")
    assert(native.exceptAll(hof).count() === 0)
    assert(hof.exceptAll(native).count() === 0)
  }

  test("repetition ratio: native kernel equals HOF form on adversarial strings") {
    val toks = TextAnalysis.tokens(col("text"))
    val n = size(toks)
    val grams = when(n >= 2, sequence(lit(0), n - 2))
      .otherwise(array().cast("array<int>"))
    val g = transform(grams, i =>
      concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2)))
    val hof = when(size(g) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(g)).cast("double") / size(g))
    val mismatches = df.filter(
      TextAnalysis.repetitionRatio(col("text")) =!= hof).count()
    assert(mismatches === 0)
  }
}
