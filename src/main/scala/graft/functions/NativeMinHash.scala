package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash kernel shared by interpreted eval and generated code. */
object MinHashUtil {
  private val P31 = 2147483647L // 2^31 - 1, matches TextAnalysis.P31

  /** Affine permutation params — MUST stay identical to Dedup.mhA/mhB (the
    * aggregate formulation and every DuckDB oracle embed these formulas).
    */
  def a(j: Int): Long = { val v = (2654435761L * j) % P31; if (v == 0L) 1L else v }
  def b(j: Int): Long = (40503L * j.toLong * j + 2531011L) % P31

  /** k MinHash values over word n-gram shingles of `s` in one pass:
    * single-space tokenization (empties kept), shingles joined by a space,
    * h = md5-prefix-48 % P31 per shingle, mh_j = min((h*a_j + b_j) % P31).
    * Numerically identical to explode(shingles) -> hash31 -> k min() aggs
    * (min is duplicate-insensitive, so no distinct needed). Returns null
    * when the document has fewer than n tokens — mirroring the aggregate
    * formulation, where such documents produce no shingle rows and are
    * absent from the grouped output.
    */
  def sig(s: UTF8String, n: Int, k: Int): GenericArrayData = {
    val toks = s.toString.split(" ", -1)
    val m = toks.length - n + 1
    if (m <= 0) null
    else {
      val as = new Array[Long](k)
      val bs = new Array[Long](k)
      var q = 0
      while (q < k) { as(q) = a(q + 1); bs(q) = b(q + 1); q += 1 }
      val mins = Array.fill(k)(Long.MaxValue)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        val h = HashUtil.md5Prefix48(
          UTF8String.fromString(sb.toString)) % P31
        q = 0
        while (q < k) {
          val v = (h * as(q) + bs(q)) % P31
          if (v < mins(q)) mins(q) = v
          q += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
  }
}

/** Native codegen'd MinHash signature: text -> array<long> of k minhashes
  * over word n-gram shingles.
  *
  * Why native: the declarative chain (shingle transform -> explode ->
  * groupBy(id).agg(k mins)) shuffles the entire exploded shingle corpus —
  * roughly n× the text volume — just to compute a per-document value. This
  * expression is a narrow map stage: zero shuffle, one md5 per shingle,
  * all k permutations folded in the same pass. At 100 TB that turns the
  * signature stage from the dominant exchange into a scan-side projection.
  * Arithmetic is bit-identical to the aggregate formulation (asserted in
  * NativeMinHashSpec), so the DuckDB oracles for l06/l07 are unchanged.
  */
case class MinHashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  require(n >= 1 && k >= 1, s"n and k must be positive, got n=$n k=$k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires a string argument, got ${child.dataType}")
  override def prettyName: String = "graft_minhash"

  // may return null for short docs — hence the isNull reassignment below
  override def nullSafeEval(v: Any): Any =
    MinHashUtil.sig(v.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashUtil.sig($c, $n, $k);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object NativeMinHash {
  import org.apache.spark.sql.GraftSqlShim

  /** Column-API surface of [[MinHashSig]]. */
  def minhashNative(text: Column, n: Int, k: Int): Column =
    GraftSqlShim.column(MinHashSig(GraftSqlShim.expression(text), n, k))
}
