package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass distinct-shingle kernel shared by interpreted eval and codegen. */
object ShingleUtil {

  /** Distinct word n-gram shingles of `s` in first-occurrence order:
    * single-space tokenization (empties kept), shingles joined by a space —
    * identical to array_distinct(transform(sequence(...), i ->
    * concat_ws(' ', t[i] .. t[i+n-1]))) but one compiled pass with a hash
    * set instead of interpreted per-position lambdas. Empty array (not
    * null) when the document has fewer than n tokens, matching the HOF
    * form's otherwise(array()).
    */
  def distinctShingles(s: UTF8String, n: Int): GenericArrayData = {
    val toks = s.toString.split(" ", -1)
    val m = toks.length - n + 1
    if (m <= 0) new GenericArrayData(new Array[Any](0))
    else {
      val seen = new java.util.LinkedHashSet[String](m * 2)
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
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    }
  }
}

/** Native codegen'd distinct word n-gram shingles: text -> array<string>.
  *
  * Why native: the declarative form is transform (interpreted lambda with
  * n element_at + concat_ws per position) followed by array_distinct —
  * several interpreted passes over every document on the hottest path of
  * every Jaccard/decontamination pipeline. This is one compiled pass.
  * Row-set semantics after explode are identical (asserted in
  * NativeShinglesSpec), so all shingle-derived oracles are unchanged.
  */
case class DistinctShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be positive, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires a string argument, got ${child.dataType}")
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(v: Any): Any =
    ShingleUtil.distinctShingles(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.distinctShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): DistinctShingles =
    copy(child = newChild)
}

object NativeShingles {
  import org.apache.spark.sql.GraftSqlShim

  /** Column-API surface of [[DistinctShingles]]. */
  def distinctShinglesNative(text: Column, n: Int): Column =
    GraftSqlShim.column(DistinctShingles(GraftSqlShim.expression(text), n))
}
