package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by interpreted eval and generated code. */
object TextStatsUtil {

  /** Duplicate-2-gram fraction: 1 - distinct(2grams)/count(2grams) over
    * single-space tokenization (empties kept) — numerically identical to
    * the HOF formulation
    * `1 - size(array_distinct(g))/size(g)` with
    * `g = transform(sequence(0, n-2), i -> concat_ws(' ', t[i], t[i+1]))`,
    * but one compiled pass with a hash set instead of four interpreted
    * lambda evaluations of the gram array per row.
    */
  def repetitionRatio(s: UTF8String): Double = {
    val toks = s.toString.split(" ", -1)
    val n = toks.length - 1
    if (n < 1) 0.0
    else {
      val seen = new java.util.HashSet[String](n * 2)
      var distinct = 0
      var i = 0
      while (i < n) {
        if (seen.add(toks(i) + " " + toks(i + 1))) distinct += 1
        i += 1
      }
      1.0 - distinct.toDouble / n
    }
  }
}

/** Native codegen'd repetition-ratio (the Gopher duplicate-2-gram signal).
  *
  * Why native: the column-function formulation is a HigherOrderFunction
  * tree (transform + array_distinct + three size() references to the same
  * gram array). HOFs are CodegenFallback — interpreted lambdas per element
  * — and subexpression elimination does not always cover repeated HOF
  * subtrees (measured 6-7 s for a 50k-doc FILTER at sf0.1 vs ~0.3 s for
  * this expression; the filter context was the pathological one). Same
  * pattern as [[Md5Prefix48]] / DotProductQ: hot scalar kernel -> native
  * Expression with a single static-call codegen.
  */
case class RepetitionRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rep_ratio requires a string argument, got ${child.dataType}")
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_rep_ratio"

  override def nullSafeEval(v: Any): Any =
    TextStatsUtil.repetitionRatio(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsUtil.repetitionRatio($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionRatio =
    copy(child = newChild)
}

object NativeTextStats {
  import org.apache.spark.sql.GraftSqlShim

  /** Column-API surface of [[RepetitionRatio]]. */
  def repetitionRatioNative(c: Column): Column =
    GraftSqlShim.column(RepetitionRatio(GraftSqlShim.expression(c)))
}
