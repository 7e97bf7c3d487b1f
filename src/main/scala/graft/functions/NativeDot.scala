package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static kernel shared by interpreted eval and generated code. */
object DotUtil {
  /** Exact integer dot product of two long arrays (shorter length wins,
    * matching zip_with's null-free semantics on equal-length inputs).
    */
  def dotQ(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }
}

/** Native Catalyst expression for the quantized-vector dot product
  * (Similarity.dotQ's hot loop). The built-in formulation
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` routes through
  * HigherOrderFunction lambda evaluation — interpreted per element, and it
  * materializes the intermediate product array. This is a tight primitive
  * loop that stays inside whole-stage codegen via doGenCode: one static
  * call, no allocation. Every ANN/near-dup query evaluates it
  * |candidates| × dim times, so this is the single hottest scalar kernel
  * in the similarity family.
  */
case class DotProductQ(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dotq requires two array<bigint> arguments, got ${left.dataType}, ${right.dataType}")
  }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dotq"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotUtil.dotQ(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotUtil.dotQ($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductQ =
    copy(left = newLeft, right = newRight)
}

object NativeDot {
  import org.apache.spark.sql.GraftSqlShim

  /** Column-API surface of [[DotProductQ]]. */
  def dotQNative(a: Column, b: Column): Column =
    GraftSqlShim.column(DotProductQ(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
}
