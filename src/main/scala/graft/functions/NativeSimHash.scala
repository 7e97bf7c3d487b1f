package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass 48-bit SimHash kernel shared by interpreted eval and codegen. */
object SimHashUtil {

  /** 48-bit SimHash over unigram token hashes: single-space tokenization
    * (empties kept), h = md5-prefix-48 per token, per-bit counter +=
    * (bit ? +1 : -1), result sets bit b iff counter_b > 0. Numerically
    * identical to the aggregate formulation in Dedup.simhash
    * (sum(2*bit-1) per bit, then when(>0, 1L<<b)).
    */
  def sim48(s: UTF8String): Long = {
    val toks = s.toString.split(" ", -1)
    val counts = new Array[Int](48)
    var i = 0
    while (i < toks.length) {
      val h = HashUtil.md5Prefix48(UTF8String.fromString(toks(i)))
      var b = 0
      while (b < 48) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 48) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Native codegen'd 48-bit SimHash: text -> long, one narrow pass.
  *
  * Why native: the declarative chain (explode(tokens) -> groupBy(id) with
  * 48 bit-count sums) shuffles the entire exploded token corpus to compute
  * a per-document scalar. This expression folds the per-bit counters in
  * one pass per row — zero shuffle, one md5 per token. Values are
  * bit-identical to Dedup.simhash's aggregate form (NativeSimHashSpec),
  * so the l09/l10 DuckDB oracles are unchanged.
  */
case class SimHash48(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires a string argument, got ${child.dataType}")
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(v: Any): Any =
    SimHashUtil.sim48(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.sim48($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)
}

object NativeSimHash {
  import org.apache.spark.sql.GraftSqlShim

  /** Column-API surface of [[SimHash48]]. */
  def simhashNative(text: Column): Column =
    GraftSqlShim.column(SimHash48(GraftSqlShim.expression(text)))
}
