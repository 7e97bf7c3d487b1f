package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers called from both interpreted eval and generated code. */
object HashUtil {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 48 bits of md5(s) as an unsigned big-endian long — numerically
    * identical to `CAST(CONV(SUBSTRING(MD5(s),1,12),16,10) AS BIGINT)` and
    * DuckDB's `CAST('0x'||substr(md5(s),1,12) AS BIGINT)`, but with no hex
    * string materialization or base-16 re-parse.
    */
  def md5Prefix48(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    ((dig(0) & 0xffL) << 40) | ((dig(1) & 0xffL) << 32) |
      ((dig(2) & 0xffL) << 24) | ((dig(3) & 0xffL) << 16) |
      ((dig(4) & 0xffL) << 8) | (dig(5) & 0xffL)
  }
}

/** Native Catalyst expression for the engine's portable 48-bit content hash
  * (TextAnalysis.hash48). Stays inside whole-stage codegen via doGenCode —
  * the generated code is a single static call, vs the built-in composition
  * md5 (hex string) -> substring -> conv (string base parse) -> cast.
  */
case class Md5Prefix48(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hash48_native requires a string argument, got ${child.dataType}")
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hash48_native"

  override def nullSafeEval(v: Any): Any =
    HashUtil.md5Prefix48(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.md5Prefix48($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix48 =
    copy(child = newChild)
}

object NativeHash {
  import org.apache.spark.sql.GraftSqlShim

  /** Column-API surface of [[Md5Prefix48]]. */
  def hash48Native(c: Column): Column =
    GraftSqlShim.column(Md5Prefix48(GraftSqlShim.expression(c)))
}
