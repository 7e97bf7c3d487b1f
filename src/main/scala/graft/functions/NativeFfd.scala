package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass first-fit-decreasing kernel shared by interpreted eval and
  * codegen (the HOF `aggregate` fold form of this loop measured ~25 µs
  * per interpreted lambda call — quadratic in items, it turned a
  * 1,250-doc shard into minutes; this is the same loop as primitive
  * JVM arithmetic).
  */
object FfdUtil {

  /** `items` = array of (nc, id, cnt) structs ALREADY sorted by
    * (nc = -cnt ASC, id ASC); returns (id, bin, cnt) per item in the
    * same order. A document with cnt > seqLen opens its own bin
    * (negative remainder admits nothing after it); otherwise the item
    * goes to the LOWEST-index bin with remaining capacity >= cnt, a new
    * bin if none fits.
    */
  def pack(items: ArrayData, seqLen: Long): GenericArrayData = {
    val n = items.numElements()
    var rem = new Array[Long](math.max(4, n / 4))
    var nBins = 0
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val row = items.getStruct(i, 3)
      val id = row.getLong(1)
      val cnt = row.getLong(2)
      var bin = -1
      if (cnt <= seqLen) {
        var j = 0
        while (j < nBins && bin < 0) {
          if (rem(j) >= cnt) bin = j
          j += 1
        }
      }
      if (bin < 0) {
        if (nBins == rem.length) {
          val g = new Array[Long](rem.length * 2)
          System.arraycopy(rem, 0, g, 0, rem.length)
          rem = g
        }
        bin = nBins
        rem(nBins) = seqLen - cnt
        nBins += 1
      } else rem(bin) -= cnt
      out(i) = InternalRow(id, bin.toLong, cnt)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native codegen'd per-shard first-fit-decreasing packing:
  * array<struct<nc,id,cnt>> (pre-sorted) × seqLen →
  * array<struct<id,bin,cnt>>. Evaluates once per SHARD row, so the
  * imperative O(items·bins) loop replaces millions of interpreted
  * lambda invocations with primitive long arithmetic.
  */
case class FfdPack(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bin", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StructType(fs), _)
        if fs.length == 3 && fs.forall(_.dataType == LongType) =>
      if (right.dataType == LongType || right.dataType == IntegerType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_ffd_pack seqLen must be integral, got ${right.dataType}")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_ffd_pack requires array<struct<bigint,bigint,bigint>>, got $t")
  }

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_ffd_pack"

  private def asLong(v: Any): Long = v match {
    case i: Integer => i.longValue()
    case l: java.lang.Long => l.longValue()
    case l: Long => l
    case i: Int => i.toLong
  }

  override def nullSafeEval(items: Any, len: Any): Any =
    FfdUtil.pack(items.asInstanceOf[ArrayData], asLong(len))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, l) =>
      s"graft.functions.FfdUtil.pack($a, (long) $l)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FfdPack = copy(left = newLeft, right = newRight)
}

object NativeFfd {
  import org.apache.spark.sql.GraftSqlShim

  /** Column-API surface of [[FfdPack]]. */
  def ffdPack(items: Column, seqLen: Column): Column =
    GraftSqlShim.column(FfdPack(GraftSqlShim.expression(items),
      GraftSqlShim.expression(seqLen)))
}
