package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, BinaryArithmetic, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Oracle-parity lint: the driver hash-compares every query against DuckDB,
  * and round 2's only red row (q54) was a decimal→double cast whose result
  * fed a division — the cast of a terminal column is correctly rounded in
  * both engines (dozens of r2-green columns prove it), but once the cast
  * result participates in further arithmetic the oracle engine is free to
  * algebraically rewrite the expression (fold a double-cast division back
  * into a decimal division, use a reciprocal multiply, …), and the rewrite
  * is not bit-stable across DuckDB versions.
  *
  * Rule enforced here, over the ANALYZED plan (including subquery plans)
  * of every oracle-compared query: a `Cast(decimal → double)` may appear
  * only as a TERMINAL cast — never as a descendant of arithmetic
  * (+ - * / %). Ratios/averages must be either integer-exact (int/int →
  * one IEEE division, like jaccard/cosine/BM25) or routed through exact
  * integral division at fixed resolution (q54 share_ppb; q01/q15/q26/q35/
  * q36 micro averages — Spark `div` and DuckDB `//` both truncate toward
  * zero, verified for all sign combinations).
  */
class OracleParitySpec extends AnyFunSuite with SparkSpec {

  /** q38's corr/slope algebra (n·sxy−sx·sy over √ of like products) cannot
    * stay in decimals — the cross-products exceed the 38-digit cap at scale
    * (the reason its Scaladoc documents double algebra) — and its output is
    * rendered at fixed %.6f precision on both sides, which absorbs sub-ulp
    * cast divergence except at astronomically improbable rounding
    * boundaries. Pinned consciously; r2-green.
    */
  private val allowlist = Set("q38_stats_corr")

  /** Scale-0 decimals are EXEMPT: casting an integral decimal to double is
    * a plain integer→double conversion, correctly rounded identically in
    * every engine (q56 builds on this — its moment sums are integral
    * cents for exactly that reason). The ulp hazard this lint guards
    * against is FRACTIONAL-scale casts, where an engine may divide the
    * scaled integer by 10^scale in double (two roundings) instead of
    * converting the exact decimal value (one) — observed as q54's and
    * q56-draft's 1-ulp drift.
    */
  private def decimalToDoubleCasts(e: Expression): Seq[Cast] = e.collect {
    case c @ Cast(child, DoubleType, _, _)
      if child.dataType.isInstanceOf[DecimalType] &&
        child.dataType.asInstanceOf[DecimalType].scale != 0 => c
  }

  /** All Cast(decimal→double) nodes that sit strictly below an arithmetic
    * operator anywhere in the expression tree.
    */
  private def castsUnderArithmetic(e: Expression): Seq[Cast] = e.collect {
    case a: BinaryArithmetic => a.children.flatMap(decimalToDoubleCasts)
  }.flatten

  /** The plan plus every subquery plan hanging off its expressions,
    * recursively (scalar/correlated subqueries carry their own plans that
    * `plan.expressions` alone would not traverse).
    */
  private def withSubqueryPlans(p: LogicalPlan): Seq[LogicalPlan] =
    p +: p.flatMap(node => node.expressions.flatMap(_.collect {
      case s: SubqueryExpression => withSubqueryPlans(s.plan)
    }).flatten)

  test("no oracle-compared query feeds a decimal→double cast into arithmetic") {
    val offenders = SparkEntry.all.toSeq.sortBy(_._1).flatMap { case (name, d) =>
      if (d.oracle.isEmpty || allowlist.contains(name)) None
      else {
        val plans = withSubqueryPlans(d.fn(spark, sf0001).queryExecution.analyzed)
        val bad = plans.flatMap(_.flatMap(node =>
          node.expressions.flatMap(castsUnderArithmetic)))
        if (bad.nonEmpty) Some(s"$name: ${bad.map(_.sql).distinct.mkString("; ")}")
        else None
      }
    }
    assert(offenders.isEmpty,
      s"decimal→double cast under arithmetic (q54-class ulp hazard):\n${offenders.mkString("\n")}")
  }
}
