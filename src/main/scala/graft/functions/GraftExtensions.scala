package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration (the deployment path on a real cluster:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`): injects
  * the engine's native Catalyst expressions into the function registry so
  * `spark.sql` users get them without any Scala import. The SQL-UDF layer
  * ([[GraftFunctions.register]]) complements this with the inlined
  * expression-bodied functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_hash48_native"),
      new ExpressionInfo(classOf[Md5Prefix48].getName, "graft_hash48_native"),
      (args: Seq[Expression]) => Md5Prefix48(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_dotq"),
      new ExpressionInfo(classOf[DotProductQ].getName, "graft_dotq"),
      (args: Seq[Expression]) => DotProductQ(args.head, args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_rep_ratio"),
      new ExpressionInfo(classOf[RepetitionRatio].getName, "graft_rep_ratio"),
      (args: Seq[Expression]) => RepetitionRatio(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash48].getName, "graft_simhash"),
      (args: Seq[Expression]) => SimHash48(args.head)))
    // n/k arrive as int literals from SQL: graft_minhash(text, 3, 32)
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (args: Seq[Expression]) => MinHashSig(args.head,
        intLit(args(1), "n"), intLit(args(2), "k"))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[DistinctShingles].getName, "graft_shingles"),
      (args: Seq[Expression]) => DistinctShingles(args.head, intLit(args(1), "n"))))
  }

  private def intLit(e: Expression, name: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }
}
