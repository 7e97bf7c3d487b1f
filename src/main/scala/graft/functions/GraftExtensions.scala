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
  }
}
