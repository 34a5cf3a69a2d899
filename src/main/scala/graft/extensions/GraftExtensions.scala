package graft.extensions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{DotProduct, WelchTTest}

/** Session extension registering the engine's custom expressions as SQL
  * functions, so `spark.sql("SELECT welch_t(...)")` /
  * `spark.sql("SELECT dot_product(...)")` work for SQL-only users
  * (activate with
  * `.config("spark.sql.extensions", classOf[GraftExtensions].getName)`
  * or `.withExtensions`).
  *
  * This is the (c)-tier of the custom-operator ladder (SURVEY §7.3):
  * injected scalar functions; no custom Rule or Strategy is needed —
  * every other operator is expressible with stock Catalyst plans.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("welch_t"),
      new ExpressionInfo(classOf[WelchTTest].getName, "welch_t"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WelchTTest(args)))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName,
        "dot_product"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 2,
          s"dot_product takes 2 arguments, got ${args.length}")
        DotProduct(args(0), args(1))
      }))
  }
}
