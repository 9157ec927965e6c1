package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, MinHashAgg}

/** SparkSessionExtensions hook: registers the engine's custom
  * expressions for SQL users, so `spark.sql("SELECT dot_product(a,b)
  * ...")` works the same as the Scala API — the library is usable
  * from pure-SQL clients (JDBC/thrift) too.
  *
  * Activate with `.withExtensions(new GraftExtensions)` (GraftSession
  * does) or `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.RangeJoinStrategy)
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        // the permutation count must be a compile-time constant — a
        // column here would otherwise surface as an obscure runtime
        // ClassCastException instead of an analysis error
        if (args.length != 2 || !args(1).foldable) {
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "USER_RAISED_EXCEPTION",
            messageParameters = Map("errorMessage" ->
              "minhash_sig(col, numPerm) requires a literal numPerm"))
        }
        val n = args(1).eval().asInstanceOf[Number].intValue()
        MinHashAgg(args.head, n).toAggregateExpression()
      }))
  }
}
