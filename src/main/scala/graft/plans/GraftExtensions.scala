package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point — registers graft's native
  * expressions under SQL names so `spark.sql` users (and SQL-text
  * pipelines) can call them:
  *
  *   SparkSession.builder
  *     .withExtensions(new GraftExtensions)           // programmatic
  *   // or: spark.sql.extensions=graft.plans.GraftExtensions
  *
  * DataFrame callers don't need this (functions.Vectors builds the
  * expression tree directly); registration is additive.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "float_vec_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2,
          s"float_vec_dot expects 2 arguments, got ${children.length}")
        FloatVecDot(children.head, children(1))
      }))
  }
}
