package graft

import graft.functions.LongArrayDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Config-driven extension entry point:
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`) registers the
  * engine's native functions in every session created against the config —
  * the standard deployment path for a library shipping custom Catalyst
  * expressions (SURVEY.md §7.4). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("long_array_dot"),
      new ExpressionInfo(classOf[LongArrayDot].getName, null, "long_array_dot"),
      (children: Seq[Expression]) => LongArrayDot(children.head, children(1))))
  }
}
