package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook for the engine's native functions —
  * the idiomatic injection path for cluster deployments:
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * (VecDot.register covers already-built sessions, e.g. tests and the
  * driver-run mains.) Catalyst rules/strategies are deliberately NOT
  * injected: per SURVEY.md §4.2, every operator in the surface is
  * expressible with built-in plans, and the only justified custom
  * extension point so far is the scalar vec_dot expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("h60"),
      new ExpressionInfo(classOf[H60].getName, "h60"),
      (args: Seq[Expression]) => H60(args.head)))
    ext.injectFunction((
      FunctionIdentifier("shingle3"),
      new ExpressionInfo(classOf[Shingle3].getName, "shingle3"),
      (args: Seq[Expression]) => Shingle3(args.head)))
    ext.injectFunction((
      FunctionIdentifier("winnow4"),
      new ExpressionInfo(classOf[Winnow4].getName, "winnow4"),
      (args: Seq[Expression]) => Winnow4(args.head)))
  }
}
