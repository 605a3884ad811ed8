package graft.core

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.expressions.{DotProduct, PolyHash}

/** SparkSessionExtensions entry point: registers the engine's native SQL
  * functions so `spark.sql("SELECT graft_polyhash(x) ...")` works on any
  * cluster launched with
  * `--conf spark.sql.extensions=graft.core.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // optimizer rules: inert unless their conf is set (RangeJoinRewrite
    // fires only with spark.graft.rangeJoin.bucketWidth)
    ext.injectOptimizerRule(session => graft.plans.RangeJoinRewrite(session))
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      ("graft_polyhash",
        info("graft_polyhash",
          "graft_polyhash(str) - engine-portable polynomial rolling hash " +
            "((h*31+cp) % 1000000007 over code points)"),
        (args: Seq[Expression]) => {
          require(args.length == 1, "graft_polyhash takes one argument")
          PolyHash(args.head)
        }),
      ("graft_dot",
        info("graft_dot",
          "graft_dot(a, b) - left-to-right dot product of two " +
            "array<float|double> columns (deterministic summation order)"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "graft_dot takes two arguments")
          DotProduct(args(0), args(1))
        }))

  /** Register the same functions on an already-running session (local
    * tooling / tests — builder-time extensions only apply to new
    * sessions).
    */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), i, builder)
    }
}
