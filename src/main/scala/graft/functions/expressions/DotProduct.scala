package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native left-to-right dot product of two float/double array columns.
  *
  * Exists because the composable form —
  * `aggregate(zip_with(a, b, (x, y) -> x*y), 0.0, (acc, v) -> acc+v)` —
  * materializes an intermediate array and boxes every element through
  * the interpreted HOF evaluator; pair scoring in the ANN paths
  * (d05/d06/d07/d09) applies it millions of times per query. This
  * expression runs a tight primitive loop and participates in
  * whole-stage codegen through a single static call.
  *
  * Semantics are EXACTLY the HOF chain's, so every DuckDB oracle replay
  * stays bitwise: strict left-to-right accumulation from 0.0 (same IEEE
  * operation order as the fold and as DuckDB's list_dot_product), floats
  * widened per element, and null poisoning — a null element, a null
  * array, or a length mismatch (zip_with pads the shorter side with
  * nulls) all yield NULL.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elementOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elementOk(left.dataType) && elementOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        "graft_dot requires two array<float|double> arguments, got " +
          s"${left.dataType} and ${right.dataType}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("dotResult")
      s"""
         |java.lang.Double $r = graft.functions.expressions.DotProduct.dot(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object DotProduct {

  /** Tight accumulation loop; null on length mismatch or null element
    * (the HOF chain's null-poisoning semantics).
    */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean,
      bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
