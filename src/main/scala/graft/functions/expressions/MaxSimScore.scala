package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Compiled late-interaction kernel: MaxSim(q, d) = Σ over query token
  * vectors of the max dot against any document token vector — the
  * per-candidate-PAIR hot site of `similarity/MaxSim` (the `AdcDot` /
  * `HammingWords` analogue). The HOF formulation
  * (`aggregate(transform(q, qt -> array_max(transform(d, dt ->
  * graft_dot(qt, dt)))), 0.0, +)`) is CodegenFallback: every pair pays
  * m interpreted lambda dispatches wrapping m more, each boxing an
  * array — the r18 32× probe measured the brute arm at 6.2× wall on
  * 32× candidates with the arithmetic itself trivial. This expression
  * is two primitive loops around `DotProduct.dot` inside whole-stage
  * codegen.
  *
  * Bit-identical to the HOF tree by construction: dots are the same
  * left-to-right fold (`DotProduct.dot`), max is order-free (first-max
  * kept — equal values indistinguishable), and the outer Σ is the same
  * left fold in token order. Null semantics REPLICATE the HOF chain's:
  * a null/mismatched document token's dot is skipped by the max
  * (array_max skips nulls); a query-token position with NO valid dot
  * (empty/all-null document tokens) makes the whole score null
  * (array_max of nothing is null, and the aggregate's `acc + null`
  * poisons); a null QUERY token nulls the score the same way; an empty
  * query-token array scores 0.0 (the aggregate's zero).
  */
case class MaxSimScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(ArrayType(DoubleType, _), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        "graft_maxsim requires two array<array<double>> arguments, got " +
          s"${left.dataType} and ${right.dataType}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MaxSimScore.score(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("maxsimResult")
      s"""
         |java.lang.Double $r =
         |  graft.functions.expressions.MaxSimScore.score($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): MaxSimScore =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_maxsim"
}

object MaxSimScore {

  /** Two primitive loops; the null contract documented on the class. */
  def score(q: ArrayData, d: ArrayData): java.lang.Double = {
    val nq = q.numElements()
    val nd = d.numElements()
    var acc = 0.0
    var i = 0
    while (i < nq) {
      if (q.isNullAt(i)) return null
      val qt = q.getArray(i)
      var best = 0.0
      var found = false
      var j = 0
      while (j < nd) {
        if (!d.isNullAt(j)) {
          val r = DotProduct.dot(qt, d.getArray(j), false, false)
          if (r != null) {
            val v = r.doubleValue()
            if (!found || v > best) { best = v; found = true }
          }
        }
        j += 1
      }
      if (!found) return null
      acc += best
      i += 1
    }
    acc
  }
}
