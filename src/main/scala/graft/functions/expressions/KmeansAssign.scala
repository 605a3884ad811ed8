package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Exact-integer k-means assignment — `Kmeans.fitPredict`'s per-round
  * argmin as ONE compiled call per row: for a micro-quantized vector
  * (array<long>), dist_j = Σ (q_i − c_{j,i})² as exact long sums,
  * winner by (dist, j) ascending; returns
  * struct(cluster: long, dist2_micro: long).
  *
  * Compiled for the `NearestCells` reason (r15): the HOF form ran
  * k·dims interpreted lambda steps per ROW PER ROUND with boxed longs
  * and a per-centroid intermediate array. All arithmetic is integral,
  * so "bitwise" here is trivial — any correct evaluation order gives
  * the same longs; the (dist, j) tie-break matches the min-struct
  * fold. Null input → null; null element or a dim mismatch with the
  * centroid table → null (out-of-contract inputs).
  */
case class KmeansAssign(child: Expression, centroids: Array[Array[Long]])
    extends UnaryExpression {

  require(centroids.nonEmpty, "need at least one centroid")

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", LongType, nullable = false),
    StructField("dist2_micro", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got $other")
    }

  /** Instance entry point shared by eval and generated code. */
  def assign(vec: ArrayData): InternalRow = {
    val m = vec.numElements()
    if (m != centroids(0).length) return null
    val q = new Array[Long](m)
    var i = 0
    while (i < m) {
      if (vec.isNullAt(i)) return null
      q(i) = vec.getLong(i)
      i += 1
    }
    var bestJ = -1
    var bestD = Long.MaxValue
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      var d = 0L
      var p = 0
      while (p < m) {
        val diff = q(p) - c(p)
        d += diff * diff
        p += 1
      }
      if (d < bestD) { bestD = d; bestJ = j }
      j += 1
    }
    new GenericInternalRow(Array[Any](bestJ.toLong, bestD))
  }

  override protected def nullSafeEval(input: Any): Any =
    assign(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kmeansAssign", this,
      classOf[KmeansAssign].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("kmResult")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $r = $ref.assign($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : KmeansAssign = copy(child = newChild)

  override def prettyName: String = "graft_kmeans_assign"
}
