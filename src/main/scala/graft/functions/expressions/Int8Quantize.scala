package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StructField, StructType}

/** Scalar int8 quantization of a vector column — `Quantize`'s
  * per-vector amax fold + round-half-up map as ONE compiled call per
  * row (the r15 `NearestCells` treatment: the HOF form paid an
  * interpreted `aggregate` pass for amax plus an interpreted
  * `transform` per component — 2·dim lambda dispatches per row on what
  * is a pure storage-compression pass over the whole corpus).
  *
  * Semantics are EXACTLY the HOF chain's on null-free vectors:
  * amax = fold of greatest(acc, |x|) from 0.0; each component maps to
  * floor(x·127/amax + 0.5) with the same IEEE op order
  * ((x · 127.0) / amax, + 0.5, floor); amax = 0 → all-zero vector
  * (never a divide); the quantized components stay array<double> of
  * integral values so every downstream kernel (`Ann.dot`, the d10/d11
  * oracles' exact integer sums) applies unchanged, and `amax` rides in
  * the same struct (it IS the dequantization scale `writeQuantized`
  * persists). Null input → null; null element → null (the HOF form
  * poisons per-component instead — out-of-contract, fixtures are
  * null-free).
  */
case class Int8Quantize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("qvec", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("amax", DoubleType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    CellRank.checkVecType(child.dataType, prettyName)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Instance entry point shared by eval and generated code. */
  def quantize(vec: ArrayData): InternalRow = {
    val v = CellRank.toDoubles(vec, isFloat)
    if (v == null) return null
    var amax = 0.0
    var i = 0
    while (i < v.length) {
      val a = math.abs(v(i))
      if (a > amax) amax = a
      i += 1
    }
    val out = new Array[Double](v.length)
    if (amax != 0.0) {
      var j = 0
      while (j < v.length) {
        out(j) = math.floor(v(j) * 127.0 / amax + 0.5)
        j += 1
      }
    }
    new GenericInternalRow(Array[Any](
      UnsafeArrayData.fromPrimitiveArray(out), amax))
  }

  override protected def nullSafeEval(input: Any): Any =
    quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("int8Quantize", this,
      classOf[Int8Quantize].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("qzResult")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $r = $ref.quantize($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Int8Quantize = copy(child = newChild)

  override def prettyName: String = "graft_int8_quantize"
}
