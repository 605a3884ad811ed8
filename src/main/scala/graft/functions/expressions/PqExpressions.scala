package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Compiled product-quantization kernels — the r15 `NearestCells`
  * treatment applied to the PQ hot paths (`similarity/Pq`). The HOF
  * forms (transform/array_min over the nested codebook literal, the
  * zip_with+aggregate ADC fold) are CodegenFallback: every (subspace,
  * code) candidate costs an interpreted lambda dispatch and boxed
  * struct churn. At production PQ shapes (m = 16, ksub = 256) encode is
  * 4096 subvector dots PER ROW and ADC is a 16-lookup fold PER
  * CANDIDATE PAIR — exactly the per-row constants the r14/r15 scale
  * probes showed dominating wall-clock. Each expression here is one
  * compiled call per row over primitive arrays.
  *
  * Bitwise contract (the d33/d34/d35 oracle-replay semantics): every
  * dot is a left-to-right double fold; subspace argmin ranks
  * |c|² − 2·x_j·c with ascending code tie-break; csqn and the ADC sum
  * are left folds from 0.0 in subspace order. Null input → null; a
  * null element or a dim mismatch poisons the whole result to null
  * (out-of-contract inputs — the fixtures are null-free).
  *
  * The per-subspace codebooks reuse [[CentroidTable]] (cid = code r,
  * cnorm = |c|² as a driver-side left fold).
  */
private[expressions] object PqKernel {

  /** ROW INDEX of code_j = argmin_r (cnorm_r − 2·x_j·c_r) for one
    * subspace slice [off, off+ds) of q. Strict-less keeps the earliest
    * row on rel-dist ties, and the table is cid-sorted, so ties break
    * on ascending code — the `Pq.encode` struct-ordering semantics.
    */
  def argminRow(q: Array[Double], off: Int, book: CentroidTable): Int = {
    var bestRel = Double.NaN
    var best = -1
    var r = 0
    while (r < book.size) {
      val c = book.cvecs(r)
      var acc = 0.0
      var i = 0
      while (i < c.length) { acc += q(off + i) * c(i); i += 1 }
      val rel = book.cnorms(r) - 2.0 * acc
      if (best < 0 || java.lang.Double.compare(rel, bestRel) < 0) {
        bestRel = rel
        best = r
      }
      r += 1
    }
    best
  }

  def checkBooks(books: Array[CentroidTable]): Unit = {
    require(books.nonEmpty, "need at least one codebook")
    require(books.forall(_.size == books(0).size),
      "all codebooks must have the same ksub")
    require(books.forall(_.dim == books(0).dim),
      "all codebooks must have the same subspace dim")
  }
}

/** m-code PQ word + reconstruction squared norm of a vector column, as
  * ONE compiled call per row: struct(code: array<int>, csqn: double)
  * where code_j is subspace j's argmin and csqn = Σ_j |c_{j,code_j}|²
  * as a left fold (the `Pq.encode` ride-along semantics, bit-exact).
  */
case class PqEncode(child: Expression, books: Array[CentroidTable])
    extends UnaryExpression {

  PqKernel.checkBooks(books)

  private def ds: Int = books(0).dim

  override def dataType: DataType = StructType(Seq(
    StructField("code", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("csqn", DoubleType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    CellRank.checkVecType(child.dataType, prettyName)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Instance entry point shared by eval and generated code. */
  def encode(vec: ArrayData): InternalRow = {
    val q = CellRank.toDoubles(vec, isFloat)
    if (q == null || q.length != ds * books.length) return null
    val codes = new Array[Int](books.length)
    var csqn = 0.0
    var j = 0
    while (j < books.length) {
      val row = PqKernel.argminRow(q, j * ds, books(j))
      codes(j) = books(j).cids(row)
      csqn += books(j).cnorms(row)
      j += 1
    }
    new GenericInternalRow(Array[Any](
      UnsafeArrayData.fromPrimitiveArray(codes), csqn))
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this,
      classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("pqResult")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $r = $ref.encode($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : PqEncode = copy(child = newChild)

  override def prettyName: String = "graft_pq_encode"
}

/** The ADC query-dot table qtab[j][r] = q_j · c_{j,r} as ONE compiled
  * call per query row — array<array<double>> in (subspace, code) order,
  * the `Pq.withQueryTables` shape bit-exact.
  */
case class PqQueryTable(child: Expression, books: Array[CentroidTable])
    extends UnaryExpression {

  PqKernel.checkBooks(books)

  private def ds: Int = books(0).dim

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false),
      containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    CellRank.checkVecType(child.dataType, prettyName)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Instance entry point shared by eval and generated code. */
  def tables(vec: ArrayData): GenericArrayData = {
    val q = CellRank.toDoubles(vec, isFloat)
    if (q == null || q.length != ds * books.length) return null
    val rows = new Array[AnyRef](books.length)
    var j = 0
    while (j < books.length) {
      val book = books(j)
      val dots = new Array[Double](book.size)
      var r = 0
      while (r < book.size) {
        val c = book.cvecs(r)
        var acc = 0.0
        var i = 0
        while (i < c.length) { acc += q(j * ds + i) * c(i); i += 1 }
        dots(r) = acc
        r += 1
      }
      rows(j) = UnsafeArrayData.fromPrimitiveArray(dots)
      j += 1
    }
    new GenericArrayData(rows)
  }

  override protected def nullSafeEval(input: Any): Any =
    tables(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqQueryTable", this,
      classOf[PqQueryTable].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("qtabResult")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $r =
         |  $ref.tables($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : PqQueryTable = copy(child = newChild)

  override def prettyName: String = "graft_pq_query_table"
}

/** The ADC m-lookup fold Σ_j qtab[j][code_j] — the per-candidate-pair
  * kernel (`Pq.adcShortlist`'s zip_with+aggregate, compiled): left fold
  * from 0.0 in subspace order, bit-exact. Null array, length mismatch,
  * or out-of-range code → null.
  */
case class AdcDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val okL = left.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    val okR = right.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (okL && okR) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<array<double>>, array<int>), got " +
        s"${left.dataType} and ${right.dataType}")
  }

  /** Instance entry point shared by eval and generated code. */
  def fold(qtab: ArrayData, code: ArrayData): java.lang.Double = {
    val m = qtab.numElements()
    if (code.numElements() != m) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (qtab.isNullAt(j) || code.isNullAt(j)) return null
      val row = qtab.getArray(j)
      val c = code.getInt(j)
      if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
      acc += row.getDouble(c)
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    fold(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcDot", this, classOf[AdcDot].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("adcResult")
      s"""
         |java.lang.Double $r = $ref.fold($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AdcDot = copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_adc_dot"
}
