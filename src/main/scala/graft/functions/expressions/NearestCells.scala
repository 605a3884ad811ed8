package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Centroid table embedded in an expression node: parallel arrays of
  * cell id, |c|² (driver-side LEFT FOLD — the same summation order as
  * `DotProduct.dot` and DuckDB's `list_dot_product`, so oracle replays
  * stay bitwise), and centroid vector, sorted by cell id. A model-sized
  * object (nlist × dim doubles), NOT data-sized — it rides the plan the
  * way a `typedLit` centroid array did, but as one opaque reference
  * instead of an O(nlist × dim) Catalyst literal tree.
  */
final class CentroidTable private (
    val cids: Array[Int],
    val cnorms: Array[Double],
    val cvecs: Array[Array[Double]]) extends Serializable {

  def size: Int = cids.length
  def dim: Int = if (cvecs.isEmpty) 0 else cvecs(0).length

  /** Compact plan-string form — the full matrix must never be printed
    * into explain()/toString output (a typedLit of the same table
    * renders every element).
    */
  override def toString: String = s"CentroidTable(n=$size, dim=$dim)"
}

object CentroidTable {

  /** Build from (cid, vector) pairs; rows are cid-sorted and |c|² is the
    * left fold Σx·x — both invariants the oracle replays depend on. May
    * be empty (a hierarchical super-cell with no leaves).
    */
  def apply(cents: Seq[(Int, Array[Double])]): CentroidTable = {
    val sorted = cents.sortBy(_._1)
    new CentroidTable(
      sorted.map(_._1).toArray,
      sorted.map { case (_, v) => v.foldLeft(0.0)((a, x) => a + x * x) }.toArray,
      sorted.map(_._2).toArray)
  }
}

/** Shared kernel of the nearest-cell expressions: rel-dist ranking with
  * the exact semantics the previous HOF formulation had —
  * rel_dist = |c|² − 2·(v·c) with the dot accumulated LEFT-TO-RIGHT in
  * double (float elements widened per element), candidates ordered by
  * (rel_dist, cid) ascending with `java.lang.Double.compare` (the same
  * total order Spark's struct ordering and DuckDB's ORDER BY apply to
  * these values), ids unique so the order is total.
  */
private[expressions] object CellRank {

  /** vec as doubles, or null if the input has a null element (the HOF
    * chain null-poisons through `DotProduct`; fixtures are null-free —
    * the compiled form poisons the whole result rather than ranking
    * the poisoned centroid last).
    */
  def toDoubles(vec: ArrayData, isFloat: Boolean): Array[Double] = {
    val m = vec.numElements()
    val out = new Array[Double](m)
    var i = 0
    while (i < m) {
      if (vec.isNullAt(i)) return null
      out(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    out
  }

  /** rel_dist of query q against centroid row j of t — one tight loop,
    * no intermediate array, no boxing.
    */
  def relDist(q: Array[Double], t: CentroidTable, j: Int): Double = {
    val c = t.cvecs(j)
    var acc = 0.0
    var i = 0
    while (i < c.length) { acc += q(i) * c(i); i += 1 }
    t.cnorms(j) - 2.0 * acc
  }

  /** Bounded insertion of (rel, cid) into the parallel top-n arrays
    * (ascending (rel, cid)); returns the new fill count. O(n) per
    * candidate with n ≤ nprobe — cheaper than a full sort for the small
    * n every caller uses.
    */
  def insertTopN(rels: Array[Double], cids: Array[Int], filled: Int,
      rel: Double, cid: Int): Int = {
    val n = rels.length
    var p = filled
    while (p > 0 && {
      val cmp = java.lang.Double.compare(rel, rels(p - 1))
      cmp < 0 || (cmp == 0 && cid < cids(p - 1))
    }) p -= 1
    if (p >= n) filled
    else {
      val last = math.min(filled, n - 1)
      var i = last
      while (i > p) { rels(i) = rels(i - 1); cids(i) = cids(i - 1); i -= 1 }
      rels(p) = rel
      cids(p) = cid
      math.min(filled + 1, n)
    }
  }

  /** Top-n cell ids of q over t by (rel_dist, cid) ascending. */
  def topCells(q: Array[Double], t: CentroidTable, n: Int): Array[Int] = {
    val k = math.min(n, t.size)
    val rels = new Array[Double](k)
    val ids = new Array[Int](k)
    var filled = 0
    var j = 0
    while (j < t.size) {
      filled = insertTopN(rels, ids, filled, relDist(q, t, j), t.cids(j))
      j += 1
    }
    if (filled == k) ids else java.util.Arrays.copyOf(ids, filled)
  }

  def checkVecType(dt: DataType, name: String): TypeCheckResult = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires an array<float|double> argument, got $other")
  }
}

/** Top-n nearest cells of a vector column against a fixed centroid
  * table, as ONE compiled call per row.
  *
  * Exists because the composable form — `array_min`/`array_sort` over
  * `transform(centroid-literal, c -> struct(relDist, cid))` — is a
  * higher-order-function tree, and HOFs are CodegenFallback: every
  * centroid costs an interpreted lambda dispatch, a boxed struct
  * allocation, and (on the probe path) a full array materialization +
  * sort, measured at ~10-20× the arithmetic's cost in the r14 scale
  * probe (PLANS.md, hier finding 2). This expression runs the rank as
  * primitive loops over primitive arrays and participates in whole-stage
  * codegen through a single instance call — the same reasoning as
  * `PolyHash`/`DotProduct`, one level up (the whole argmin/top-n, not
  * just the dot).
  *
  * Semantics are EXACTLY the HOF chain's on null-free vectors (see
  * `CellRank`): rel_dist = |c|² − 2·v·c, left-to-right double
  * accumulation, (rel_dist, cid)-ascending order, so every DuckDB gate
  * oracle replays bitwise. Null vector → null; null element or
  * dim-mismatched vector → null (the HOF form ranked the poisoned
  * candidates last / first instead — both shapes are out-of-contract
  * inputs that never occur in the fixtures).
  *
  * Returns array<int> of min(n, nlist) cell ids; n = 1 + `getItem(0)`
  * is cell assignment, n = nprobe + `explode` is probing — the flat
  * probe path loses its broadcast join AND its rank-window exchange.
  */
case class NearestCells(child: Expression, table: CentroidTable, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"n must be >= 1: $n")
  require(table.size >= 1, "centroid table must be non-empty")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    CellRank.checkVecType(child.dataType, prettyName)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Instance entry point shared by eval and generated code. */
  def rank(vec: ArrayData): ArrayData = {
    val q = CellRank.toDoubles(vec, isFloat)
    if (q == null || q.length != table.dim) null
    else UnsafeArrayData.fromPrimitiveArray(CellRank.topCells(q, table, n))
  }

  override protected def nullSafeEval(input: Any): Any =
    rank(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this,
      classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("cellsResult")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r = $ref.rank($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : NearestCells = copy(child = newChild)

  override def prettyName: String = "graft_nearest_cells"
}

/** Fused two-level (hierarchical IVF) nearest-cell rank: top-`w`
  * super-cells, then top-`n` leaves among ONLY those supers' leaf
  * tables — per-row cost nsuper + w·nlist/nsuper dots, all in one
  * compiled call. This is `IvfHier`'s two-stage HOF pipeline
  * (`topSids` → gather → rank) collapsed into primitive loops; the
  * r14 probe measured the HOF form's interpreted-eval constant pushing
  * the two-level law's wall-clock crossover to n ≈ 10⁷ vectors — the
  * compiled form removes exactly that constant (PLANS.md r15 note).
  *
  * `leaves(sid)` holds super `sid`'s (possibly empty) leaf table;
  * candidate order across supers never shows because ids are unique and
  * the final order is the total (rel_dist, cid). Same null contract and
  * bitwise-replay semantics as `NearestCells`.
  */
case class NearestCellsTwoLevel(child: Expression, supers: CentroidTable,
    leaves: Array[CentroidTable], w: Int, n: Int) extends UnaryExpression {

  require(w >= 1, s"w must be >= 1: $w")
  require(n >= 1, s"n must be >= 1: $n")
  require(supers.size >= 1, "super-centroid table must be non-empty")
  require(leaves.length == supers.size,
    s"leaves must have one table per super: ${leaves.length} vs ${supers.size}")
  // `leaves` is indexed POSITIONALLY by super cid — require density so a
  // hand-built model with sparse or shifted sids fails loudly here
  // instead of ranking against the wrong leaf table (ADVICE r15).
  // IvfHier.hierarchy renumbers supers 0..nsuper-1, so this holds for
  // every model it builds.
  require({
    var i = 0
    var dense = true
    while (dense && i < supers.size) { dense = supers.cids(i) == i; i += 1 }
    dense
  }, "super-centroid cids must be dense 0..size-1 (leaves index by sid)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    CellRank.checkVecType(child.dataType, prettyName)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Instance entry point shared by eval and generated code. */
  def rank(vec: ArrayData): ArrayData = {
    val q = CellRank.toDoubles(vec, isFloat)
    if (q == null || q.length != supers.dim) return null
    val sids = CellRank.topCells(q, supers, w)
    val k = {
      var total = 0
      var s = 0
      while (s < sids.length) { total += leaves(sids(s)).size; s += 1 }
      math.min(n, total)
    }
    if (k == 0) return UnsafeArrayData.fromPrimitiveArray(new Array[Int](0))
    val rels = new Array[Double](k)
    val ids = new Array[Int](k)
    var filled = 0
    var s = 0
    while (s < sids.length) {
      val t = leaves(sids(s))
      var j = 0
      while (j < t.size) {
        filled = CellRank.insertTopN(rels, ids, filled,
          CellRank.relDist(q, t, j), t.cids(j))
        j += 1
      }
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (filled == k) ids else java.util.Arrays.copyOf(ids, filled))
  }

  override protected def nullSafeEval(input: Any): Any =
    rank(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCellsTwoLevel", this,
      classOf[NearestCellsTwoLevel].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("cellsResult")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r = $ref.rank($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : NearestCellsTwoLevel = copy(child = newChild)

  override def prettyName: String = "graft_nearest_cells_hier"
}
