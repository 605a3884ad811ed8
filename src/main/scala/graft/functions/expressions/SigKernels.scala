package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Compiled per-document signature kernels (r18 optimization round) —
  * the explode-free forms of the MinHash and SimHash signature
  * aggregations in `dedup.NearDup`.
  *
  * The original shapes explode every shingle to its own row (corpus ×
  * ~shingles-per-doc rows), hash each, and shuffle partial min/sum
  * aggregates back to one row per document. But a document's
  * `shingle_set` is ALREADY one array in one row, so the whole
  * signature is a per-row fold: no Generate, no hash-aggregate state,
  * no exchange for the signature stage (steady-state sf0.1 measurement:
  * minhash signatures 0.52 s exploded of which ~0.3 s is the
  * explode+agg; simhash 0.86–1.07 s of which ~0.6–0.8 s — the kernels
  * collapse both to the shingle-hash loop itself). At 100 TB the same
  * fold removes a corpus-sized exchange entirely.
  *
  * Exactness: both kernels REPLAY the aggregation-form arithmetic —
  * the same `PolyHash.hash` per shingle, the same (a·h + b) % p
  * permutations in exact longs, min/sum folds over values whose
  * min/sum is order-free — and the null semantics of the originals
  * (explode drops no elements here; a null element hashed to null was
  * SKIPPED by `min` but counted −1 per bit by the simhash `otherwise`,
  * and both kernels replicate that). Spec-pinned bit-identical against
  * the aggregation forms in `SigKernelsSpec`.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _)
      if numHashes >= 1 &&
        numHashes <= graft.functions.TextFunctions.MinHashA.length =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires array<string> and 1 <= numHashes <= " +
        s"${graft.functions.TextFunctions.MinHashA.length}, got " +
        s"${child.dataType} / $numHashes")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.sig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("mhSig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.expressions.MinHashSig.sig($c, $numHashes);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSig = copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}

object MinHashSig {

  /** k running minima over (a_i·polyhash(s) + b_i) % p — one pass over
    * the shingle array. Null elements are skipped (SQL `min` semantics);
    * an array with no hashable element yields null minima per slot
    * (matching the aggregation form's absent row — callers filter empty
    * sets upstream, `NearDup.shingleSets`).
    */
  def sig(arr: ArrayData, k: Int): ArrayData = {
    val a = graft.functions.TextFunctions.MinHashA
    val b = graft.functions.TextFunctions.MinHashB
    val p = graft.functions.TextFunctions.HashMod
    val mins = new Array[Long](k)
    var found = false
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = PolyHash.hash(arr.getUTF8String(i))
        var j = 0
        while (j < k) {
          val v = (a(j) * h + b(j)) % p
          if (!found || v < mins(j)) mins(j) = v
          j += 1
        }
        found = true
      }
      i += 1
    }
    if (!found) null
    else new GenericArrayData(mins.map(Long.box))
  }
}

case class SimHashPack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires array<string>, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHashPack.pack(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("shPack")
      s"""
         |java.lang.Long $r =
         |  graft.functions.expressions.SimHashPack.pack($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHashPack = copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

object SimHashPack {

  /** SimHash bit count — kept here as the single source of the bit-hash
    * constants; `NearDup.SimHashBits`/`simA`/`simB` delegate.
    */
  final val Bits = 48

  /** Per-bit multiplier/offset, the fixed recurrence any engine can
    * regenerate (moved verbatim from `NearDup`).
    */
  def a(j: Int): Long = (104729L * (j + 1) + 12347L) % 1000000L | 1L
  def b(j: Int): Long = (15485863L * (j + 1) + 987L) % 1000000L

  private val A: Array[Long] = Array.tabulate(Bits)(a)
  private val B: Array[Long] = Array.tabulate(Bits)(b)

  /** For each bit j: sign of Σ over shingles of ±1 by the parity of an
    * independent permutation of the shingle hash; bits with a positive
    * sum set. A null element contributes −1 to EVERY bit (the
    * aggregation form's `when(bit === 1, 1).otherwise(-1)` routes a
    * null hash to the otherwise branch). An empty array packs 0 —
    * matching the aggregation form's absent row for callers that do not
    * pre-filter (shingleSets does).
    */
  def pack(arr: ArrayData): java.lang.Long = {
    val p = graft.functions.TextFunctions.HashMod
    val counts = new Array[Int](Bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var j = 0
        while (j < Bits) { counts(j) -= 1; j += 1 }
      } else {
        val h = PolyHash.hash(arr.getUTF8String(i))
        var j = 0
        while (j < Bits) {
          if (((A(j) * h + B(j)) % p) % 2 == 1L) counts(j) += 1
          else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < Bits) {
      if (counts(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }
}
