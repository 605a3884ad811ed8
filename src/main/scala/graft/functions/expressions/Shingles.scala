package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a token array — the corpus-scale dedup
  * primitive (MinHash/SimHash/Jaccard/span-dedup all start here), as
  * ONE compiled call per row.
  *
  * Exists for the `PolyHash`/`NearestCells` reason one level up: the
  * composable form — a chain of n−1 `zip_with(acc, slice(toks, k+1, m),
  * concat)` stages — is a higher-order-function tree (CodegenFallback):
  * each stage interprets a lambda per element and materializes a full
  * intermediate array of partially-joined shingles, so every document
  * pays (n−1) interpreted passes + (n−2) throwaway arrays before the
  * first hash runs. On a 100 TB corpus shingling IS the map work of the
  * dedup family; this expression emits each shingle once
  * (`UTF8String.concatWs`) with no intermediates, inside whole-stage
  * codegen.
  *
  * Semantics are EXACTLY the HOF chain's on null-free token arrays:
  *  - `sliding = false` (the `shinglesFromTokens` contract): inputs
  *    shorter than n fall back to the token list itself;
  *  - `sliding = true` (the `slidingFromTokens` contract): inputs
  *    shorter than n yield an EMPTY array;
  *  - `distinct = true` appends `array_distinct` semantics (first
  *    occurrence kept, order preserved) — `shingleSetFromTokens`.
  * Null input → null; a null token element → null (the HOF form
  * null-poisons the affected shingles instead — out-of-contract:
  * `tokens()` never yields null elements).
  */
case class Shingles(child: Expression, n: Int, sliding: Boolean,
    distinct: Boolean) extends UnaryExpression {

  require(n >= 1, s"n must be >= 1: $n")

  override def dataType: DataType = ArrayType(StringType,
    containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got $other")
    }

  private val space = UTF8String.fromString(" ")

  /** Instance entry point shared by eval and generated code. */
  def shingle(toks: ArrayData): GenericArrayData = {
    val len = toks.numElements()
    val ts = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      if (toks.isNullAt(i)) return null
      ts(i) = toks.getUTF8String(i)
      i += 1
    }
    val out: Array[UTF8String] =
      if (len >= n) {
        val m = len - n + 1
        val w = new Array[UTF8String](m)
        var s = 0
        while (s < m) {
          w(s) =
            if (n == 1) ts(s)
            else UTF8String.concatWs(space,
              java.util.Arrays.copyOfRange(ts, s, s + n): _*)
          s += 1
        }
        w
      } else if (sliding) Array.empty[UTF8String]
      else ts
    val res: Array[UTF8String] =
      if (!distinct || out.length <= 1) out
      else {
        val seen = new java.util.LinkedHashSet[UTF8String](out.length * 2)
        var j = 0
        while (j < out.length) { seen.add(out(j)); j += 1 }
        seen.toArray(new Array[UTF8String](seen.size))
      }
    new GenericArrayData(res.asInstanceOf[Array[AnyRef]])
  }

  override protected def nullSafeEval(input: Any): Any =
    shingle(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingles", this,
      classOf[Shingles].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("shingleResult")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $r =
         |  $ref.shingle($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Shingles = copy(child = newChild)

  override def prettyName: String = "graft_shingles"
}

/** Adjacent token pairs as structs — `zip_with(slice(t, 1, n−1),
  * slice(t, 2, n−1), (a, b) -> struct(a AS prev, b AS term))` as ONE
  * compiled call per row. The [[Shingles]] motivation for the bigram-LM
  * family's map stage (t33 nominated by the r17 32× probe: the HOF
  * form paid two interpreted slices, a zip_with lambda per pair, and a
  * boxed struct per element): pairs are emitted once, no intermediate
  * slice arrays, inside whole-stage codegen.
  *
  * Semantics are EXACTLY the HOF form's on null-free token arrays:
  * len < 2 → empty array (both slices are empty). Null input → null;
  * a null token element → null (the HOF form would emit a struct with
  * a null field instead — out-of-contract: `tokens()` never yields
  * null elements).
  */
case class BigramPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("prev", StringType, nullable = false),
    StructField("term", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got $other")
    }

  /** Instance entry point shared by eval and generated code. */
  def pairs(toks: ArrayData): GenericArrayData = {
    val len = toks.numElements()
    if (len < 2)
      return new GenericArrayData(new Array[AnyRef](0))
    val out = new Array[AnyRef](len - 1)
    var prev: UTF8String = if (toks.isNullAt(0)) return null
      else toks.getUTF8String(0)
    var i = 1
    while (i < len) {
      if (toks.isNullAt(i)) return null
      val cur = toks.getUTF8String(i)
      out(i - 1) = new GenericInternalRow(
        Array[Any](prev, cur)): InternalRow
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    pairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramPairs", this,
      classOf[BigramPairs].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("pairResult")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $r =
         |  $ref.pairs($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BigramPairs = copy(child = newChild)

  override def prettyName: String = "graft_bigram_pairs"
}
