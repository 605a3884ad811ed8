package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Sign-bit packing for binary quantization (`BinaryQuant.pack`) as ONE
  * compiled call per row: word w = fold over its ≤32 projected
  * coordinates of acc·2 + [p > 0] (first coordinate = the word's MSB —
  * the exact fold the d36 oracle replays via list_reduce). The HOF form
  * ran an interpreted transform-of-aggregate per word; this is a
  * primitive loop. Null input → null; null element → null (the HOF's
  * `when` mapped a null coordinate to bit 0 instead — out-of-contract,
  * projections are never null on null-free vectors).
  */
case class PackBits(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1, s"bits must be >= 1: $bits")

  private val wordBits = 32

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    CellRank.checkVecType(child.dataType, prettyName)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Instance entry point shared by eval and generated code. */
  def pack(vec: ArrayData): ArrayData = {
    val p = CellRank.toDoubles(vec, isFloat)
    if (p == null) return null
    val nWords = (bits + wordBits - 1) / wordBits
    val out = new Array[Long](nWords)
    var w = 0
    while (w < nWords) {
      var acc = 0L
      var i = w * wordBits
      val end = math.min(i + wordBits, p.length)
      while (i < end) {
        acc = acc * 2L + (if (p(i) > 0.0) 1L else 0L)
        i += 1
      }
      out(w) = acc
      w += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    pack(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("packBits", this, classOf[PackBits].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("packResult")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r = $ref.pack($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : PackBits = copy(child = newChild)

  override def prettyName: String = "graft_pack_bits"
}

/** Hamming distance between two packed code columns — Σ_w
  * popcount(a_w XOR b_w) as ONE compiled call per candidate PAIR (the
  * binary-quantization search's hottest site, the `AdcDot` analogue).
  * Null array or word-count mismatch → null (the zip_with padding
  * semantics).
  */
case class HammingWords(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType} and ${right.dataType}")
  }

  /** Instance entry point shared by eval and generated code. */
  def distance(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    distance(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hammingWords", this,
      classOf[HammingWords].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("hamResult")
      s"""
         |java.lang.Long $r = $ref.distance($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HammingWords =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_hamming_words"
}

/** Packed-code words → the bits/8-byte on-disk layout
  * (`BinaryQuant.writeIvfBinary`): each full 32-bit word emits its 4
  * bytes big-endian; the LAST word (holding r = bits − 32·(nWords−1)
  * low bits, value < 2^r by the `PackBits` fold) emits only ⌈r/8⌉
  * bytes — total ⌈bits/8⌉ bytes per row, the storage argument the
  * binary arm is built on (a 64-dim float64 vector stores as 8 bytes).
  * Null input → null; word-count mismatch vs `bits` → null (contract
  * violation, like [[HammingWords]]).
  */
case class WordsToCode(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits >= 1, s"bits must be >= 1: $bits")

  private val nWords = (bits + 31) / 32
  private val lastBits = bits - 32 * (nWords - 1)
  private val lastBytes = (lastBits + 7) / 8
  private val totalBytes = 4 * (nWords - 1) + lastBytes

  override def dataType: DataType =
    org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got $other")
    }

  /** Instance entry point shared by eval and generated code. */
  def toBytes(words: ArrayData): Array[Byte] = {
    if (words.numElements() != nWords) return null
    val out = new Array[Byte](totalBytes)
    var w = 0
    var o = 0
    while (w < nWords) {
      if (words.isNullAt(w)) return null
      val v = words.getLong(w)
      val nb = if (w == nWords - 1) lastBytes else 4
      var b = nb - 1
      while (b >= 0) {
        out(o + b) = (v >>> (8 * (nb - 1 - b))).toByte
        b -= 1
      }
      o += nb
      w += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    toBytes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordsToCode", this,
      classOf[WordsToCode].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("codeBytes")
      s"""
         |byte[] $r = $ref.toBytes($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WordsToCode = copy(child = newChild)

  override def prettyName: String = "graft_words_to_code"
}

/** Inverse of [[WordsToCode]]: the ⌈bits/8⌉-byte stored code back to
  * the 32-bit-per-long word array every Hamming kernel expects — a
  * lossless round-trip by construction (`BinaryCodeSpec` pins it).
  * Null input → null; byte-length mismatch vs `bits` → null.
  */
case class CodeToWords(child: Expression, bits: Int)
    extends UnaryExpression {

  require(bits >= 1, s"bits must be >= 1: $bits")

  private val nWords = (bits + 31) / 32
  private val lastBits = bits - 32 * (nWords - 1)
  private val lastBytes = (lastBits + 7) / 8
  private val totalBytes = 4 * (nWords - 1) + lastBytes

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.BinaryType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary, got $other")
    }

  /** Instance entry point shared by eval and generated code. */
  def toWords(code: Array[Byte]): ArrayData = {
    if (code.length != totalBytes) return null
    val out = new Array[Long](nWords)
    var w = 0
    var o = 0
    while (w < nWords) {
      val nb = if (w == nWords - 1) lastBytes else 4
      var acc = 0L
      var b = 0
      while (b < nb) {
        acc = (acc << 8) | (code(o + b) & 0xffL)
        b += 1
      }
      out(w) = acc
      o += nb
      w += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    toWords(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codeToWords", this,
      classOf[CodeToWords].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("codeWords")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r = $ref.toWords($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CodeToWords = copy(child = newChild)

  override def prettyName: String = "graft_code_to_words"
}
