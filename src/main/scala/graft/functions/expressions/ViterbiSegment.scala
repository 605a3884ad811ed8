package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Piece vocabulary embedded in an expression node: piece → integer
  * micro-nat cost (−⌊ln(p)·10⁶ + 0.5⌋). Model-sized (the tokenizer
  * vocabulary, ≤ ~64k pieces at production scale), NOT data-sized —
  * the standard model-bounded object convention (k-means centroids,
  * IVF cells, BPE merge tables).
  */
final class VocabTable private (
    val costs: java.util.HashMap[String, java.lang.Long],
    val maxPieceLen: Int) extends Serializable {

  def size: Int = costs.size()

  /** Compact plan-string form — the vocabulary must never be printed
    * into explain() output.
    */
  override def toString: String =
    s"VocabTable(pieces=$size, maxPieceLen=$maxPieceLen)"
}

object VocabTable {
  def apply(pieces: Map[String, Long]): VocabTable = {
    require(pieces.nonEmpty, "vocabulary must be non-empty")
    val m = new java.util.HashMap[String, java.lang.Long](pieces.size * 2)
    var maxLen = 1
    pieces.foreach { case (p, c) =>
      require(p.nonEmpty, "empty piece in vocabulary")
      m.put(p, java.lang.Long.valueOf(c))
      // CODE POINTS, not UTF-16 units — the DP window must count what
      // the SQL replay counts (DuckDB len() is code-point-based)
      val len = p.codePointCount(0, p.length)
      if (len > maxLen) maxLen = len
    }
    new VocabTable(m, maxLen)
  }
}

/** Viterbi segmentation of a word under a unigram piece model — the
  * E-step / serving primitive of a SentencePiece-style unigram-LM
  * tokenizer (Kudo 2018 lineage), as ONE compiled call per row.
  *
  * Semantics (the oracle-replay contract — gate t58 replays it
  * EXHAUSTIVELY in SQL via a recursive CTE over all segmentations):
  * among all ways to split the word into vocabulary pieces, return the
  * one minimizing the triple
  *
  *   (total micro-nat cost, piece count, boundary mask)
  *
  * compared lexicographically, where the boundary mask is Σ 2^j over
  * all interior piece-start positions j (1-based char offsets; 0 never
  * contributes). The mask term makes the argmin TOTAL: ties on
  * (cost, count) resolve to the segmentation whose boundaries sit
  * latest-possible under integer comparison — equivalently the
  * lexicographically smallest boundary set read from the high bit down,
  * which prefers the longest final piece, then the longest piece before
  * it, and so on. The triple is prefix-decomposable (cost and count are
  * additive; the mask's new bit 2^j strictly dominates every bit of any
  * shorter prefix's mask), so the DP's per-position best is globally
  * correct — that is what lets a one-pass engine DP and an exhaustive
  * SQL enumeration agree exactly.
  *
  * Returns array<string> of pieces; null for NULL input, a word longer
  * than 62 chars (mask bits), or a word not segmentable with the
  * vocabulary (serving a char the vocab lacks).
  *
  * A compiled expression rather than HOF array math for the same reason
  * as `NearestCells`: the DP is a loop over (position × pieceLen) with
  * early exits and backpointers — in HOF form it would be an interpreted
  * O(m·L) lambda tree per word; here it is primitive arrays and one
  * HashMap probe per (pos, len), inside whole-stage codegen.
  */
case class ViterbiSegment(child: Expression, vocab: VocabTable)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")

  /** Instance entry point shared by eval and generated code.
    *
    * The DP indexes by Unicode CODE POINTS, not UTF-16 units: piece
    * lengths, the 62-position mask limit, and the boundary-mask bits
    * must count what the exhaustive SQL replay counts (DuckDB
    * substr/len are code-point-based). With UTF-16 indexing a word of
    * 40 non-BMP characters (80 UTF-16 units) would be rejected by the
    * 62-limit while the oracle happily segments it, and mask bits would
    * sit at surrogate offsets (ADVICE r15).
    */
  def segment(word: UTF8String): GenericArrayData = {
    val w = word.toString
    val m = w.codePointCount(0, w.length)
    if (m == 0 || m > 62) return null
    // UTF-16 offset of code point i (offs(m) = w.length) — all
    // substring boundaries below are code-point boundaries
    val offs = new Array[Int](m + 1)
    var ci = 0
    var u = 0
    while (ci < m) { offs(ci) = u; u = w.offsetByCodePoints(u, 1); ci += 1 }
    offs(m) = w.length
    val INF = Long.MaxValue
    val cost = new Array[Long](m + 1)
    val np = new Array[Int](m + 1)
    val mask = new Array[Long](m + 1)
    val back = new Array[Int](m + 1)
    java.util.Arrays.fill(cost, INF)
    cost(0) = 0L
    var i = 1
    while (i <= m) {
      val maxJ = math.max(0, i - vocab.maxPieceLen)
      var j = i - 1
      while (j >= maxJ) {
        if (cost(j) != INF) {
          val c = vocab.costs.get(w.substring(offs(j), offs(i)))
          if (c != null) {
            val nc = cost(j) + c.longValue()
            val nn = np(j) + 1
            val nm = if (j == 0) mask(j) else mask(j) | (1L << j)
            val better = cost(i) == INF || nc < cost(i) ||
              (nc == cost(i) && (nn < np(i) ||
                (nn == np(i) && nm < mask(i))))
            if (better) {
              cost(i) = nc; np(i) = nn; mask(i) = nm; back(i) = j
            }
          }
        }
        j -= 1
      }
      i += 1
    }
    if (cost(m) == INF) return null
    val pieces = new Array[AnyRef](np(m))
    var pos = m
    var k = np(m) - 1
    while (pos > 0) {
      val j = back(pos)
      pieces(k) = UTF8String.fromString(w.substring(offs(j), offs(pos)))
      pos = j
      k -= 1
    }
    new GenericArrayData(pieces)
  }

  override protected def nullSafeEval(input: Any): Any =
    segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("viterbiSegment", this,
      classOf[ViterbiSegment].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("segResult")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $r =
         |  $ref.segment($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : ViterbiSegment = copy(child = newChild)

  override def prettyName: String = "graft_viterbi_segment"
}
