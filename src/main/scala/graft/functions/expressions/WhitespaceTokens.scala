package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace tokenization — `filter(split(text, "\\s+"), t -> t <> '')`
  * as ONE compiled byte scan per row.
  *
  * This is the `Shingles` motivation one stage earlier: `tokens()` is
  * the first map stage of essentially EVERY text operator in the engine
  * (the dedup family, Gopher/quality scoring, LM perplexity, BPE and
  * unigram-LM censuses, DSIR, contamination, n-gram novelty, ...), and
  * the HOF form pays twice per row — the Java regex engine for
  * `split("\\s+")`, then an interpreted `ArrayFilter` lambda per
  * element (CodegenFallback, breaking the whole-stage span). The r16
  * FallbackAudit sweep showed `ArrayFilter` from this one helper on
  * ~40 batch gates' corpus-scale paths. One maximal-run byte scan emits
  * each token once and participates in whole-stage codegen.
  *
  * Semantics are EXACTLY the HOF form's:
  *  - Java-regex `\s` in default mode is the six ASCII characters
  *    {space, \t, \n, \x0B, \f, \r} — all single bytes that never occur
  *    inside a UTF-8 multi-byte sequence, so a byte scan splits
  *    identically to `Pattern.split` (non-ASCII whitespace such as
  *    U+00A0 is NOT a delimiter in either form);
  *  - maximal non-whitespace runs become tokens; leading/trailing/empty
  *    fragments (which `split` emits and the filter drops) never
  *    materialize;
  *  - "" and all-whitespace input → empty array; null → null.
  *
  * Determinism note (pre-existing, faithfully preserved): Java `\s`
  * includes \x0B where RE2-lineage engines' `\s` (e.g. DuckDB's
  * regexp_split_to_array in the oracles) does not — a corpus containing
  * a vertical tab would diverge engine-vs-oracle on every text gate,
  * under the HOF form exactly as under this one. The gate corpora
  * contain none.
  */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType,
    containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got $other")
    }

  /** Instance entry point shared by eval and generated code. */
  def tokenize(s: UTF8String): GenericArrayData = {
    // getBytes returns the UNDERLYING buffer (no copy) when the string is
    // exactly array-aligned (offset 0, full length); the token UTF8Strings
    // below are views over `b`, so an aliased buffer would let emitted
    // tokens alias caller-owned (possibly reused) memory. One reference
    // check buys the defensive copy only in the aliased case.
    val raw = s.getBytes
    val b = if (raw.asInstanceOf[AnyRef] eq s.getBaseObject)
      java.util.Arrays.copyOf(raw, raw.length)
    else raw
    val n = b.length
    // count tokens first: token arrays are built exactly-sized with no
    // growth copies (documents are the hot input; two passes over the
    // row's bytes beat ArrayList churn)
    var cnt = 0
    var i = 0
    while (i < n) {
      val ws = isWs(b(i))
      if (!ws && (i == 0 || isWs(b(i - 1)))) cnt += 1
      i += 1
    }
    if (cnt == 0) return WhitespaceTokens.Empty
    val out = new Array[AnyRef](cnt)
    var k = 0
    i = 0
    while (i < n) {
      while (i < n && isWs(b(i))) i += 1
      val start = i
      while (i < n && !isWs(b(i))) i += 1
      if (i > start) {
        out(k) = UTF8String.fromBytes(b, start, i - start)
        k += 1
      }
    }
    new GenericArrayData(out)
  }

  // Java-regex \s (default mode): [ \t\n\x0B\f\r] = bytes 9..13 and 32.
  // UTF-8 continuation/lead bytes are >= 0x80 (negative as signed
  // bytes), so they never match.
  @inline private def isWs(c: Byte): Boolean =
    c == 32 || (c >= 9 && c <= 13)

  override protected def nullSafeEval(input: Any): Any =
    tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wsTokens", this,
      classOf[WhitespaceTokens].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.tokenize($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WhitespaceTokens = copy(child = newChild)

  override def prettyName: String = "graft_tokens"
}

object WhitespaceTokens {
  /** Shared empty result — all-whitespace rows allocate nothing. */
  private val Empty = new GenericArrayData(new Array[AnyRef](0))
}
