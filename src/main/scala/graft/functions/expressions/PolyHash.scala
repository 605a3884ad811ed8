package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling hash: fold over a string's code points of
  * (h*31 + cp) % 1000000007 — the engine-portable fingerprint/MinHash
  * token hash (same number DuckDB computes via list_reduce over ascii()).
  *
  * Exists because the composable form —
  * aggregate(split(s,''), 0L, (h,c) -> (h*31+ascii(c)) % p) — allocates a
  * one-character UTF8String per input character; on a 100 TB corpus the
  * hash is applied per shingle, making it the pipeline's hottest scalar.
  * This expression runs a tight primitive loop and participates in
  * whole-stage codegen via a single static call.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"polyhash requires a string argument, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)

  override def prettyName: String = "graft_polyhash"
}

object PolyHash {
  final val Mod = 1000000007L

  /** Tight code-point loop; ASCII fast path over the raw UTF-8 bytes. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      val b = bytes(i) & 0xff
      if (b < 0x80) { h = (h * 31 + b) % Mod; i += 1 }
      else ascii = false
    }
    if (ascii) h
    else {
      // non-ASCII tail: fall back to code points (matches ascii()/DuckDB)
      val str = s.toString
      h = 0L
      var j = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        h = (h * 31 + cp) % Mod
        j += Character.charCount(cp)
      }
      h
    }
  }
}
