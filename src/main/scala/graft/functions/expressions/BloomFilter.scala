package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Mergeable Bloom filter over 64-bit fingerprints — the runtime-filter
  * primitive for incremental ingest (see
  * [[graft.dedup.NearDup.incrementalDedupBloom]]).
  *
  * Update sets `numHashes` bits chosen by double hashing (Kirsch &
  * Mitzenmacher 2006: bit_i = h1 + i*h2, both derived from a
  * splitmix64-style finalizer — public-domain mixing constants); merge
  * is a bitwise OR, so the sketch rides Spark's map-side partial
  * aggregation and the shuffle carries one fixed-size bitset per
  * partition regardless of key count. NO FALSE NEGATIVES ever — a probe
  * that returns false is definitely absent, which is what lets the
  * dedup fast path skip the shuffle for definitely-new rows while
  * staying exact.
  *
  * Sizing: ~10 bits/key with 5-7 hashes gives <1% false positives; at
  * the `numBits` cap (2^30) one filter covers ~100M seen keys in
  * 128 MB — a broadcastable runtime filter. Beyond that, shard the seen
  * corpus by fingerprint range and build one filter per shard.
  *
  * Serialized form (and the BinaryType value `eval` returns):
  * [numHashes: int64 LE][bitset words: int64 LE ...] — probes derive
  * numBits from the payload length, so `graft_bloom_contains` needs no
  * extra parameters.
  */
case class BloomAgg(
    child: Expression,
    bits: Expression,
    hashes: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val numBits: Int = bits.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"invalid bits: $other")
  }
  private lazy val numHashes: Int = hashes.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"invalid hashes: $other")
  }

  override def children: Seq[Expression] = Seq(child, bits, hashes)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = {
    def lit(e: Expression, name: String)(ok: Long => Boolean): Option[String] =
      if (!e.foldable) Some(s"graft_bloom $name must be a literal")
      else e.eval() match {
        case i: Int if ok(i.toLong) => None
        case l: Long if ok(l) => None
        case v => Some(s"graft_bloom $name out of range: $v")
      }
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom requires a bigint fingerprint column, got ${child.dataType}")
    else
      lit(bits, "bits")(b => b >= 64 && b <= (1L << 30) &&
          java.lang.Long.bitCount(b) == 1)
        .orElse(lit(hashes, "hashes")(h => h >= 1 && h <= 16))
        .map(TypeCheckResult.TypeCheckFailure)
        .getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  // buffer word 0 carries numHashes so serialize/eval share one layout
  override def createAggregationBuffer(): Array[Long] = {
    val buf = new Array[Long](1 + numBits / 64)
    buf(0) = numHashes.toLong
    buf
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.set(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 1
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = serialize(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren(0), bits = newChildren(1), hashes = newChildren(2))

  override def prettyName: String = "graft_bloom"
}

object BloomAgg {
  def apply(child: Expression, numBits: Int, numHashes: Int): BloomAgg =
    BloomAgg(child, Literal(numBits), Literal(numHashes))
}

/** `graft_bloom_contains(bloom, fingerprint)` — membership probe against
  * a [[BloomAgg]] bitset; codegen'd to one static call so a map-only
  * probe stage stays inside whole-stage codegen.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains filter must be binary, got ${left.dataType}")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains probe must be bigint, got ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(bloom: Any, v: Any): Any =
    Bloom.contains(bloom.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, v) =>
      s"graft.functions.expressions.Bloom.contains($b, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_bloom_contains"
}

/** Shared bit arithmetic — static so generated code can call it. */
object Bloom {

  /** splitmix64 finalizer (Steele/Lea/Flood, public domain). */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Sets the k double-hashed bits of v in buf (word 0 = numHashes). */
  def set(buf: Array[Long], v: Long): Unit = {
    val mask = (buf.length - 1) * 64 - 1 // numBits is a power of two
    val k = buf(0).toInt
    val h1 = mix(v)
    val h2 = mix(v ^ 0x5555555555555555L) | 1L
    var i = 0
    while (i < k) {
      val bit = ((h1 + i * h2) & mask).toInt
      buf(1 + (bit >> 6)) |= 1L << (bit & 63)
      i += 1
    }
  }

  /** Probes the serialized little-endian form BloomAgg emits. */
  def contains(bytes: Array[Byte], v: Long): Boolean = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val k = bb.getLong(0).toInt
    val numBits = (bytes.length / 8 - 1) * 64
    val mask = numBits - 1
    val h1 = mix(v)
    val h2 = mix(v ^ 0x5555555555555555L) | 1L
    var i = 0
    while (i < k) {
      val bit = ((h1 + i * h2) & mask).toInt
      if ((bb.getLong(8 * (1 + (bit >> 6))) & (1L << (bit & 63))) == 0L)
        return false
      i += 1
    }
    true
  }
}
