package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Heavy-hitter (frequent-items) sketch: a Misra-Gries summary with `m`
  * counters, the provably MERGEABLE variant (Agarwal et al., "Mergeable
  * Summaries", PODS 2012): two summaries combine by pointwise-adding
  * counters, then subtracting the (m+1)-th largest value from all and
  * dropping the non-positive — exactly the partial-aggregate shape Spark
  * needs, so the sketch rides map-side combine and the shuffle carries at
  * most m counters per partition regardless of item cardinality. The
  * exact top-k (q12-style explode + count) shuffles one row per DISTINCT
  * item; at 100 TB of long-tail tokens this sketch is the scale path, and
  * the exact form is its correctness pin (FreqSketchSpec).
  *
  * Guarantees (classic MG, preserved by the mergeable merge): for every
  * item, est ≤ true ≤ est + err, where `err` is the summary's total
  * decrement; any item with true count > N/(m+1) is guaranteed present.
  *
  * Exposed to SQL as `graft_freq(item, m)` via GraftExtensions; returns
  * array<struct<item, est, err>> sorted by (est desc, item asc).
  */
case class FreqSketch(
    child: Expression,
    capacity: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqSketch.Buffer] {

  private lazy val m: Int = capacity.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other =>
      throw new IllegalArgumentException(s"invalid capacity: $other")
  }

  override def children: Seq[Expression] = Seq(child, capacity)
  override def nullable: Boolean = false

  override def dataType: DataType = FreqSketch.ResultType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_freq requires a string item column, got ${child.dataType}")
    else if (!capacity.foldable)
      TypeCheckResult.TypeCheckFailure("graft_freq capacity must be a literal")
    else capacity.eval() match {
      case i: Int if i > 0 && i <= 100000 => TypeCheckResult.TypeCheckSuccess
      case l: Long if l > 0 && l <= 100000 => TypeCheckResult.TypeCheckSuccess
      case v => TypeCheckResult.TypeCheckFailure(
        s"graft_freq capacity must be in [1, 100000], got $v")
    }

  override def createAggregationBuffer(): FreqSketch.Buffer =
    new FreqSketch.Buffer(m)

  override def update(buffer: FreqSketch.Buffer,
      input: InternalRow): FreqSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString, 1L)
    buffer
  }

  override def merge(buffer: FreqSketch.Buffer,
      other: FreqSketch.Buffer): FreqSketch.Buffer = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: FreqSketch.Buffer): Any = {
    val rows = buffer.counts.toSeq
      .sortBy { case (item, est) => (-est, item) }
      .map { case (item, est) =>
        InternalRow(UTF8String.fromString(item), est, buffer.decremented)
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buffer: FreqSketch.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.capacity)
    out.writeLong(buffer.decremented)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (item, c) =>
      // length-prefixed raw UTF-8, NOT writeUTF: items are arbitrary
      // strings and writeUTF throws past 64 KB of encoded length
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqSketch.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new FreqSketch.Buffer(in.readInt())
    buf.decremented = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.counts.put(
        new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(child = newChildren(0), capacity = newChildren(1))

  override def prettyName: String = "graft_freq"
}

object FreqSketch {

  val ResultType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  def apply(child: Expression, k: Int): FreqSketch =
    FreqSketch(child, Literal(k))

  /** Misra-Gries summary: at most `capacity` monitored items plus the
    * total amount ever subtracted (the one-sided error bound).
    */
  final class Buffer(val capacity: Int) {
    val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
    var decremented: Long = 0L

    /** Classic MG step, generalized to weighted adds. */
    def add(item: String, weight: Long): Unit = {
      counts.get(item) match {
        case Some(c) => counts.put(item, c + weight)
        case None if counts.size < capacity => counts.put(item, weight)
        case None =>
          // decrement all by the min of (weight, current min counter);
          // repeat until the item fits (weighted adds may exceed one min)
          var w = weight
          while (w > 0 && !counts.contains(item)) {
            val minC = counts.values.min
            val step = math.min(w, minC)
            decremented += step
            counts.mapValuesInPlace((_, c) => c - step)
            counts.filterInPlace((_, c) => c > 0)
            w -= step
            if (counts.size < capacity && w > 0) counts.put(item, w)
          }
      }
    }

    /** Mergeable-summaries combine: pointwise add, then trim back to
      * `capacity` by subtracting the (capacity+1)-th largest counter.
      */
    def mergeWith(other: Buffer): Unit = {
      other.counts.foreach { case (item, c) =>
        counts.put(item, counts.getOrElse(item, 0L) + c)
      }
      decremented += other.decremented
      if (counts.size > capacity) {
        val sorted = counts.values.toArray
        java.util.Arrays.sort(sorted)
        val cut = sorted(counts.size - capacity - 1) // (capacity+1)-th largest
        decremented += cut
        counts.mapValuesInPlace((_, c) => c - cut)
        counts.filterInPlace((_, c) => c > 0)
      }
    }
  }
}
