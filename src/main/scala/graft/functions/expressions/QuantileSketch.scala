package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable quantile sketch over an integral column — the fifth leg of
  * the sketch family (X35 frequency, X50 distinct, X54 membership, X85
  * count: this one answers "where do the order statistics sit?" with
  * bounded state). The buffer is a value→weight histogram capped at
  * `capacity` DISTINCT values; overflow triggers a merge-reduce
  * compaction (Manku-Rajagopalan-Lindsay, SIGMOD 1998 lineage): sorted
  * adjacent pairs collapse into their heavier member, so each
  * compaction introduces rank error at most the lighter weight of any
  * collapsed pair — small for near-uniform weights, and zero for
  * queries outside collapsed runs. Error accumulates per compaction and
  * is spec-asserted empirically; this is an engineering sketch, not a
  * KLL proof.
  *
  * The load-bearing contract (the FreqSketch X42 convention): BELOW
  * capacity the sketch never compacts and IS the exact value histogram
  * — quantiles are exact order statistics, deterministic under any
  * partitioning or merge order, and replayable in any engine as
  * "smallest v with cum_weight ≥ ⌈q·n⌉". The result carries an `exact`
  * flag so callers can gate on the regime (discretized columns —
  * quantities, scores, bucketed latencies — live in it permanently).
  * Above capacity the summary stays bounded but becomes merge-order
  * dependent within its error envelope, like every streaming quantile
  * sketch.
  *
  * Mergeable (union histograms, re-compact), so it rides map-side
  * partial aggregation: the shuffle carries ≤ capacity (value, weight)
  * pairs per partition regardless of row count.
  *
  * Exposed to SQL as `graft_quantiles(v, capacity, fractions)`;
  * returns struct<n_total bigint, n_entries bigint, exact boolean,
  * values array<bigint>> with values(i) = the ⌈fractionsᵢ·n⌉-th
  * smallest (fraction 0 → minimum).
  */
case class QuantileSketch(
    child: Expression,
    capacity: Expression,
    fractions: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSketch.Buffer] {

  private lazy val k: Int = capacity.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other =>
      throw new IllegalArgumentException(s"invalid capacity: $other")
  }

  private lazy val qs: Array[Double] = fractions.eval() match {
    case a: ArrayData => a.toDoubleArray()
    case other =>
      throw new IllegalArgumentException(s"invalid fractions: $other")
  }

  override def children: Seq[Expression] = Seq(child, capacity, fractions)
  override def nullable: Boolean = false
  override def dataType: DataType = QuantileSketch.ResultType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType && child.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        "graft_quantiles requires an int/bigint value column, got " +
          s"${child.dataType}")
    else if (!capacity.foldable || !fractions.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_quantiles capacity and fractions must be literals")
    else capacity.eval() match {
      case i: Int if i >= 2 && i <= 1000000 =>
        fractions.eval() match {
          case a: ArrayData
              if fractions.dataType.isInstanceOf[ArrayType] &&
                fractions.dataType.asInstanceOf[ArrayType]
                  .elementType == DoubleType &&
                a.numElements() > 0 &&
                a.toDoubleArray().forall(q => q >= 0.0 && q <= 1.0) =>
            TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure(
            "graft_quantiles fractions must be a non-empty " +
              "array<double> literal with values in [0, 1]")
        }
      case v => TypeCheckResult.TypeCheckFailure(
        s"graft_quantiles capacity must be in [2, 1000000], got $v")
    }

  override def createAggregationBuffer(): QuantileSketch.Buffer =
    new QuantileSketch.Buffer(k)

  override def update(buffer: QuantileSketch.Buffer,
      input: InternalRow): QuantileSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v match {
      case l: Long => l
      case i: Int => i.toLong
    }, 1L)
    buffer
  }

  override def merge(buffer: QuantileSketch.Buffer,
      other: QuantileSketch.Buffer): QuantileSketch.Buffer = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: QuantileSketch.Buffer): Any =
    InternalRow(buffer.n, buffer.size.toLong, !buffer.compacted,
      new GenericArrayData(buffer.quantiles(qs).map(v => v: Any)))

  override def serialize(buffer: QuantileSketch.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.capacity)
    out.writeLong(buffer.n)
    out.writeBoolean(buffer.compacted)
    val entries = buffer.sortedEntries
    out.writeInt(entries.length)
    entries.foreach { case (v, w) => out.writeLong(v); out.writeLong(w) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): QuantileSketch.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new QuantileSketch.Buffer(in.readInt())
    buf.n = in.readLong()
    buf.compacted = in.readBoolean()
    val m = in.readInt()
    var i = 0
    while (i < m) {
      buf.addWeighted(in.readLong(), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketch =
    copy(child = newChildren(0), capacity = newChildren(1),
      fractions = newChildren(2))

  override def prettyName: String = "graft_quantiles"
}

object QuantileSketch {

  val ResultType: DataType = StructType(Seq(
    StructField("n_total", LongType, nullable = false),
    StructField("n_entries", LongType, nullable = false),
    StructField("exact", BooleanType, nullable = false),
    StructField("values", ArrayType(LongType, containsNull = false),
      nullable = false)))

  def apply(child: Expression, k: Int, fractions: Seq[Double])
      : QuantileSketch =
    QuantileSketch(child, Literal(k),
      Literal.create(fractions.toArray,
        ArrayType(DoubleType, containsNull = false)))

  /** value→weight histogram, compacted pairwise when distinct values
    * exceed capacity. `parity` alternates which member of a
    * weight-tied pair survives, de-biasing repeated compactions.
    */
  final class Buffer(val capacity: Int) {
    private val weights = mutable.TreeMap.empty[Long, Long]
    var n: Long = 0L
    var compacted: Boolean = false
    private var parity: Boolean = false

    def size: Int = weights.size

    def add(v: Long, w: Long): Unit = {
      n += w
      addWeighted(v, w)
    }

    /** Weight insert WITHOUT touching n (deserialize path: n is read
      * from the header, entries re-inserted).
      */
    def addWeighted(v: Long, w: Long): Unit = {
      weights.updateWith(v) {
        case Some(x) => Some(x + w)
        case None => Some(w)
      }
      if (weights.size > capacity) compact()
    }

    private def compact(): Unit = {
      compacted = true
      val entries = weights.toArray // ascending by value
      weights.clear()
      var i = 0
      while (i + 1 < entries.length) {
        val (v1, w1) = entries(i)
        val (v2, w2) = entries(i + 1)
        val keepFirst = if (w1 != w2) w1 > w2 else parity
        weights.update(if (keepFirst) v1 else v2, w1 + w2)
        i += 2
      }
      if (i < entries.length) weights.update(entries(i)._1, entries(i)._2)
      parity = !parity
    }

    def mergeWith(other: Buffer): Unit = {
      n += other.n
      compacted ||= other.compacted
      other.weights.foreach { case (v, w) => addWeighted(v, w) }
    }

    def sortedEntries: Array[(Long, Long)] = weights.toArray

    /** values(i) = smallest v with cum_weight ≥ max(1, ⌈qᵢ·n⌉); empty
      * input yields an empty array (the struct's n_total 0 signals it).
      */
    def quantiles(qs: Array[Double]): Array[Long] = {
      if (weights.isEmpty) return Array.empty[Long]
      val entries = sortedEntries
      qs.map { q =>
        val target = math.max(1L, math.ceil(q * n).toLong)
        var cum = 0L
        var i = 0
        var res = entries.last._1
        var found = false
        while (i < entries.length && !found) {
          cum += entries(i)._2
          if (cum >= target) { res = entries(i)._1; found = true }
          i += 1
        }
        res
      }
    }
  }
}
