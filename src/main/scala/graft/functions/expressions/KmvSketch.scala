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

/** Bottom-k / KMV sketch: keeps the k DISTINCT items with the smallest
  * (polyhash(item), item) priority. One bounded summary yields two
  * things a 100 TB dataset card needs per group:
  *
  *  - a DETERMINISTIC uniform sample of the group's distinct items (the
  *    hash order is a fixed pseudo-random permutation, so the bottom-k
  *    of it is a uniform-without-replacement sample that every re-run,
  *    every partitioning, and every engine reproduces bit-for-bit —
  *    unlike reservoir sampling, whose result depends on encounter
  *    order), and
  *  - a distinct-count estimate (Bar-Yossef et al. 2002): exact when
  *    fewer than k distinct items were seen, else (k−1)·M div h_k where
  *    h_k is the k-th smallest hash and M the hash modulus.
  *
  * Bottom-k is a MERGEABLE summary (union, retake bottom-k — lossless,
  * Agarwal et al. PODS 2012), so the sketch rides Spark's map-side
  * partial aggregation and the shuffle carries at most k entries per
  * partition regardless of item cardinality. Because every step is
  * deterministic integer arithmetic over the engine-portable PolyHash,
  * BOTH regimes replay exactly in DuckDB SQL (t23 gates the
  * approximate regime — rare for a sketch, whose estimates usually
  * depend on RNG or platform hashing).
  *
  * Exposed to SQL as `graft_sample(item, k)` via GraftExtensions;
  * returns struct<sample: array<string> in (hash, item) order,
  * est_distinct: bigint>.
  *
  * Ties between DIFFERENT items on the same hash value break on the
  * item's UTF-16 string order — identical to UTF-8 byte order for
  * ASCII items; non-ASCII items above U+FFFF may order differently
  * than a byte-comparing engine, which affects only which of the two
  * colliding items ranks first.
  */
case class KmvSketch(
    child: Expression,
    capacity: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvSketch.Buffer] {

  private lazy val k: Int = capacity.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other =>
      throw new IllegalArgumentException(s"invalid capacity: $other")
  }

  override def children: Seq[Expression] = Seq(child, capacity)
  override def nullable: Boolean = false

  override def dataType: DataType = KmvSketch.ResultType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_sample requires a string item column, got ${child.dataType}")
    else if (!capacity.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_sample capacity must be a literal")
    else capacity.eval() match {
      case i: Int if i > 0 && i <= 100000 => TypeCheckResult.TypeCheckSuccess
      case l: Long if l > 0 && l <= 100000 => TypeCheckResult.TypeCheckSuccess
      case v => TypeCheckResult.TypeCheckFailure(
        s"graft_sample capacity must be in [1, 100000], got $v")
    }

  override def createAggregationBuffer(): KmvSketch.Buffer =
    new KmvSketch.Buffer(k)

  override def update(buffer: KmvSketch.Buffer,
      input: InternalRow): KmvSketch.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val u = v.asInstanceOf[UTF8String]
      buffer.add(PolyHash.hash(u), u.toString)
    }
    buffer
  }

  override def merge(buffer: KmvSketch.Buffer,
      other: KmvSketch.Buffer): KmvSketch.Buffer = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: KmvSketch.Buffer): Any = {
    val entries = buffer.sorted
    val sample = new GenericArrayData(
      entries.map(e => UTF8String.fromString(e._2): Any))
    InternalRow(sample, buffer.estimate)
  }

  override def serialize(buffer: KmvSketch.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.capacity)
    val entries = buffer.sorted
    out.writeInt(entries.length)
    entries.foreach { case (h, item) =>
      // length-prefixed raw UTF-8, NOT writeUTF: items are arbitrary
      // strings and writeUTF throws past 64 KB of encoded length
      val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeLong(h); out.writeInt(b.length); out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvSketch.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KmvSketch.Buffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val h = in.readLong()
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.add(h, new String(b, java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren(0), capacity = newChildren(1))

  override def prettyName: String = "graft_sample"
}

object KmvSketch {

  val ResultType: DataType = StructType(Seq(
    StructField("sample", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("est_distinct", LongType, nullable = false)))

  def apply(child: Expression, k: Int): KmvSketch =
    KmvSketch(child, Literal(k))

  /** The k smallest (hash, item) pairs over distinct items seen so far.
    * A TreeSet both dedups re-occurring items (same (h, item) entry)
    * and keeps the max entry at hand for the bound check.
    */
  final class Buffer(val capacity: Int) {
    private val entries = mutable.TreeSet.empty[(Long, String)]

    def add(h: Long, item: String): Unit = {
      if (entries.size < capacity) entries.add((h, item))
      else {
        val last = entries.last
        val e = (h, item)
        if (Ordering.Tuple2[Long, String].lt(e, last) && entries.add(e))
          entries.remove(last)
      }
    }

    def mergeWith(other: Buffer): Unit =
      other.entries.foreach { case (h, item) => add(h, item) }

    def sorted: Array[(Long, String)] = entries.toArray

    /** Exact below capacity; (k−1)·M div h_k at capacity (integer
      * division — replayable as `//` in any engine). h_k = 0 means k
      * colliding items all hashed to zero; degenerate, return k.
      */
    def estimate: Long =
      if (entries.size < capacity) entries.size.toLong
      else {
        val hk = entries.last._1
        if (hk == 0L) capacity.toLong
        else (capacity - 1).toLong * PolyHash.Mod / hk
      }
  }
}
