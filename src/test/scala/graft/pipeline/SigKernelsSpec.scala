package graft.pipeline

import graft.SparkSpec
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** The r18 compiled signature kernels (MinHashSig / SimHashPack) must be
  * BIT-IDENTICAL to the exploded aggregation forms they replace — the
  * d02/d04/d12/d15/d23 oracles replay the aggregation arithmetic in
  * DuckDB, so any divergence is a gate break.
  */
class SigKernelsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "völlig übermäßige zeichen ケース mixed ascii and not"),
    (4L, "a b a b a b a b a b repeated shingles collapse"),
    (5L, "one two three"),
    (6L, "x y z"), // exactly one 3-shingle
    (7L, "short"), // fewer tokens than n → empty set, filtered upstream
  ).toDF("doc_id", "text")

  private def sets = graft.dedup.NearDup.shingleSets(docs, "doc_id", "text")

  "MinHashSig" should "equal the exploded min-aggregation bitwise" in {
    val k = 8
    val agg = sets
      .select(col("id"), explode(col("shingle_set")).as("shingle"))
      .select(col("id"), polyHash(col("shingle")).as("h"))
      .groupBy("id")
      .agg(min(permute(col("h"), 0)).as("mh0"),
        (1 until k).map(i => min(permute(col("h"), i)).as(s"mh$i")): _*)
    val kernel = graft.dedup.NearDup.minhashSignatures(
      docs, "doc_id", "text", 3, k)
    val a = agg.orderBy("id").collect().map(_.toSeq)
    val b = kernel.orderBy("id").collect().map(_.toSeq)
    b shouldBe a
  }

  "SimHashPack" should "equal the exploded sum-aggregation bitwise" in {
    import graft.dedup.NearDup.{simA, simB, SimHashBits}
    val agg = {
      val hashed = sets
        .select(col("id"), explode(col("shingle_set")).as("shingle"))
        .select(col("id"), polyHash(col("shingle")).as("h"))
      val sums = (0 until SimHashBits).map { j =>
        val bit = ((col("h") * simA(j) + simB(j)) % HashMod) % 2
        sum(when(bit === 1, 1).otherwise(-1)).as(s"s$j")
      }
      val a = hashed.groupBy("id").agg(sums.head, sums.tail: _*)
      val sh = (0 until SimHashBits).map { j =>
        when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))
      }.reduceLeft(_ + _)
      a.select(col("id"), sh.as("simhash"))
    }
    val kernel = graft.dedup.NearDup.simhash(docs, "doc_id", "text")
    val a = agg.orderBy("id").collect().map(_.toSeq)
    val b = kernel.orderBy("id").collect().map(_.toSeq)
    b shouldBe a
  }

  it should "keep the near-dup pair frame identical end to end" in {
    val base = (1 to 80).map(i => s"word$i").mkString(" ")
    val before = Seq( // one near-identical pair, one distant doc
      (1L, base + " tail_a"),
      (2L, base + " tail_b"),
      (3L, "completely different words entirely here now and then some")
    ).toDF("doc_id", "text")
    val pairs = graft.dedup.NearDup
      .simhashNearDuplicates(before, "doc_id", "text")
      .orderBy("id_a", "id_b").collect()
    pairs.map(r => (r.getLong(0), r.getLong(1))) should
      contain only ((1L, 2L))
  }

  "MinHashSig eval paths" should "agree between codegen and interpreted" in {
    import graft.functions.expressions.MinHashSig
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val arr = new GenericArrayData(Array[Any](
      UTF8String.fromString("a b c"), null, UTF8String.fromString("日本語")))
    val viaEval = MinHashSig.sig(arr, 4)
    viaEval should not be null
    viaEval.numElements() shouldBe 4
    // null-only array yields null (no hashable element)
    MinHashSig.sig(new GenericArrayData(Array[Any](null)), 4) shouldBe null
    // empty simhash packs 0; null elements vote -1 on every bit
    graft.functions.expressions.SimHashPack.pack(
      new GenericArrayData(Array.empty[Any])) shouldBe 0L
    graft.functions.expressions.SimHashPack.pack(
      new GenericArrayData(Array[Any](null))) shouldBe 0L
  }

  // r18 ADVICE pin: the raw kernel on an EMPTY array yields null
  // (whereas the exploded min-agg form it replaced emitted no row), and
  // the PUBLIC signature functions rely on shingleSets' size>0 filter to
  // keep the two shapes equivalent — a shingle-less document must be
  // ABSENT from both functions' output, never a null-signature row.
  "empty-shingle documents" should "be absent from signature output" in {
    import graft.functions.expressions.MinHashSig
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    MinHashSig.sig(new GenericArrayData(Array.empty[Any]), 4) shouldBe null
    // zero tokens is the only empty-set shape under sliding=false
    // (short token lists fall back to the list itself)
    val withEmpty = docs.unionByName(
      Seq((8L, ""), (9L, "   \t ")).toDF("doc_id", "text"))
    val ids = graft.dedup.NearDup
      .minhashSignatures(withEmpty, "doc_id", "text", n = 3, numHashes = 4)
      .select("id").as[Long].collect().toSet
    ids shouldBe Set(1L, 2L, 3L, 4L, 5L, 6L, 7L) // 8/9 absent, no null row
    val simIds = graft.dedup.NearDup
      .simhash(withEmpty, "doc_id", "text", n = 3)
      .select("id").as[Long].collect().toSet
    simIds shouldBe Set(1L, 2L, 3L, 4L, 5L, 6L, 7L)
    // and no null signature sneaks through either path
    graft.dedup.NearDup
      .minhashSignatures(withEmpty, "doc_id", "text", n = 3, numHashes = 4)
      .filter(col("mh0").isNull).count() shouldBe 0L
  }
}
