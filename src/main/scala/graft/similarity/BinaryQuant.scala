package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary (1-bit) quantization of embeddings with Hamming-distance
  * search — the fourth leg of the ANN compression story: IVF prunes
  * WHICH vectors a query scores (d07), int8 shrinks each COMPONENT 8×
  * (d10), JL shrinks HOW MANY components there are (d19), PQ codes
  * m-dim subvectors (d33); binary quantization takes the limit — ONE
  * bit per retained dimension, so a 64-dim float64 vector (512 bytes)
  * becomes a 64-bit code (8 bytes, 64×), and candidate distance is two
  * XOR+popcounts instead of 64 multiplies.
  *
  * The bits are hyperplane signs (Charikar, STOC 2002 — SimHash for
  * real vectors): bit j = sign of the dot with the deterministic ±1
  * hyperplane [[Projection.sign]] row j, so for two vectors the
  * probability a bit DISAGREES is θ/π (Goemans–Williamson), making
  * Hamming distance a monotone estimator of angular distance. Signs of
  * symmetric-hyperplane dots are mean-free by construction, so no
  * per-dimension centering pass is needed (raw component signs — the
  * vector-DB "BQ" shortcut — degrade badly off-centered data). This is
  * the ranking counterpart of [[Ann.lshBucket]]: the same sign bits,
  * used there to PARTITION into buckets, used here as a compressed
  * representation to RANK by.
  *
  * Everything replays bitwise in SQL (gate d36): the hyperplane dots
  * are the d19-proven fold contract, a sign test is exact on any IEEE
  * engine where the dot itself is exact, and packing/XOR/popcount are
  * integer arithmetic. Codes pack 32 bits per long word (not 64: a
  * 2^63 bit would overflow signed BIGINT in replay engines; 32-bit
  * words stay in [0, 2^32) — positive, portable, popcount-equal).
  *
  * Scale (100 TB, 1000 executors): `encode` is map-only (hyperplane
  * rows are plan literals; ShuffleContractSpec pins zero exchanges) —
  * encode once, persist `bcode` next to the id, and the candidate scan
  * reads bits/8 bytes per row instead of the vector. `searchHamming`'s
  * candidate pass is the same join shape as brute force at 64× less
  * scan and ~30× less arithmetic; [[searchIvfHamming]] composes with
  * IVF cells (the [[Pq.searchIvfPq]] shape) when even the linear code
  * scan is too much.
  */
object BinaryQuant {

  private val wordBits = 32

  /** Number of 32-bit code words for a `bits`-bit code. */
  def numWords(bits: Int): Int = (bits + wordBits - 1) / wordBits

  /** Packs the sign bits of a projected-coordinate array column into
    * array<long> words: word w = fold over its coordinates of
    * acc·2 + [p > 0] (first coordinate is the word's MSB). Exact
    * integer arithmetic, max 2^32 − 1 per word. ONE compiled call per
    * row (`expressions.PackBits`, r15 — the HOF form interpreted a
    * transform-of-aggregate per word).
    */
  private def pack(pcol: Column, bits: Int): Column =
    graft.core.Graft.column(graft.functions.expressions.PackBits(
      graft.core.Graft.expression(pcol), bits))

  /** Adds `bcode` (array<long>, [[numWords]](bits) words of 32 sign
    * bits): bit j = [hyperplane_j · vec > 0] with hyperplane rows from
    * [[Projection.sign]]. Map-only; other columns pass through.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      bits: Int): DataFrame = {
    require(bits >= 1 && bits <= dim,
      s"bits must be in [1, dim=$dim]: $bits (Projection caps hyperplane"
        + " count at the input dimension)")
    Projection.project(df, vecCol, dim, bits, "__bq_proj")
      .withColumn("bcode", pack(col("__bq_proj"), bits))
      .drop("__bq_proj")
  }

  /** Hamming distance between two packed code columns: Σ_w
    * popcount(a_w XOR b_w). Integer, exact, engine-portable. ONE
    * compiled call per candidate PAIR (`expressions.HammingWords`, r15 —
    * the search's hottest site, the `AdcDot` analogue).
    */
  def hamming(a: Column, b: Column): Column =
    graft.core.Graft.column(graft.functions.expressions.HammingWords(
      graft.core.Graft.expression(a), graft.core.Graft.expression(b)))

  /** Approximate top-k cosine neighbors by Hamming shortlist → exact
    * rerank: queries are encoded on the fly, every (query, corpus)
    * code pair is scored by [[hamming]], the `shortlist` smallest per
    * query (ties: nid) survive, and the exact cosine rerank on the
    * original vectors orders the final k. Output (qid, rank 1..k, nid,
    * cosine_sim) — the shared similarity contract.
    */
  def searchHamming(encoded: DataFrame, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, dim: Int,
      bits: Int, k: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val cand = encoded.select(col(idCol).as("nid"),
      col("bcode").as("ncode"))
    val qs = encode(queries, idCol, vecCol, dim, bits)
      .select(col(idCol).as("qid"), col("bcode").as("qcode"))
    val shortW = Window.partitionBy("qid")
      .orderBy(col("hd").asc, col("nid"))
    val short = broadcast(qs).join(cand, col("qid") =!= col("nid"))
      .withColumn("hd", hamming(col("qcode"), col("ncode")))
      .withColumn("srn", row_number().over(shortW))
      .filter(col("srn") <= shortlist)
      .select("qid", "nid")
    Pq.rerank(short, corpus, queries, idCol, vecCol, k)
  }

  /** Cell-pruned Hamming search — the IVF × binary-quantization
    * composition the scaladoc above promises (the [[Pq.searchIvfPq]]
    * shape): candidates come only from each query's `nprobe` probed
    * cells, the Hamming shortlist runs over packed codes within them,
    * and the exact cosine rerank finishes. `encodedAssigned` is an
    * `Ivf.assign`-shaped corpus run through [[encode]] (id, cid, bcode)
    * — at 100 TB this pairs with `Ivf.writePartitioned` exactly like
    * IVF-PQ: partition pruning opens nprobe/nlist of the files AND each
    * file stores bits/8 bytes per row instead of the vector. The query
    * code rides the probe frame (duplicated ×nprobe per query —
    * numWords longs, cheaper than a join to dedupe it, the qtab
    * convention).
    */
  def searchIvfHamming(encodedAssigned: DataFrame, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, ivf: Ivf.Model,
      dim: Int, bits: Int, k: Int, nprobe: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val prb = encode(Ivf.probes(queries, idCol, vecCol, ivf, nprobe),
        "qid", "qvec", dim, bits)
      .select(col("qid"), col("cid"), col("bcode").as("qcode"))
    cellHammingSearch(prb, encodedAssigned, corpus, queries, idCol,
      vecCol, k, nprobe, shortlist)
  }

  /** Cell-pruned Hamming search over a HIERARCHICALLY assigned corpus —
    * the [[Pq.searchIvfPqResidualHier]] move applied to the binary arm:
    * `encodedAssigned` comes from `IvfHier.assignHier` → [[encode]]
    * (leaf cell ids pass through exactly as flat ones do, so with
    * wassign = nsuper the two pipelines are bit-identical end to end),
    * probing is the compiled two-stage rank (top-`wprobe` supers →
    * `nprobe` of their leaves), and the Hamming shortlist + exact
    * rerank are [[searchIvfHamming]]'s verbatim. The measured ≥10×
    * coarse-quantizer configuration, now available at every code
    * granularity: raw (d32), PQ-residual (d38), one bit (this).
    */
  def searchIvfHammingHier(encodedAssigned: DataFrame, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String,
      h: IvfHier.HierModel, dim: Int, bits: Int, k: Int, wprobe: Int,
      nprobe: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val prb = encode(
        IvfHier.probesHier(queries, idCol, vecCol, h, wprobe, nprobe),
        "qid", "qvec", dim, bits)
      .select(col("qid"), col("cid"), col("bcode").as("qcode"))
    cellHammingSearch(prb, encodedAssigned, corpus, queries, idCol,
      vecCol, k, nprobe, shortlist)
  }

  /** Persist an encoded assigned corpus for the at-scale binary layout:
    * PARTITIONED BY cell id (the `Ivf.writePartitioned` discipline — one
    * directory per cell, probed reads partition-pruned) with the code
    * stored as BINARY of ⌈bits/8⌉ bytes per row (`WordsToCode` — full
    * words big-endian, the last word's low bits in ⌈r/8⌉ bytes). This is
    * the bytes-on-disk win the scaladoc above argues from: a 64-bit code
    * occupies 8 bytes next to the id, 64× below the float64 vector it
    * stands in for. `encodedAssigned` is `Ivf.assign`/`IvfHier.assignHier`
    * output run through [[encode]] — (id, cid, bcode).
    */
  def writeIvfBinary(encodedAssigned: DataFrame, path: String,
      bits: Int, attrCols: Seq[String] = Nil): Unit =
    Ivf.writePartitioned(
      binaryStorageRows(encodedAssigned, bits, attrCols), path)

  /** Append an encoded batch into an existing [[writeIvfBinary]] store
    * (`Ivf.appendPartitioned` — the d44 incremental-ingestion
    * discipline on the binary arm: codes are per-row functions of the
    * frozen hyperplanes, so batching cannot change any stored byte).
    */
  def appendIvfBinary(encodedBatch: DataFrame, path: String,
      bits: Int, attrCols: Seq[String] = Nil): Unit =
    Ivf.appendPartitioned(
      binaryStorageRows(encodedBatch, bits, attrCols), path)

  private def binaryStorageRows(encodedAssigned: DataFrame,
      bits: Int, attrCols: Seq[String] = Nil): DataFrame =
    encodedAssigned.select(col("id") +: col("cid") +:
      graft.core.Graft.column(graft.functions.expressions.WordsToCode(
        graft.core.Graft.expression(col("bcode")), bits)).as("code") +:
      attrCols.map(col): _*)

  /** Search a [[writeIvfBinary]] corpus — [[searchIvfHamming]] routed
    * through storage: probed cell ids (≤ nlist, model-bounded — not a
    * data-sized collect) push down as a partition filter so only the
    * probed cells' code files are read, the stored bytes decode back to
    * the exact words `PackBits` produced (lossless by construction), and
    * the Hamming shortlist + exact rerank are verbatim. End to end the
    * 100 TB binary read path: nprobe/nlist of the files at bits/8 bytes
    * per row.
    *
    * @param filter optional attribute predicate over columns persisted
    *               via [[writeIvfBinary]]'s `attrCols` — the d51
    *               contract on the binary arm: pushed beneath the
    *               pruned scan, post-filter semantics
    */
  def searchIvfBinary(path: String, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, ivf: Ivf.Model, dim: Int, bits: Int,
      k: Int, nprobe: Int, shortlist: Int,
      filter: Option[Column] = None): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val spark = queries.sparkSession
    // probe lineage evaluated twice (cid collect + the probe join in the
    // returned plan); deliberately NOT cache()d — the second consumer
    // executes after this method returns (the searchIvfQuantized
    // bounded-recompute rationale).
    val prbRaw = Ivf.probes(queries, idCol, vecCol, ivf, nprobe)
    val probedCids = prbRaw.select("cid").distinct().collect()
      .map(_.getInt(0)).toSeq
    val prb = encode(prbRaw, "qid", "qvec", dim, bits)
      .select(col("qid"), col("cid"), col("bcode").as("qcode"))
    val pruned = spark.read.parquet(path)
      .where(col("cid").isin(probedCids: _*))
    val enc = filter.fold(pruned)(pruned.where)
      .select(col("id"), col("cid"),
        graft.core.Graft.column(graft.functions.expressions.CodeToWords(
          graft.core.Graft.expression(col("code")), bits)).as("bcode"))
    cellHammingSearch(prb, enc, corpus, queries, idCol, vecCol, k,
      nprobe, shortlist)
  }

  /** [[searchIvfBinary]] with the hierarchical coarse quantizer doing
    * the cell pruning ([[searchIvfHammingHier]] through storage): leaf
    * cids are flat cids, so the [[writeIvfBinary]] layout applies
    * verbatim — only the probe stage changes to the compiled two-stage
    * rank. The stored counterpart of the measured 100 TB binary
    * configuration.
    */
  def searchIvfBinaryHier(path: String, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String,
      h: IvfHier.HierModel, dim: Int, bits: Int, k: Int, wprobe: Int,
      nprobe: Int, shortlist: Int,
      filter: Option[Column] = None): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val spark = queries.sparkSession
    val prbRaw = IvfHier.probesHier(queries, idCol, vecCol, h, wprobe,
      nprobe)
    val probedCids = prbRaw.select("cid").distinct().collect()
      .map(_.getInt(0)).toSeq
    val prb = encode(prbRaw, "qid", "qvec", dim, bits)
      .select(col("qid"), col("cid"), col("bcode").as("qcode"))
    val pruned = spark.read.parquet(path)
      .where(col("cid").isin(probedCids: _*))
    val enc = filter.fold(pruned)(pruned.where)
      .select(col("id"), col("cid"),
        graft.core.Graft.column(graft.functions.expressions.CodeToWords(
          graft.core.Graft.expression(col("code")), bits)).as("bcode"))
    cellHammingSearch(prb, enc, corpus, queries, idCol, vecCol, k,
      nprobe, shortlist)
  }

  /** Shared tail of the cell-pruned Hamming searches: cell join from a
    * (qid, cid, qcode) probe frame, popcount(xor) shortlist within the
    * probed cells, exact cosine rerank.
    */
  private def cellHammingSearch(prb: DataFrame, encodedAssigned: DataFrame,
      corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nprobe: Int, shortlist: Int): DataFrame = {
    val probeSide =
      if (Ivf.probeSideSmall(queries, idCol, nprobe)) broadcast(prb)
      else prb
    val cand = encodedAssigned.select(col("cid"), col("id").as("nid"),
      col("bcode").as("ncode"))
    val shortW = Window.partitionBy("qid")
      .orderBy(col("hd").asc, col("nid"))
    val short = cand.join(probeSide, Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("hd", hamming(col("qcode"), col("ncode")))
      .withColumn("srn", row_number().over(shortW))
      .filter(col("srn") <= shortlist)
      .select("qid", "nid")
    Pq.rerank(short, corpus, queries, idCol, vecCol, k)
  }
}
