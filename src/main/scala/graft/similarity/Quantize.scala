package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the storage lever a
  * 100 TB vector corpus needs: 4× smaller than float32 (the int8 values
  * live in [-127, 127]), sequential-scan-friendly, and similarity runs on
  * integer dot products.
  *
  * Scheme: per-vector absolute max → `amax`; each component maps to
  * `floor(x·127/amax + 0.5)` (explicit round-half-up — engine-portable,
  * unlike round(), whose half-way rule differs across engines). Cosine is
  * SCALE-INVARIANT, so ranking needs no dequantization and the per-vector
  * scale never enters the kernel.
  *
  * Determinism (what makes the d10 gate bitwise-replayable): quantized
  * components are integral, so every dot product is an EXACT sum
  * (≤ dim·127² ≪ 2⁵³) where float summation ORDER cannot matter — the
  * only floats are one sqrt and one division over exact integers, both
  * correctly-rounded IEEE ops identical in any engine. Contrast d05/d06,
  * whose float dot products are deterministic only because both engines
  * accumulate left-to-right (AnnOracleGapSpec guards that assumption).
  */
object Quantize {

  /** THE quantization kernel — amax fold + round-half-up map as ONE
    * compiled call per row (`expressions.Int8Quantize`, r15: the HOF
    * predecessor paid an interpreted `aggregate` pass for amax plus an
    * interpreted `transform` per component; the compiled form is two
    * primitive loops, bit-identical, with `amax` riding in the struct —
    * it IS the dequantization scale `writeIvfQuantized` persists). In
    * exactly one place so the d10/d11 oracles can never diverge from
    * half of the call sites.
    */
  private def quantized(v: Column): Column =
    graft.core.Graft.column(graft.functions.expressions.Int8Quantize(
      graft.core.Graft.expression(v)))

  /** Append `outCol` = int8-quantized `vecCol` (components integral in
    * [-127, 127], stored as array<double> so downstream kernels — Ann.dot —
    * apply unchanged; a writer targeting storage would cast to
    * array<tinyint> losslessly). All other columns pass through, so this
    * composes with the pruning paths (quantize AFTER cell/bucket
    * assignment, keeping the cell id).
    */
  def withQuantized(df: DataFrame, vecCol: String, outCol: String): DataFrame =
    df.withColumn(outCol,
      quantized(col(vecCol).cast("array<double>")).getField("qvec"))

  /** Quantize `vecCol` to integral components in [-127, 127].
    * Output: (id, qvec array<double> of integral values, amax).
    */
  def scalarQuantize(df: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        quantized(col(vecCol).cast("array<double>")).as("__qz"))
      .select(col("id"), col("__qz.qvec").as("qvec"),
        col("__qz.amax").as("amax"))

  /** Exact top-k cosine neighbors in the QUANTIZED space, full form with
    * per-frame column names — quantizes both sides, then delegates to
    * `Ann.bruteForceTopK`'s kernel: compression changes the kernel's input
    * width, not the dataflow, and sharing the kernel means the float and
    * quantized brute-force paths cannot diverge.
    */
  def topK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame =
    Ann.bruteForceTopK(
      scalarQuantize(corpus, corpusId, corpusVec), "id", "qvec",
      scalarQuantize(queries, queryId, queryVec), "id", "qvec", k)

  /** Convenience form: same id/vec column names on both frames. */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame =
    topK(corpus, idCol, vecCol, queries, idCol, vecCol, k)

  /** The composed 100 TB ANN configuration: IVF cell pruning (float
    * centroids — identical probe stage to `Ivf.search`) → int8 scalar
    * quantization of the probed cells' vectors → EXACT integer-dot rerank.
    * At scale the corpus is stored partitioned by `cid` with qvec as
    * array<tinyint>: a query touches nprobe/nlist of the data at 1/4 the
    * bytes, and the rerank arithmetic is exact integer sums (engine-
    * portable by construction, like d10 — the gate d11 replays every stage
    * bitwise in DuckDB).
    *
    * @param assignedCorpus output of `Ivf.assign`: (id, cid, vec)
    */
  def ivfTopK(assignedCorpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, model: Ivf.Model, k: Int,
      nprobe: Int): DataFrame = {
    // quantize the assigned corpus KEEPING the cell id (quantize after
    // assignment, exactly as the scaladoc above prescribes); the quantized
    // array takes the `vec` slot so Ivf's scoring kernel applies verbatim
    val qc = withQuantized(assignedCorpus, "vec", "qvec")
      .select(col("id"), col("cid"), col("qvec").as("vec"))
    val prb = Ivf.probes(queries, idCol, vecCol, model, nprobe)
    Ivf.scoreProbedCells(qc,
      quantizedProbeSide(prb, queries, idCol, vecCol, nprobe), k)
  }

  /** `ivfTopK` with the hierarchical coarse quantizer doing the cell
    * pruning: identical quantized kernel, but the probe stage is
    * `IvfHier.probesHier` — in-row two-stage array math (no rank-window
    * exchange) and nsuper + w·nlist/nsuper centroid dots per query
    * instead of nlist. The 100 TB mutual-NN configuration
    * (`MutualNn.hierMutualTopOne`) runs every corpus vector through
    * here, where the flat centroid-rank term is the Θ(n^1.5) residual
    * the two-level law removes.
    */
  def hierTopK(assignedCorpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, h: IvfHier.HierModel, k: Int,
      wprobe: Int, nprobe: Int): DataFrame = {
    val qc = withQuantized(assignedCorpus, "vec", "qvec")
      .select(col("id"), col("cid"), col("qvec").as("vec"))
    val prb = IvfHier.probesHier(queries, idCol, vecCol, h, wprobe, nprobe)
    Ivf.scoreProbedCells(qc,
      quantizedProbeSide(prb, queries, idCol, vecCol, nprobe), k)
  }

  /** `hierTopK` with BOTH two-stage ranks in their broadcast-join form
    * (`IvfHier.{assignHierJoin,probesHierJoin}` upstream feed the same
    * kernel) — the past-10⁵-leaves configuration: at 10⁹ vectors the
    * √-rules give ~1.6M leaves, too many to ride the plan as a literal.
    * Bit-identical to `hierTopK` by the join forms' equivalence
    * (IvfHierJoinSpec); gate d47 replays d40's oracle through it.
    */
  def hierTopKJoin(assignedCorpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, h: IvfHier.HierModel, k: Int,
      wprobe: Int, nprobe: Int): DataFrame = {
    val qc = withQuantized(assignedCorpus, "vec", "qvec")
      .select(col("id"), col("cid"), col("qvec").as("vec"))
    val prb = IvfHier.probesHierJoin(queries, idCol, vecCol, h, wprobe,
      nprobe)
    Ivf.scoreProbedCells(qc,
      quantizedProbeSide(prb, queries, idCol, vecCol, nprobe), k)
  }

  /** Probe side for the quantized paths: `prb` is `Ivf.probes` output
    * (cell pruning on the raw float vectors — same stage as Ivf.search,
    * passed in so callers that also need the probed-cid set build it
    * ONCE); the QUANTIZED query vector joins in by qid. Conditionally
    * broadcast (Ivf's contract) on the FINAL frame so the (huge) corpus
    * side never shuffles.
    */
  private def quantizedProbeSide(prb: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, nprobe: Int): DataFrame = {
    val qq = scalarQuantize(queries, idCol, vecCol)
      .select(col("id").as("qid"), col("qvec"))
    val joined = prb.select("qid", "cid").join(qq, Seq("qid"))
    if (Ivf.probeSideSmall(queries, idCol, nprobe))
      broadcast(joined)
    else joined
  }

  /** Persist the quantized assigned corpus for the at-scale layout:
    * PARTITIONED BY cell id, vectors stored as `array<tinyint>` — the
    * actual 4× bytes-on-disk win the int8 scheme exists for. `amax` IS
    * persisted (one double per vector): cosine ranking never needs it,
    * but it is the only way a consumer can dequantize magnitudes
    * (x ≈ q·amax/127).
    *
    * @param attrCols attribute columns (tenant, language, license …)
    *                 persisted next to the codes — the filtered-search
    *                 columns `searchIvfQuantized{,Hier}`'s `filter`
    *                 pushes into the probed cells' parquet scan
    */
  def writeIvfQuantized(assignedCorpus: DataFrame, path: String,
      attrCols: Seq[String] = Nil): Unit =
    Ivf.writePartitioned(
      quantizedStorageRows(assignedCorpus, attrCols), path)

  /** Append an assigned batch into an existing `writeIvfQuantized` store
    * (`Ivf.appendPartitioned` — the incremental-ingestion discipline:
    * the batch assigns against the FROZEN centroid model, quantizes
    * per-vector exactly as the initial write did, and lands as new
    * files inside its cells' directories; `searchIvfQuantized{,Hier}`
    * read the union unchanged).
    */
  def appendIvfQuantized(assignedBatch: DataFrame, path: String,
      attrCols: Seq[String] = Nil): Unit =
    Ivf.appendPartitioned(
      quantizedStorageRows(assignedBatch, attrCols), path)

  /** The storage projection shared by write and append — per-vector
    * quantization CANNOT depend on which batch a row arrived in (amax
    * is per-row), which is what makes batched ingestion byte-identical
    * to a one-shot write.
    */
  private def quantizedStorageRows(assignedCorpus: DataFrame,
      attrCols: Seq[String]): DataFrame =
    assignedCorpus
      .withColumn("__qz", quantized(col("vec").cast("array<double>")))
      .select(col("id") +: col("cid") +: col("__qz.amax").as("amax") +:
        col("__qz.qvec").cast("array<tinyint>").as("qvec") +:
        attrCols.map(col): _*)

  /** Search a `writeIvfQuantized` corpus: probed cell ids (≤ nlist, tiny)
    * push down as a partition filter — only the probed cells' int8 files
    * are read — and the tinyint vectors cast back losslessly to the exact
    * integral doubles the rerank kernel expects. End to end this is the
    * 100 TB read path: nprobe/nlist of the files at 1/4 the bytes, then
    * exact integer arithmetic.
    *
    * @param filter optional attribute predicate over columns the store
    *               persisted (`writeIvfQuantized`'s `attrCols`) — the
    *               tenant/language/license-constrained serving query.
    *               Applied INSIDE the probed-cells scan, beneath the
    *               partition pruning: Catalyst pushes it into the
    *               parquet reader (`PushedFilters`), so non-matching
    *               rows never deserialize, let alone score. Post-filter
    *               semantics, the d29 contract: the index (centroids,
    *               assignment, quantization) is the full corpus's —
    *               shared across tenants — and the predicate only
    *               restricts which stored rows may be ranked.
    */
  def searchIvfQuantized(path: String, queries: DataFrame, idCol: String,
      vecCol: String, model: Ivf.Model, k: Int, nprobe: Int,
      filter: Option[Column] = None): DataFrame = {
    val spark = queries.sparkSession
    // not cache()d — same bounded-recompute rationale as
    // Ivf.searchPartitioned (no code path here could ever unpersist)
    val prb = Ivf.probes(queries, idCol, vecCol, model, nprobe)
    val probedCids = prb.select("cid").distinct().collect()
      .map(_.getInt(0)).toSeq
    val pruned = spark.read.parquet(path)
      .where(col("cid").isin(probedCids: _*))
    val qc = filter.fold(pruned)(pruned.where)
      .select(col("id"), col("cid"),
        col("qvec").cast("array<double>").as("vec"))
    Ivf.scoreProbedCells(qc,
      quantizedProbeSide(prb, queries, idCol, vecCol, nprobe), k)
  }

  /** Search a `writeIvfQuantized` corpus with the HIERARCHICAL coarse
    * quantizer doing the cell pruning — `hierTopK` routed through
    * storage, the stored counterpart of the measured 100 TB
    * configuration (d40): leaf cids are flat cids, so the
    * cid-partitioned tinyint layout applies verbatim; only the probe
    * stage changes to the compiled two-stage rank (`IvfHier.probesHier`
    * — nsuper + w·nlist/nsuper centroid dots per query instead of
    * nlist). Probed cell ids (model-bounded) push down as a partition
    * filter exactly as in `searchIvfQuantized`, and the optional
    * attribute `filter` lands beneath the pruned scan the same way.
    */
  def searchIvfQuantizedHier(path: String, queries: DataFrame,
      idCol: String, vecCol: String, h: IvfHier.HierModel, k: Int,
      wprobe: Int, nprobe: Int,
      filter: Option[Column] = None): DataFrame = {
    val spark = queries.sparkSession
    // not cache()d — the searchIvfQuantized bounded-recompute rationale
    val prb = IvfHier.probesHier(queries, idCol, vecCol, h, wprobe, nprobe)
    val probedCids = prb.select("cid").distinct().collect()
      .map(_.getInt(0)).toSeq
    val pruned = spark.read.parquet(path)
      .where(col("cid").isin(probedCids: _*))
    val qc = filter.fold(pruned)(pruned.where)
      .select(col("id"), col("cid"),
        col("qvec").cast("array<double>").as("vec"))
    Ivf.scoreProbedCells(qc,
      quantizedProbeSide(prb, queries, idCol, vecCol, nprobe), k)
  }
}
