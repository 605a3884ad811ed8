package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid: "Product Quantization
  * for Nearest Neighbor Search", IEEE TPAMI 2011 — the FAISS `IVFPQ`
  * compression half) — the MEMORY lever a 100 TB vector corpus needs
  * beyond scalar int8 (`Quantize`): the vector is split into `m`
  * subvectors of `ds = dim/m` components, each quantized to one of
  * `ksub` per-subspace centroids, so a 64-dim float32 vector (256 B)
  * stores as `m` small codes (m = 4: 4 B — 64×). Search is ADC
  * (asymmetric distance computation): the query stays float and
  * precomputes, per subspace, its dot with every centroid — an
  * m × ksub table built ONCE per query, map-side; each candidate then
  * costs `m` table lookups instead of `dim` multiplies (16× less for
  * m = 4, dim = 64), and the approximate cosine ranks a shortlist that
  * an exact rerank (original vectors, `Ann`'s kernel) finishes.
  *
  * Composition, not a parallel stack: `encode` preserves pass-through
  * columns, so a corpus that went through `Ivf.assign` /
  * `IvfHier.assignHier` keeps its cell id — IVF prunes cells, PQ
  * shrinks what a probed cell costs to scan; together they are the
  * standard IVF-PQ layout.
  *
  * Determinism (the d33 gate contract): codebooks from
  * `sampleCodebooks` are the `Ivf.sampleCentroids` hash rule — the
  * `ksub` hash-smallest corpus rows, row r's j-th slice is centroid
  * (j, r); encode argmin ranks |c|² − 2·x_j·c with code tie-break;
  * every dot is the left fold `Ann.dot` builds; the Σ over the m
  * per-subspace terms is a left fold from 0.0, unrolled identically in
  * the oracle SQL. `trainCodebooks` (per-subspace seeded k-means) is
  * the production trainer, spec-covered like `Ivf.train`.
  */
object Pq {

  /** Codebook literal row: |c|², code id, centroid subvector. One
    * nested literal node holds all m subspaces (outer index = subspace
    * j), so encode and query-table construction are pure map passes.
    */
  case class PqCent(sqnorm: Double, r: Int, cvec: Seq[Double])

  case class Codebooks(m: Int, ds: Int, ksub: Int,
      books: Seq[Seq[(Int, Array[Double])]]) {
    require(books.length == m, s"need $m books, got ${books.length}")
  }

  /** Left-fold dot matching `Ann.dot` / DuckDB list_dot_product. */
  private def dotD(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Hash-ordered sampled codebooks (the d33 determinism path): the
    * `ksub` rows with the smallest `(id · 2654435761) % 1000003` key,
    * row r's j-th subvector becoming centroid (j, r) — the
    * `Ivf.sampleCentroids` rule applied per subspace, replayable in SQL.
    */
  def sampleCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int): Codebooks = {
    val seed = Ivf.sampleCentroids(corpus, idCol, vecCol, ksub)
    val dim = seed.centroids.head._2.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val ds = dim / m
    Codebooks(m, ds, ksub, (0 until m).map { j =>
      seed.centroids.sortBy(_._1).map { case (r, v) =>
        r -> v.slice(j * ds, (j + 1) * ds)
      }
    })
  }

  /** Production codebooks: an independent seeded k-means per subspace
    * over the corpus's j-th slices (the PQ paper's trainer).
    */
  def trainCodebooks(corpus: DataFrame, vecCol: String, m: Int, ksub: Int,
      seed: Long = 42L): Codebooks = {
    val v = corpus.select(col(vecCol).cast("array<double>").as("v"))
    val dim = v.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val ds = dim / m
    Codebooks(m, ds, ksub, (0 until m).map { j =>
      val feat = v.select(array_to_vector(
        slice(col("v"), j * ds + 1, ds)).as("features"))
      val km = new KMeans().setK(ksub).setSeed(seed + j)
        .setFeaturesCol("features")
      km.fit(feat).clusterCenters.zipWithIndex
        .map { case (c, r) => r -> c.toArray }.toSeq
    })
  }

  /** The codebooks as the compiled kernels' table form — one cid-sorted
    * `CentroidTable` per subspace (cid = code r, |c|² left-folded on the
    * driver: the bitwise-replay invariants, same as `bookLit` carried).
    */
  private def bookTables(cb: Codebooks)
      : Array[graft.functions.expressions.CentroidTable] =
    cb.books.map(b =>
      graft.functions.expressions.CentroidTable(
        b.map { case (r, c) => r -> c })).toArray

  /** Encode each row to its m-code word plus `csqn` = Σ_j |c_{j,code_j}|²
    * (the reconstruction's squared norm — carried at encode time, exact,
    * so search never re-looks-up norms) — ONE compiled `PqEncode` call
    * per row (the r15 `NearestCells` treatment: the HOF
    * transform/array_min form was CodegenFallback, and at production
    * shapes — m = 16, ksub = 256 — encode is 4096 interpreted subvector
    * dots per row; the compiled kernel is primitive loops inside
    * whole-stage codegen, values bit-identical). Entirely map-side; all
    * other columns pass through (IVF cell ids survive → IVF-PQ). A
    * storage writer would cast `code` to array<tinyint> losslessly for
    * ksub ≤ 256.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      cb: Codebooks): DataFrame = {
    val enc = graft.core.Graft.column(
      graft.functions.expressions.PqEncode(
        graft.core.Graft.expression(col(vecCol).cast("array<double>")),
        bookTables(cb)))
    df.withColumn("__pq_enc", enc)
      .withColumn("code", col("__pq_enc").getField("code"))
      .withColumn("csqn", col("__pq_enc").getField("csqn"))
      .drop("__pq_enc")
  }

  /** ADC search: approximate-cosine shortlist over the encoded corpus,
    * exact rerank of the shortlist against the original vectors.
    *
    * Query side precomputes `qtab[j][r] = q_j · c_{j,r}` (m × ksub
    * doubles, map-side, one pass over the codebook literal) and
    * |q|; each (query, candidate) pair then scores
    * Σ_j qtab[j][code_j] / (|q|·√csqn) — m lookups + one divide, no
    * vector math. The shortlist (`shortlist` ≥ k, approx-score rank
    * with nid tie-break) joins back to `corpus` for the exact cosine
    * (`Ann`'s operand shapes), and only exact ranks leave the operator.
    *
    * `encoded` must carry (id, code, csqn) from `encode` over the SAME
    * codebooks. At scale the pair source is cell-pruned (IVF-PQ), not
    * this all-pairs baseline join — same split as `Ann.bruteForceTopK`
    * vs the bucketed paths.
    */
  def searchAdc(encoded: DataFrame, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, cb: Codebooks, k: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val q = withQueryTables(
      queries.select(col(idCol).as("qid"),
        col(vecCol).cast("array<double>").as("qvec")), cb)
    val cand = encoded.select(col(idCol).as("nid"), col("code"),
      col("csqn"))
    val pairs = q.crossJoin(cand).filter(col("qid") =!= col("nid"))
    rerank(adcShortlist(pairs, shortlist), corpus, queries, idCol,
      vecCol, k)
  }

  /** Cell-pruned ADC — the IVF-PQ composition: `encodedAssigned` is the
    * `Ivf.assign` (or `IvfHier.assignHier`) output run through `encode`
    * (shape: id, cid, code, csqn — the vector itself is no longer read
    * here, which IS the point: a probed cell scans m-byte codes, not
    * dim-float vectors). Candidates come only from each query's `nprobe`
    * probed cells; within them the ADC shortlist and exact rerank are
    * `searchAdc`'s verbatim. At 100 TB this pairs with
    * `Ivf.writePartitioned` on the encoded frame: partition pruning
    * opens nprobe/nlist of the files AND each file is ~64× smaller.
    *
    * The query-dot table rides the probe frame (duplicated ×nprobe per
    * query — m·ksub doubles, map-side, cheaper than a join to dedupe it).
    */
  def searchIvfPq(encodedAssigned: DataFrame, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, ivf: Ivf.Model,
      cb: Codebooks, k: Int, nprobe: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val prb = withQueryTables(
      Ivf.probes(queries, idCol, vecCol, ivf, nprobe), cb)
    cellAdcSearch(prb, encodedAssigned, corpus, queries, idCol, vecCol,
      k, nprobe, shortlist)
  }

  /** Shared tail of the cell-pruned ADC searches: cell join from a
    * qtab-carrying probe frame, m-lookup shortlist within the probed
    * cells, exact rerank (the `BinaryQuant.cellHammingSearch` shape).
    */
  private def cellAdcSearch(prb: DataFrame, encodedAssigned: DataFrame,
      corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nprobe: Int, shortlist: Int): DataFrame = {
    val probeSide =
      if (Ivf.probeSideSmall(queries, idCol, nprobe)) broadcast(prb)
      else prb
    val cand = encodedAssigned.select(col("cid"), col("id").as("nid"),
      col("code"), col("csqn"))
    val pairs = cand.join(probeSide, Seq("cid"))
      .filter(col("qid") =!= col("nid"))
    rerank(adcShortlist(pairs, shortlist), corpus, queries, idCol,
      vecCol, k)
  }

  /** Persist an encoded assigned corpus for the at-scale IVF-PQ layout
    * (the X43/d42 discipline at the PQ code granularity): PARTITIONED
    * BY cell id, codes stored as `array<smallint>` — lossless for any
    * ksub ≤ 32767, and parquet's dictionary/bit-packing brings the
    * on-disk cost to ~m·log₂(ksub) bits per row — plus the one
    * reconstruction norm `csqn` the ADC denominator needs. The
    * codebooks are MODEL data (m·ksub·ds doubles, driver-sized) and
    * travel with the model, not the store.
    */
  def writeIvfPq(encodedAssigned: DataFrame, path: String,
      cb: Codebooks, attrCols: Seq[String] = Nil): Unit =
    Ivf.writePartitioned(pqStorageRows(encodedAssigned, cb, attrCols),
      path)

  /** Append an encoded batch into an existing [[writeIvfPq]] store
    * (`Ivf.appendPartitioned` — the d44 incremental-ingestion
    * discipline at the PQ code granularity: codes and `csqn` are
    * per-row functions of the FROZEN codebooks, so batching cannot
    * change any stored byte and readers see the union unchanged).
    */
  def appendIvfPq(encodedBatch: DataFrame, path: String,
      cb: Codebooks, attrCols: Seq[String] = Nil): Unit =
    Ivf.appendPartitioned(pqStorageRows(encodedBatch, cb, attrCols), path)

  /** The storage projection shared by write and append — the
    * batch-invariance contract (`Quantize.quantizedStorageRows`'s
    * rationale on the PQ arm).
    */
  private def pqStorageRows(encodedAssigned: DataFrame,
      cb: Codebooks, attrCols: Seq[String] = Nil): DataFrame = {
    require(cb.ksub <= 32767,
      s"smallint code storage requires ksub <= 32767: ${cb.ksub}")
    encodedAssigned.select(col("id") +: col("cid") +:
      col("code").cast("array<smallint>").as("code") +: col("csqn") +:
      attrCols.map(col): _*)
  }

  /** Search a [[writeIvfPq]] corpus — [[searchIvfPq]] through storage:
    * probed cell ids (model-bounded) push down as a partition filter,
    * stored codes cast back losslessly to the ints `AdcDot` indexes
    * with, and the shortlist + exact rerank are verbatim. The 100 TB
    * IVF-PQ read path: nprobe/nlist of the files at ~m bytes per row.
    *
    * @param filter optional attribute predicate over columns persisted
    *               via [[writeIvfPq]]'s `attrCols` — the d51 contract
    *               at the PQ granularity: pushed beneath the pruned
    *               scan (parquet PushedFilter), post-filter semantics
    *               (the index is the full corpus's)
    */
  def searchIvfPqStored(path: String, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, ivf: Ivf.Model,
      cb: Codebooks, k: Int, nprobe: Int, shortlist: Int,
      filter: Option[Column] = None): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val spark = queries.sparkSession
    // probe lineage evaluated twice (cid collect + the probe join);
    // deliberately NOT cache()d — the searchIvfQuantized rationale
    val prbRaw = Ivf.probes(queries, idCol, vecCol, ivf, nprobe)
    val probedCids = prbRaw.select("cid").distinct().collect()
      .map(_.getInt(0)).toSeq
    val prb = withQueryTables(prbRaw, cb)
    val pruned = spark.read.parquet(path)
      .where(col("cid").isin(probedCids: _*))
    val enc = filter.fold(pruned)(pruned.where)
      .select(col("id"), col("cid"),
        col("code").cast("array<int>").as("code"), col("csqn"))
    cellAdcSearch(prb, enc, corpus, queries, idCol, vecCol, k, nprobe,
      shortlist)
  }

  /** Append the ADC machinery to a (qid, qvec, ...) frame: `qtab[j][r] =
    * q_j · c_{j,r}` (m × ksub doubles, one compiled `PqQueryTable` call
    * per query row) and |q|.
    */
  private def withQueryTables(q: DataFrame, cb: Codebooks): DataFrame =
    q.withColumn("qtab", graft.core.Graft.column(
        graft.functions.expressions.PqQueryTable(
          graft.core.Graft.expression(col("qvec")), bookTables(cb))))
      .withColumn("__qnrm", Ann.l2norm(col("qvec")))

  /** The ADC m-lookup fold Σ_j qtab[j][code_j] — one compiled `AdcDot`
    * call per candidate PAIR (the hottest PQ site: it runs once per
    * (query, candidate), where the HOF zip_with+aggregate form paid
    * interpreted dispatch + an intermediate array per pair).
    */
  private def adcFold: Column = graft.core.Graft.column(
    graft.functions.expressions.AdcDot(
      graft.core.Graft.expression(col("qtab")),
      graft.core.Graft.expression(col("code"))))

  /** Approximate-cosine shortlist over candidate pairs carrying
    * (qid, nid, qtab, code, csqn, __qnrm): score = the m-lookup left
    * fold over the query table divided by |q|·√csqn, rank with nid
    * tie-break, keep `shortlist` per query.
    */
  private def adcShortlist(pairs: DataFrame, shortlist: Int): DataFrame = {
    val shortW = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("approx_sim").desc, col("nid"))
    pairs
      .withColumn("approx_sim",
        adcFold / (col("__qnrm") * sqrt(col("csqn"))))
      .withColumn("srn", row_number().over(shortW))
      .filter(col("srn") <= shortlist)
      .select("qid", "nid")
  }

  /** Exact-cosine rerank of a (qid, nid) shortlist against the original
    * vectors — `Ann`'s operand shapes, so only exact ranks leave any PQ
    * path.
    */
  private[similarity] def rerank(short: DataFrame, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val cvec = corpus.select(col(idCol).as("nid"),
      col(vecCol).cast("array<double>").as("nvec"))
    val qvec = queries.select(col(idCol).as("qid"),
      col(vecCol).cast("array<double>").as("qvec2"))
    val scored = short.join(qvec, Seq("qid")).join(cvec, Seq("nid"))
      .select(col("qid"), col("nid"),
        (Ann.dot(col("qvec2"), col("nvec")) /
          (Ann.l2norm(col("qvec2")) * Ann.l2norm(col("nvec"))))
          .as("cosine_sim"))
    Ann.rankTopK(scored, k)
  }

  /** Convenience end-to-end with sampled codebooks. */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int, ksub: Int,
      shortlist: Int): DataFrame = {
    val cb = sampleCodebooks(corpus, idCol, vecCol, m, ksub)
    val enc = encode(corpus, idCol, vecCol, cb)
    searchAdc(enc, corpus, queries, idCol, vecCol, cb, k, shortlist)
  }

  // ---- residual encoding (IVFADC proper) ----------------------------

  /** Centroid map literal cid → vector (keyed form — the once-per-row
    * HOF-argument lookup discipline IvfHier.leafMapLit documents).
    */
  private def centMapLit(ivf: Ivf.Model): Column =
    typedLit(ivf.centroids.map { case (cid, v) => cid -> v.toSeq }.toMap)

  /** The m-code word for a (residual) vector column — `encode`'s
    * compiled argmin without the sqnorm ride-along (the residual path
    * derives its norm from the explicit reconstruction instead).
    */
  private def codesFor(v: Column, cb: Codebooks): Column =
    graft.core.Graft.column(graft.functions.expressions.PqEncode(
      graft.core.Graft.expression(v), bookTables(cb))).getField("code")

  /** The nested codebook literal: outer element j+1 = subspace j's
    * (sqnorm, r, cvec) rows in code order — kept for the reconstruction
    * lookup only (m model-sized element_at's per row; the hot argmin /
    * table / fold kernels are the compiled expressions above).
    */
  private def bookLit(cb: Codebooks): Column =
    typedLit(cb.books.map(_.sortBy(_._1).map { case (r, c) =>
      PqCent(dotD(c, c), r, c.toSeq)
    }))

  /** The PQ reconstruction r̂: the m code centroids concatenated in
    * subspace order.
    */
  private def rhat(code: Column, cb: Codebooks): Column =
    flatten(transform(sequence(lit(0), lit(cb.m - 1)), j =>
      element_at(element_at(bookLit(cb), j + lit(1)),
        element_at(code, j + lit(1)) + lit(1)).getField("cvec")))

  /** Residual frame (id, cid, rv = x − centroid_cid) of an
    * `Ivf.assign`-shaped corpus — the thing IVFADC quantizes: residuals
    * are centered near 0 with far less variance than raw vectors, so
    * the same code budget buys much smaller quantization error (Jégou
    * et al. §IV; FAISS `IndexIVFPQ` default). Map-side (one map-literal
    * lookup + one exact IEEE subtraction per component).
    */
  def residuals(assigned: DataFrame, ivf: Ivf.Model): DataFrame =
    assigned.select(col("id"), col("cid"),
      zip_with(col("vec").cast("array<double>"),
        element_at(centMapLit(ivf), col("cid")), (x, c) => x - c).as("rv"))

  /** Residual codebooks by the deterministic hash-sample rule: the d07
    * id-hash picks the SAME rows as `sampleCodebooks` would, but their
    * j-th slices are sliced from the residuals — replayable in SQL
    * (gate d35). `trainCodebooks(residuals(...), "rv", ...)` is the
    * production form.
    */
  def sampleResidualCodebooks(assigned: DataFrame, ivf: Ivf.Model,
      m: Int, ksub: Int): Codebooks =
    sampleCodebooks(residuals(assigned, ivf), "id", "rv", m, ksub)

  /** Encode an `Ivf.assign`-shaped corpus against RESIDUAL codebooks:
    * code_j = argmin over book j for the residual's j-th slice, and
    * `csqn` = |x̂|² of the full reconstruction x̂ = centroid + r̂ (built
    * explicitly, exact IEEE adds — search divides by √csqn just like
    * the flat path, no approximation in the norm). Entirely map-side;
    * other columns pass through.
    */
  def encodeResidual(assigned: DataFrame, ivf: Ivf.Model,
      cb: Codebooks): DataFrame = {
    val recon = zip_with(element_at(centMapLit(ivf), col("cid")),
      rhat(col("code"), cb), (c, r) => c + r)
    assigned
      .withColumn("__pq_res",
        zip_with(col("vec").cast("array<double>"),
          element_at(centMapLit(ivf), col("cid")), (x, c) => x - c))
      .withColumn("code", codesFor(col("__pq_res"), cb))
      .withColumn("csqn", Ann.dot(recon, recon))
      .drop("__pq_res")
  }

  /** Cell-pruned ADC over residual codes — IVFADC proper. The approx
    * dot decomposes as q·x̂ = q·centroid_cid + Σ_j qtab[j][code_j]: the
    * q·centroid term is computed ONCE PER PROBE ROW (nprobe per query,
    * riding the probe frame like qtab — never per candidate), the Σ is
    * the same m-lookup fold as `searchAdc`, and the approx cosine
    * divides by |q|·√csqn with csqn the exact reconstruction norm from
    * `encodeResidual`. Shortlist → exact rerank, as everywhere.
    */
  def searchIvfPqResidual(encodedAssigned: DataFrame, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, ivf: Ivf.Model,
      cb: Codebooks, k: Int, nprobe: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val prb = withQueryTables(
      Ivf.probes(queries, idCol, vecCol, ivf, nprobe), cb)
      .withColumn("qcent",
        Ann.dot(col("qvec"), element_at(centMapLit(ivf), col("cid"))))
    residualAdcSearch(prb, encodedAssigned, corpus, queries, idCol,
      vecCol, k, nprobe, shortlist)
  }

  /** IVFADC over a HIERARCHICALLY assigned corpus — the measured ≥10×
    * configuration (PLANS.md r15: the compiled two-level rank beats flat
    * at every probed factor, 5.6× at 32×): `encodedAssigned` comes from
    * `IvfHier.assignHier` → [[encodeResidual]] against `h.leaves` (the
    * leaf model IS the flat model, so cell ids, centroids, and residual
    * codebooks are shared — with wassign = nsuper the two pipelines are
    * bit-identical end to end). Probing is the compiled two-stage rank
    * (top-`wprobe` supers → `nprobe` of their leaves, map-side — no
    * rank over all nlist leaves); everything after the probe frame —
    * the q·centroid decomposition, ADC fold, shortlist, exact rerank —
    * is `searchIvfPqResidual`'s verbatim.
    */
  def searchIvfPqResidualHier(encodedAssigned: DataFrame,
      corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, h: IvfHier.HierModel, cb: Codebooks, k: Int,
      wprobe: Int, nprobe: Int, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val prb = withQueryTables(
      IvfHier.probesHier(queries, idCol, vecCol, h, wprobe, nprobe), cb)
      .withColumn("qcent",
        Ann.dot(col("qvec"), element_at(centMapLit(h.leaves), col("cid"))))
    residualAdcSearch(prb, encodedAssigned, corpus, queries, idCol,
      vecCol, k, nprobe, shortlist)
  }

  /** [[searchIvfPqResidualHier]] through a [[writeIvfPq]] store — the
    * FAISS-IndexIVFPQ-proper configuration (hier coarse quantizer ×
    * residual codes) on disk: `encodeResidual` output has exactly the
    * (id, cid, code, csqn) shape the writer persists, so the layout is
    * d48's verbatim; only the probe stage (compiled two-stage rank) and
    * the q·centroid score decomposition differ, both verbatim from the
    * in-memory path. Completes the stored matrix's hier × PQ cell.
    */
  def searchIvfPqResidualHierStored(path: String, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String,
      h: IvfHier.HierModel, cb: Codebooks, k: Int, wprobe: Int,
      nprobe: Int, shortlist: Int,
      filter: Option[Column] = None): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val spark = queries.sparkSession
    val prbRaw = IvfHier.probesHier(queries, idCol, vecCol, h, wprobe,
      nprobe)
    val probedCids = prbRaw.select("cid").distinct().collect()
      .map(_.getInt(0)).toSeq
    val prb = withQueryTables(prbRaw, cb)
      .withColumn("qcent",
        Ann.dot(col("qvec"), element_at(centMapLit(h.leaves), col("cid"))))
    val pruned = spark.read.parquet(path)
      .where(col("cid").isin(probedCids: _*))
    val enc = filter.fold(pruned)(pruned.where)
      .select(col("id"), col("cid"),
        col("code").cast("array<int>").as("code"), col("csqn"))
    residualAdcSearch(prb, enc, corpus, queries, idCol, vecCol, k,
      nprobe, shortlist)
  }

  /** Shared tail of the residual (IVFADC) searches: cell join from a
    * probe frame carrying (qid, cid, qtab, __qnrm, qcent), approx score
    * (q·cent + ADC fold) / (|q|·√csqn), shortlist, exact rerank.
    */
  private def residualAdcSearch(prb: DataFrame, encodedAssigned: DataFrame,
      corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nprobe: Int, shortlist: Int): DataFrame = {
    val probeSide =
      if (Ivf.probeSideSmall(queries, idCol, nprobe)) broadcast(prb)
      else prb
    val cand = encodedAssigned.select(col("cid"), col("id").as("nid"),
      col("code"), col("csqn"))
    val pairs = cand.join(probeSide, Seq("cid"))
      .filter(col("qid") =!= col("nid"))
    val shortW = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("approx_sim").desc, col("nid"))
    val short = pairs
      .withColumn("approx_sim",
        (col("qcent") + adcFold) /
          (col("__qnrm") * sqrt(col("csqn"))))
      .withColumn("srn", row_number().over(shortW))
      .filter(col("srn") <= shortlist)
      .select("qid", "nid")
    rerank(short, corpus, queries, idCol, vecCol, k)
  }
}
