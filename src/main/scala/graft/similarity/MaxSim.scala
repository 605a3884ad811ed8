package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Late-interaction (multi-vector) similarity — the ColBERT scoring
  * family (Khattab & Zaharia, SIGIR 2020): query and document are BAGS
  * of token vectors, and the pair score is MaxSim =
  * Σ_i max_j (q_i · d_j) over L2-normalized token vectors — each query
  * token independently finds its best-matching document token, so
  * fine-grained term interactions survive pooling, which single-vector
  * cosine (X7) structurally cannot represent. The missing granularity
  * level in the similarity family: X7 scores pooled vectors, X156
  * compresses them; this scores token MULTISETS.
  *
  * Representation: a token-matrix column `array<array<double>>` —
  * [[tokenize]] builds one by slicing a packed dim-vector into m
  * contiguous ds = dim/m sub-vectors, each L2-normalized at tokenize
  * time (zero-safe), so the pair kernel is pure dots. Real multi-vector
  * embeddings (one vector per text token) land in the same column type
  * and every downstream op applies unchanged.
  *
  * Determinism (the oracle contract): per-token normalization divides
  * by one sqrt of a left-fold dot (the d05 fold discipline); max over
  * exact doubles is order-free; the final Σ is an explicit left fold in
  * token order. Every stage replays bitwise in DuckDB (gates d55/d56).
  *
  * Scale: [[bruteTopK]] is the baseline (query side broadcasts, corpus
  * never shuffles — the `Ann.bruteForceTopK` shape at m·m dots per
  * pair); [[ivfTopK]] is the scale path — cells pruned on the PACKED
  * vector through the audited `Ivf` probe stage, MaxSim only inside
  * probed cells (the d11 composition with a different rerank kernel).
  * The HOF score kernel is interpreted (CodegenFallback) at m·m dots
  * per pair; at gate shapes that is ≤ 16 dots of 16 floats — a compiled
  * `MaxSimScore` expression is the X159 upgrade path if a probe ever
  * shows it hot.
  */
object MaxSim {

  /** Token-matrix column: m contiguous ds-wide slices of a packed
    * dim-vector, each L2-normalized (all-zero slices stay zero rather
    * than dividing by zero). The norm sub-expression is re-evaluated
    * per element inside the HOF (no CSE in lambdas — the shingleSets
    * caveat); identical operands give identical IEEE results, so this
    * costs arithmetic, never determinism.
    */
  private def tokenMatrix(vec: Column, dim: Int, m: Int): Column = {
    val ds = dim / m
    val raw = transform(sequence(lit(0), lit(m - 1)),
      t => slice(vec, t * lit(ds) + lit(1), lit(ds)))
    transform(raw, tk => {
      val nrm = Ann.l2norm(tk)
      transform(tk, x => when(nrm === lit(0.0), lit(0.0))
        .otherwise(x / nrm))
    })
  }

  /** (id, toks) frame: the packed `vecCol` sliced and normalized into
    * an `array<array<double>>` token matrix. Map-only.
    */
  def tokenize(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int): DataFrame = {
    require(m >= 1 && dim % m == 0,
      s"dim $dim must split into m $m equal token slices")
    df.select(col(idCol).as("id"),
      tokenMatrix(col(vecCol).cast("array<double>"), dim, m).as("toks"))
  }

  /** MaxSim of two normalized token matrices: Σ over query tokens of
    * the max dot against any document token — an explicit left fold in
    * token order (engine-replayable), max is order-free. ONE compiled
    * call per candidate pair (`expressions.MaxSimScore` — the r18 32×
    * probe measured the HOF predecessor's interpreted-lambda constant
    * at 6.2× wall on the brute arm; the compiled kernel is two
    * primitive loops inside whole-stage codegen, values bit-identical
    * incl. the HOF null-poisoning contract, pinned in MaxSimSpec).
    */
  def score(qToks: Column, dToks: Column): Column =
    graft.core.Graft.column(graft.functions.expressions.MaxSimScore(
      graft.core.Graft.expression(qToks),
      graft.core.Graft.expression(dToks)))

  /** The exact pre-compilation HOF formulation — kept as the reference
    * MaxSimSpec pins [[score]] against bitwise (the X159 discipline:
    * every compiled kernel carries its interpreted twin in-tree).
    */
  private[graft] def scoreHof(qToks: Column, dToks: Column): Column =
    aggregate(
      transform(qToks, qt => array_max(transform(dToks, dt =>
        Ann.dot(qt, dt)))),
      lit(0.0), (acc, x) => acc + x)

  /** Exact top-k MaxSim neighbors per query. Output (qid, rank 1..k,
    * nid, maxsim) — the `Ann.rankTopK` semantics (desc score, nid
    * tie-break) on the MaxSim kernel. Query side broadcasts (the
    * bruteForceTopK shape); the corpus never shuffles.
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, m: Int, k: Int): DataFrame = {
    val c = tokenize(corpus, idCol, vecCol, dim, m)
      .select(col("id").as("nid"), col("toks").as("ntoks"))
    val q = tokenize(queries, idCol, vecCol, dim, m)
      .select(col("id").as("qid"), col("toks").as("qtoks"))
    val scored = q.join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        score(col("qtoks"), col("ntoks")).as("maxsim"))
    rankTopK(scored, k)
  }

  /** Cell-pruned MaxSim — the 100 TB form: the PACKED vector drives the
    * audited IVF probe stage (cells from full-vector geometry, the
    * shared-index discipline), and the token-level kernel only scores
    * candidates inside each query's `nprobe` probed cells. Composes
    * with `Ivf.writePartitioned` storage exactly like every other
    * rerank kernel (partition pruning opens nprobe/nlist of the files).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, model: Ivf.Model, dim: Int, m: Int, k: Int,
      nprobe: Int): DataFrame = {
    require(m >= 1 && dim % m == 0,
      s"dim $dim must split into m $m equal token slices")
    val cand = Ivf.assign(corpus, idCol, vecCol, model)
      .select(col("id").as("nid"), col("cid"),
        tokenMatrix(col("vec").cast("array<double>"), dim, m)
          .as("ntoks"))
    val prb = Ivf.probes(queries, idCol, vecCol, model, nprobe)
      .select(col("qid"), col("cid"),
        tokenMatrix(col("qvec").cast("array<double>"), dim, m)
          .as("qtoks"))
    val probeSide =
      if (Ivf.probeSideSmall(queries, idCol, nprobe)) broadcast(prb)
      else prb
    val scored = cand.join(probeSide, Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        score(col("qtoks"), col("ntoks")).as("maxsim"))
    rankTopK(scored, k)
  }

  /** Persist an IVF-assigned corpus in its TOKENIZED form for the
    * at-scale late-interaction layout: (id, toks) PARTITIONED BY cell
    * id — the `Ivf.writePartitioned` discipline with the token matrix
    * in place of the packed vector (normalization is part of the
    * frozen representation, so it happens once at write time; probes
    * only ever need the normalized tokens). The packed vector is NOT
    * stored — MaxSim never reads it, and the cell assignment it drove
    * is frozen in the directory layout.
    *
    * @param attrCols attribute columns persisted next to the tokens
    *                 (the X167 filtered-serving contract)
    */
  def writeIvf(assignedCorpus: DataFrame, path: String, dim: Int,
      m: Int, attrCols: Seq[String] = Nil): Unit = {
    require(m >= 1 && dim % m == 0,
      s"dim $dim must split into m $m equal token slices")
    Ivf.writePartitioned(
      assignedCorpus.select(col("id") +: col("cid") +:
        tokenMatrix(col("vec").cast("array<double>"), dim, m)
          .as("toks") +: attrCols.map(col): _*),
      path)
  }

  /** Search a [[writeIvf]] corpus — [[ivfTopK]] through storage: probed
    * cell ids (model-bounded) push down as a partition filter so only
    * the probed cells' token files are read; the stored normalized
    * doubles are exact, so ranks equal the in-memory path's. The
    * optional attribute `filter` lands beneath the pruned scan (the
    * d51 contract on the late-interaction arm).
    */
  def searchIvfStored(path: String, queries: DataFrame, idCol: String,
      vecCol: String, model: Ivf.Model, dim: Int, m: Int, k: Int,
      nprobe: Int, filter: Option[Column] = None): DataFrame = {
    require(m >= 1 && dim % m == 0,
      s"dim $dim must split into m $m equal token slices")
    val spark = queries.sparkSession
    // not cache()d — the searchIvfQuantized bounded-recompute rationale
    val prbRaw = Ivf.probes(queries, idCol, vecCol, model, nprobe)
    val probedCids = prbRaw.select("cid").distinct().collect()
      .map(_.getInt(0)).toSeq
    val prb = prbRaw.select(col("qid"), col("cid"),
      tokenMatrix(col("qvec").cast("array<double>"), dim, m).as("qtoks"))
    val probeSide =
      if (Ivf.probeSideSmall(queries, idCol, nprobe)) broadcast(prb)
      else prb
    val pruned = spark.read.parquet(path)
      .where(col("cid").isin(probedCids: _*))
    val cand = filter.fold(pruned)(pruned.where)
      .select(col("id").as("nid"), col("cid"), col("toks").as("ntoks"))
    val scored = cand.join(probeSide, Seq("cid"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        score(col("qtoks"), col("ntoks")).as("maxsim"))
    rankTopK(scored, k)
  }

  /** The `Ann.rankTopK` semantics on the maxsim column (kept separate
    * so the output schema names the score truthfully — this is a sum
    * of per-token cosines, not a cosine).
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("maxsim"), asc("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "nid", "maxsim")
  }
}
