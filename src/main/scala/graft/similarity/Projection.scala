package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection: reduce `inDim`-dimensional
  * embeddings to `outDim` coordinates against a DETERMINISTIC ±1 sign
  * matrix (Achlioptas 2003: database-friendly random projections — ±1
  * entries preserve pairwise distances in expectation like Gaussian
  * ones, and multiply-free here means each coordinate is one
  * [[Ann.dot]] against a literal sign row, fully codegen'd).
  *
  * This is the third leg of the ANN compression story: IVF prunes WHICH
  * vectors a query scores (d07), int8 shrinks each COMPONENT (d10), JL
  * shrinks HOW MANY components there are — a 64→16 projection cuts scan
  * bytes and dot-product work 4× for the candidate pass, and the exact
  * rerank on the surviving few restores full-precision ordering.
  *
  * Everything is engine-portable integer/IEEE arithmetic: the sign for
  * (input dim i, output dim j) is a parity of a fixed hash, the
  * projected coordinate is a left-to-right fold (DotProduct ==
  * DuckDB's list_dot_product, the d05-proven contract), so the whole
  * candidate+rerank pipeline replays bitwise in SQL (gate d19).
  *
  * The unnormalized projection is used as-is: cosine similarity is
  * invariant to the uniform 1/√outDim scale, so the conventional JL
  * scaling factor would only add rounding steps.
  *
  * Scale: the sign matrix is outDim×inDim literals baked into the plan
  * (16×64 here — trivial). Past ~10^6 entries, switch the projection to
  * a broadcast-joined matrix table; the pipeline shape is unchanged.
  */
object Projection {

  /** Deterministic ±1 for (input dim i, output dim j) — engine-portable
    * (replays as a CASE over the same integer arithmetic in SQL).
    */
  def sign(i: Int, j: Int): Double =
    if ((i.toLong * 2654435761L + j.toLong * 40503L) % 1000003L % 2L == 0L)
      1.0 else -1.0

  private def signRow(j: Int, inDim: Int): Column =
    typedlit((0 until inDim).map(i => sign(i, j)))

  /** Adds `outCol`: array<double> of `outDim` projected coordinates,
    * each one codegen'd dot product of the vector with its sign row.
    * Map-only — no shuffle, no UDF.
    */
  def project(df: DataFrame, vecCol: String, inDim: Int, outDim: Int,
      outCol: String): DataFrame = {
    require(outDim >= 1 && outDim <= inDim,
      s"outDim must be in [1, inDim=$inDim]: $outDim")
    df.withColumn(outCol,
      array((0 until outDim).map(j =>
        Ann.dot(col(vecCol), signRow(j, inDim))): _*))
  }

  /** Approximate top-k cosine neighbors via project → candidate top-K'
    * (projected cosine, K' = oversample·k) → EXACT rerank of the
    * survivors on the original vectors. Output (qid, rank 1..k, nid,
    * cosine_sim) — the shared similarity contract ([[Ann.rankTopK]]).
    *
    * The candidate pass scores queries × corpus on outDim-dim vectors —
    * same join shape as brute force at 1/(inDim/outDim) the arithmetic
    * and scan bytes; the rerank touches only oversample·k rows per
    * query. Recall is a tuning outcome (oversample up = recall up);
    * ProjectionSpec pins it against brute force on the fixture.
    */
  def projectedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, inDim: Int, outDim: Int,
      oversample: Int = 4): DataFrame = {
    require(oversample >= 1, s"oversample must be >= 1: $oversample")
    val pc = project(corpus, vecCol, inDim, outDim, "__pvec")
      .select(col(idCol).as("nid"), col("__pvec").as("nvec"))
    val pq = project(queries, vecCol, inDim, outDim, "__pvec")
      .select(col(idCol).as("qid"), col("__pvec").as("qvec"))
    val candidates = Ann.rankTopK(
      pq.join(pc, col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          Ann.cosine(col("qvec"), col("nvec")).as("cosine_sim")),
      oversample * k)
      .select("qid", "nid")
    val qfull = queries.select(col(idCol).as("__qfid"),
      col(vecCol).as("__qfull"))
    val nfull = corpus.select(col(idCol).as("__nfid"),
      col(vecCol).as("__nfull"))
    val rescored = candidates
      .join(qfull, col("qid") === col("__qfid"))
      .join(nfull, col("nid") === col("__nfid"))
      .select(col("qid"), col("nid"),
        Ann.cosine(col("__qfull"), col("__nfull")).as("cosine_sim"))
    Ann.rankTopK(rescored, k)
  }
}
