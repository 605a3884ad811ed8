package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** NDCG@k — the graded ranking-quality metric (Järvelin & Kekäläinen,
  * TOIS 2002) that closes this library's eval family: X59/X64 score
  * binary orderings (AUC/AP), X74 scores set overlap (recall@k); NDCG
  * scores POSITION-WEIGHTED graded relevance, which is what retrieval
  * and curation rankings (BM25, ANN, fused X86 RRF lists) are actually
  * judged by.
  *
  * Engine portability: the per-position discounts 1/log2(i+1) are
  * irrational, and libm's ln carries ±1 ulp slack across engines — so
  * they are precomputed ONCE on the driver as nano-unit integer
  * literals ([[discountNano]]) and handed identically to the plan and
  * to any replaying oracle (the MinHash-constant pattern). Every
  * per-query value is then an exact integer sum: gain (2^rel − 1, exact
  * long for rel ≤ 30) times a literal discount — order-free, and the
  * final NDCG is ONE double division.
  *
  * Scale: two windows per query group (predicted order, ideal order) —
  * WindowGroupLimit-bounded by the rank ≤ k filter — and one
  * map-side-combined sum; queries never interact, so the plan is
  * embarrassingly parallel across the query key with rows carrying
  * (query, 16 bytes).
  */
object Ndcg {

  /** Nano-unit discount table for positions 1..k:
    * round(10⁹ / log2(i+1)). Position 1 is exactly 10⁹.
    */
  def discountNano(k: Int): Seq[Long] =
    (1 to k).map(i => math.round(1e9 / (math.log(i + 1.0) / math.log(2.0))))

  /** Per-query NDCG@k of the ranking induced by `scoreCol` (higher =
    * better, ties broken by idCol ascending) against graded `relCol`
    * (integers 0..30; ideal ranking = rel desc, idCol asc).
    *
    * Output: (queryCol, dcg_nano, idcg_nano — exact integer sums,
    * ndcg — NULL when the query has no relevant item so IDCG = 0).
    */
  def ndcgAtK(df: DataFrame, queryCol: String, idCol: String,
      scoreCol: String, relCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val disc = typedLit(discountNano(k))
    val byQuery = Window.partitionBy(col(queryCol))
    val predicted = row_number()
      .over(byQuery.orderBy(col(scoreCol).desc, col(idCol).asc))
    val ideal = row_number()
      .over(byQuery.orderBy(col(relCol).desc, col(idCol).asc))
    // bit-shift, not pow(): the gain 2^rel − 1 stays in exact integers
    val gain = expr(s"shiftleft(1L, cast(`$relCol` as int)) - 1L")
    val ranked = df.select(col(queryCol), col(idCol), col(scoreCol),
        col(relCol).cast("long").as(relCol))
      .withColumn("__pr", predicted)
      .withColumn("__ir", ideal)
      .withColumn("__gain", gain)
    ranked
      .groupBy(col(queryCol))
      .agg(
        sum(when(col("__pr") <= k,
          col("__gain") * element_at(disc, col("__pr").cast("int")))
          .otherwise(lit(0L))).as("dcg_nano"),
        sum(when(col("__ir") <= k,
          col("__gain") * element_at(disc, col("__ir").cast("int")))
          .otherwise(lit(0L))).as("idcg_nano"))
      .withColumn("ndcg",
        when(col("idcg_nano") > 0L,
          col("dcg_nano").cast("double") / col("idcg_nano").cast("double")))
  }
}
