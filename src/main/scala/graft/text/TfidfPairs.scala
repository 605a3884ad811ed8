package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Sparse TF-IDF cosine similarity join — all-pairs document similarity
  * through the TERM-partitioned inverted index, the lexical complement
  * to the embedding-space near-dup detectors (X9/X14): no model, no
  * vectors, and exact sparse arithmetic. Template pages, mirrored
  * articles, and translated-then-edited copies that MinHash (set
  * overlap) under-scores show up here because TF weighting counts
  * repeated vocabulary, not just shared shingles.
  *
  * Representation: w(d,t) = tf(d,t) · idf_milli(t), with idf quantized
  * to integer MILLI-nats — floor(ln(N/df)·10³ + 0.5). Milli (not the
  * house micro) is deliberate: norms and dots are sums of w², and the
  * q78 lesson applies — integer aggregates past 2⁵³ cast to double
  * differently across engines, so the quantization scale is chosen to
  * keep Σw² exactly representable (bounds: tf·idf_milli ≤ ~10⁶ allows
  * ~10⁴ terms/doc before Σw² nears 2⁵³). Dots and squared norms are
  * exact longs; cosine is one division over their correctly-rounded
  * roots.
  *
  * Scale shape: one tokenize+count pass (shuffle on (doc, term)), one
  * vocabulary-sized df aggregation, and the pair generation is the
  * classic term-at-a-time self-join of the inverted index — fanout per
  * term is bounded by `maxDf` (terms in more than maxDf documents are
  * dropped from the REPRESENTATION, weights and norms both, exactly the
  * stop-term cap every production similarity join applies; a df-10³
  * term would otherwise fan out 10⁶ pairs). Documents never shuffle —
  * only (term, id, w) triples.
  */
object TfidfPairs {

  /** Document pairs with TF-IDF cosine ≥ `threshold`.
    * Output: (id_a, id_b, dot — exact integer milli-nat² dot product,
    * cos) with id_a < id_b, ordered output left to the caller.
    */
  def cosinePairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxDf: Long): DataFrame = {
    require(maxDf >= 1L, "maxDf must be >= 1")
    val occ = df
      .select(col(idCol).as("id"), tokens(lower(col(textCol))).as("__toks"))
      .select(col("id"), explode(col("__toks")).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val nDocs = occ.select("id").distinct()
      .agg(count(lit(1)).as("nd"))
    val dft = occ.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val weights = occ.join(dft, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("id"), col("term"),
        (col("tf") * floor(log(col("nd").cast("double") /
          col("df").cast("double")) * lit(1000.0) + lit(0.5)).cast("long"))
          .as("w"))
    val norms = weights.groupBy("id")
      .agg(sum(col("w") * col("w")).as("n2"))
      .select(col("id"), sqrt(col("n2").cast("double")).as("nrm"))
    val dots = weights.alias("a")
      .join(weights.alias("b"),
        col("a.term") === col("b.term") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"))
    dots
      .join(norms.select(col("id").as("id_a"), col("nrm").as("na")), "id_a")
      .join(norms.select(col("id").as("id_b"), col("nrm").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"), col("dot"),
        (col("dot").cast("double") / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
