package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Interpolated bigram language-model scoring — the next quality-signal
  * rung above `UnigramLm` (CCNet, arXiv:1911.00359, uses a 5-gram KenLM;
  * an interpolated bigram is the honest engine-native analog): fluent
  * text has predictable token TRANSITIONS, so boilerplate with plausible
  * unigrams but scrambled order now stands out.
  *
  * Model: P(w|v) = λ·c(v,w)/c(v) + (1−λ)·(c(w)+1)/(N+V), the first token
  * of each document scored by the smoothed unigram term alone. Same
  * engine-portability discipline as UnigramLm: every probability is a
  * fixed-shape IEEE expression over EXACT integer counts (identical
  * rounding sequence in any engine), each event's log-probability is
  * quantized to an integer micro-nat, and the per-document total is an
  * order-free long sum; ln's ±1 ulp libm slack is absorbed by the
  * quantization.
  *
  * Plan shape: bigrams are built MAP-SIDE (zip_with over two shifted
  * slices of the token array — the shingle trick, no self-join, no
  * positional shuffle); one grouped count per model table. The unigram
  * model and corpus totals broadcast (vocabulary-sized); the BIGRAM
  * model join is deliberately left to AQE — bigram vocabularies grow
  * ~quadratically with unigram vocabulary and a forced broadcast is
  * exactly what dies first at 100 TB. Documents never shuffle: only
  * (id, event) pairs move, and the scoring aggregation is map-side
  * combinable.
  */
object BigramLm {

  /** Per-document mean NLL under the interpolated bigram model (trained
    * on the corpus itself). Documents with no tokens are omitted.
    *
    * Output: (idCol, n_events — scored events = token count, sum_lp —
    * total log-prob in micro-nats, nll — mean negative log-prob, nats).
    */
  def scoreDocs(df: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.75): DataFrame = {
    require(lambda > 0 && lambda < 1, "lambda must be in (0,1)")
    val toks = df
      .select(col(idCol).as("id"), tokens(lower(col(textCol))).as("t"))
      .filter(size(col("t")) > 0)
    val occ = toks.select(col("id"), explode(col("t")).as("term"))

    val uni = occ.groupBy("term").agg(count(lit(1)).as("cu"))
    val stats = uni.agg(sum("cu").as("n_total"), count(lit(1)).as("v_size"))

    // map-side bigrams — no self-join, and since r17 ONE compiled call
    // per row (`BigramPairs`; the 32× probe nominated the HOF
    // zip_with-of-shifted-slices form: two interpreted slices + a
    // lambda per pair + a boxed struct per element on the corpus path)
    val bg = toks
      .select(col("id"), explode(graft.core.Graft.column(
        graft.functions.expressions.BigramPairs(
          graft.core.Graft.expression(col("t"))))).as("p"))
      .select(col("id"), col("p.prev").as("prev"), col("p.term").as("term"))
    val bi = bg.groupBy("prev", "term").agg(count(lit(1)).as("cb"))

    // fixed-shape IEEE expression — mirrored verbatim in the oracle
    def addOne(cu: Column): Column =
      (cu + 1L).cast("double") /
        (col("n_total") + col("v_size")).cast("double")
    val biLp = bi
      .join(uni.select(col("term").as("prev"), col("cu").as("c1")), "prev")
      .join(uni.select(col("term"), col("cu").as("cut")), "term")
      .crossJoin(broadcast(stats))
      .select(col("prev"), col("term"),
        floor(log(lit(lambda) *
            (col("cb").cast("double") / col("c1").cast("double")) +
          lit(1.0 - lambda) * addOne(col("cut"))) * lit(1000000.0) +
          lit(0.5)).as("lp"))

    val firstLp = toks
      .select(col("id"), element_at(col("t"), 1).as("term"))
      .join(broadcast(uni), "term")
      .crossJoin(broadcast(stats))
      .select(col("id"),
        floor(log(addOne(col("cu"))) * lit(1000000.0) + lit(0.5)).as("lp"))

    val events = firstLp
      .union(bg.join(biLp, Seq("prev", "term")).select(col("id"), col("lp")))
    events.groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_events"), sum(col("lp")).as("sum_lp"))
      .select(col(idCol), col("n_events"), col("sum_lp"),
        ((-col("sum_lp")).cast("double") / lit(1000000.0)
          / col("n_events").cast("double")).as("nll"))
  }
}
