package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Multinomial Naive Bayes over hashed token features — the count-based
  * quality/language classifier of large-corpus pipelines (the
  * fastText-supervised niche: CCNet and its descendants filter crawl
  * text with a linear model over token-level features; NB is the member
  * of that family whose TRAINING is pure aggregation, which makes it
  * the Spark-native choice: one grouped count over the corpus IS the
  * model — no SGD, no iteration, no driver-side state).
  *
  * Features are hashed buckets (the hashing trick): bucket =
  * polyhash(token) mod B, so the model is bounded at |labels|·B rows
  * regardless of vocabulary, and the whole pipeline is engine-portable
  * integer arithmetic. Log-weights are quantized to integer MICRO-NATS
  * exactly like [[UnigramLm]] (lw = floor(ln(p)·1e6 + 0.5), a long), so
  * document scores are exact order-free long sums and the full
  * train→score→argmax pipeline replays bitwise in SQL (gate t26).
  *
  * Laplace smoothing with α = 1 over buckets: a (label, bucket) pair
  * never seen in training scores ln(1/(total_label + B)) — materialized
  * once per label as `lw0`, the COALESCE fallback of the scoring join.
  *
  * Scale: training is two grouped counts (both map-side combined; the
  * shuffle carries ≤ |labels|·B partial rows). Scoring aggregates each
  * document's term frequencies FIRST (one exchange on (id, bucket),
  * combiner-reduced), then expands by the broadcast label list and
  * left-joins the broadcast model — documents and their text never
  * shuffle with the model. At web-corpus B·|labels| beyond broadcast
  * range, drop the hints and let AQE shuffle the (label, bucket) join —
  * the shape is unchanged.
  */
object NbClassifier {

  /** Trained model: bounded token weights + per-label metadata. */
  final case class Model(
      tokenWeights: DataFrame, // (label, bucket, lw)
      labelMeta: DataFrame) // (label, lpr — log prior, lw0 — unseen-bucket weight)

  private def micronat(x: org.apache.spark.sql.Column) =
    floor(x * lit(1000000.0) + lit(0.5)).cast("long")

  /** Train on (labelCol, textCol): counts per (label, hashed bucket),
    * Laplace-α=1 log-likelihoods and log-priors in micro-nats.
    */
  def train(df: DataFrame, labelCol: String, textCol: String,
      numBuckets: Int): Model = {
    require(numBuckets >= 2, s"numBuckets must be >= 2: $numBuckets")
    val occ = df
      .select(col(labelCol).as("label"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .select(col("label"), (polyHash(col("term")) % numBuckets).as("bucket"))
    val counts = occ.groupBy("label", "bucket").agg(count(lit(1)).as("cnt"))
    val totals = counts.groupBy("label").agg(sum("cnt").as("tot"))
    val nDocs = df.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("nd"))
    val nTotal = nDocs.agg(sum("nd").as("n"))
    val tokenWeights = counts.join(broadcast(totals), "label")
      .select(col("label"), col("bucket"),
        micronat(log((col("cnt") + 1).cast("double")
          / (col("tot") + numBuckets).cast("double"))).as("lw"))
    val labelMeta = nDocs.crossJoin(broadcast(nTotal))
      .join(broadcast(totals), "label")
      .select(col("label"),
        micronat(log(col("nd").cast("double") / col("n").cast("double")))
          .as("lpr"),
        micronat(log(lit(1.0)
          / (col("tot") + numBuckets).cast("double"))).as("lw0"))
    Model(tokenWeights, labelMeta)
  }

  /** Score each document against every label and keep the argmax
    * (ties break on label order). Documents with no tokens are omitted
    * (no features to score — same policy as [[UnigramLm.scoreDocs]]).
    *
    * Output: (idCol, pred — winning label, score_lw — its total
    * log-probability in micro-nats).
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      model: Model, numBuckets: Int): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"),
        explode(tokens(lower(col(textCol)))).as("term"))
      .select(col("id"), (polyHash(col("term")) % numBuckets).as("bucket"))
      .groupBy("id", "bucket").agg(count(lit(1)).as("tf"))
    val scored = tf
      .crossJoin(broadcast(model.labelMeta))
      .join(broadcast(model.tokenWeights), Seq("label", "bucket"), "left")
      .groupBy(col("id"), col("label"), col("lpr"))
      .agg(sum(col("tf") * coalesce(col("lw"), col("lw0"))).as("sum_lw"))
      .select(col("id"), col("label"),
        (col("lpr") + col("sum_lw")).as("score_lw"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("id")
      .orderBy(col("score_lw").desc, col("label"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("id").as(idCol), col("label").as("pred"), col("score_lw"))
  }

  /** Train on the labeled corpus and score it back (the gate shape;
    * real use trains once and scores incoming batches).
    */
  def trainScore(df: DataFrame, idCol: String, labelCol: String,
      textCol: String, numBuckets: Int): DataFrame = {
    val m = train(df, labelCol, textCol, numBuckets)
    score(df, idCol, textCol, m, numBuckets)
  }

  /** A trained model collected into plan literals: per-label bucket→lw
    * maps plus (label, lpr, lw0) in ascending label order.
    */
  final case class Compiled(labels: Seq[(String, Long, Long)],
      weights: Map[String, Map[Long, Long]], numBuckets: Int)

  /** Collect a trained model into a [[Compiled]] artifact — the serving
    * form: the model becomes broadcast plan literals, so scoring is a
    * pure per-row expression with NO join and NO shuffle. This is the
    * shape a streaming quality filter needs (no stateful aggregation —
    * works in append mode on any stream) and the right batch shape when
    * the scored side dwarfs the model. Bounded by construction: the
    * collected model is ≤ labels × numBuckets entries — size B for the
    * driver's heap, not for correctness.
    */
  def compile(m: Model, numBuckets: Int): Compiled = {
    val w = m.tokenWeights.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (l, rows) =>
        l -> rows.map(r => r._2 -> r._3).toMap
      }
    val meta = m.labelMeta.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    Compiled(meta.toSeq, w, numBuckets)
  }

  /** Map-only scoring against a [[Compiled]] model: identical output to
    * [[score]] (same micro-nat scores, same score-desc/label-asc
    * tie-break, token-less documents omitted), but zero exchanges —
    * usable verbatim on a streaming DataFrame.
    */
  def scoreCompiled(docs: DataFrame, idCol: String, textCol: String,
      c: Compiled): DataFrame = {
    // buckets materialized in their own projection — HOFs get no CSE,
    // so an inline tokens(text) would re-tokenize once per label
    // (the languageId trap, TextAnalysis.scala:32-36)
    val bucketed = docs
      .select(col(idCol).as("id"),
        transform(tokens(lower(col(textCol))),
          t => polyHash(t) % c.numBuckets).as("__buckets"))
      .filter(size(col("__buckets")) > 0)
    val cands = array(c.labels.map { case (l, lpr, lw0) =>
      val m = c.weights.getOrElse(l, Map.empty)
      val perTok =
        if (m.isEmpty) (b: org.apache.spark.sql.Column) => lit(lw0)
        else (b: org.apache.spark.sql.Column) =>
          coalesce(element_at(typedlit(m), b), lit(lw0))
      struct(
        (lit(lpr) + aggregate(col("__buckets"), lit(0L),
          (acc, b) => acc + perTok(b))).as("score_lw"),
        lit(l).as("pred"))
    }: _*)
    // strict > keeps the earlier (smaller) label on ties — the same
    // rule as score()'s score-desc/label-asc window
    val best = aggregate(cands,
      struct(lit(Long.MinValue).as("score_lw"), lit("").as("pred")),
      (acc, s) => when(s.getField("score_lw") > acc.getField("score_lw"),
        s).otherwise(acc))
    bucketed.select(col("id").as(idCol),
      best.getField("pred").as("pred"),
      best.getField("score_lw").as("score_lw"))
  }
}
