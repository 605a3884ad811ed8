package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** χ² feature selection — the vocabulary-pruning step ahead of training
  * a classifier like [[NbClassifier]] (keep the k terms most dependent
  * on the label; drop the noise floor that bloats the model and the
  * hash-collision rate).
  *
  * Document-level presence statistics (the standard text formulation):
  * for term t and label l, A = docs of l containing t, B = other docs
  * containing t, C = docs of l without t, D = the rest, and
  * χ² = N·(AD−BC)² / ((A+B)(C+D)(A+C)(B+D)).
  *
  * ONE corpus aggregation: per-(label, term) distinct-doc counts
  * (map-side combined — array_distinct inside the document collapses
  * repeats before the explode). Term document-frequencies DERIVE from
  * that table (a second small aggregation over it, not a second corpus
  * scan); label sizes broadcast. A/B/C/D are exact longs; the χ² value
  * itself is a fixed IEEE op sequence over their double casts —
  * identical in any engine, so the whole selection incl. the top-k cut
  * replays bitwise (gate t27). Degenerate strata (term in every doc, or
  * a single-label corpus) yield NULL χ² and are excluded from ranking.
  */
object FeatureSelect {

  /** Top-k terms per label by χ² (ties: term asc).
    * Output: (label, term, chi2, rank).
    */
  def chiSquareTopTerms(df: DataFrame, labelCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val dt = df
      .select(col(labelCol).as("label"),
        explode(array_distinct(tokens(lower(col(textCol))))).as("term"))
    val a = dt.groupBy("label", "term").agg(count(lit(1)).as("a"))
    val tdf = a.groupBy("term").agg(sum("a").as("df"))
    val nl = df.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("nl"))
    val n = nl.agg(sum("nl").as("n"))

    val joined = a.join(tdf, "term")
      .join(broadcast(nl), "label")
      .crossJoin(broadcast(n))
      .select(col("label"), col("term"),
        col("a"), (col("df") - col("a")).as("b"),
        (col("nl") - col("a")).as("c"),
        (col("n") - col("nl") - (col("df") - col("a"))).as("d"),
        col("n"))
    val ad = col("a").cast("double") * col("d").cast("double")
    val bc = col("b").cast("double") * col("c").cast("double")
    val chi2 = (col("n").cast("double") * ((ad - bc) * (ad - bc))) /
      (((col("a") + col("b")).cast("double")
        * (col("c") + col("d")).cast("double"))
        * ((col("a") + col("c")).cast("double")
          * (col("b") + col("d")).cast("double")))
    val scored = joined.select(col("label"), col("term"),
      when((col("c") + col("d")) > 0 && (col("b") + col("d")) > 0,
        chi2).as("chi2"))
    val w = Window.partitionBy("label")
      .orderBy(col("chi2").desc, col("term"))
    scored.filter(col("chi2").isNotNull)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("label", "term", "chi2", "rank")
  }
}
