package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Eval-set decontamination: flag training documents whose n-gram shingles
  * overlap a (small) probe set drawn from benchmark/eval data — the
  * standard guard against test-set leakage into a training corpus.
  *
  * Plan shape: the probe set ships as ONE array literal (typedLit — the
  * per-element lit() tree would cost O(|probe|) Catalyst nodes), so the
  * whole operator is a map-only pass over the corpus: shingle, intersect,
  * divide. No shuffle, no join — at 100 TB this is a free rider on
  * whatever scan the pipeline already does. For probe sets too large to
  * broadcast as a literal (millions of n-grams), fall back to hashing
  * both sides (polyHash) and a broadcast semi-join on the 8-byte keys.
  */
object Contamination {

  /** Per-document overlap with the probe shingle set.
    *
    * Output: (idCol, n_shingles, overlap_cnt, overlap_frac,
    * contaminated ∈ {0,1}). Documents with no shingles (empty text) get
    * n_shingles = 0 and overlap_frac = 0.0.
    */
  def ngramOverlap(df: DataFrame, idCol: String, textCol: String,
      probe: Seq[String], n: Int = 3): DataFrame = {
    require(probe.nonEmpty, "decontamination needs a non-empty probe set")
    val probeLit = typedLit(probe.distinct)
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        shingleSetFromTokens(col("__toks"), n).as("__ss"))
      .select(
        col(idCol),
        size(col("__ss")).cast("long").as("n_shingles"),
        size(array_intersect(col("__ss"), probeLit)).cast("long")
          .as("overlap_cnt"))
      .select(col(idCol), col("n_shingles"), col("overlap_cnt"),
        when(col("n_shingles") > 0,
          col("overlap_cnt").cast("double") / col("n_shingles").cast("double"))
          .otherwise(lit(0.0)).as("overlap_frac"),
        (col("overlap_cnt") > 0).cast("int").as("contaminated"))
  }

  /** Keep only uncontaminated documents (all original columns). */
  def decontaminate(df: DataFrame, idCol: String, textCol: String,
      probe: Seq[String], n: Int = 3): DataFrame = {
    val flagged = ngramOverlap(df, idCol, textCol, probe, n)
      .select(col(idCol), col("contaminated"))
    df.join(flagged, Seq(idCol), "left")
      .filter(col("contaminated") === 0 || col("contaminated").isNull)
      .drop("contaminated")
  }
}
