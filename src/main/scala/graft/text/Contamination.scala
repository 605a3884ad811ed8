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

  /** Large-probe decontamination — the scale path the literal-array form
    * can't take: the probe set arrives as a DATAFRAME of benchmark
    * documents (millions of n-grams), both sides hash their shingles to
    * 8-byte polyhash keys, and the probe keys broadcast into a left join
    * against the exploded corpus shingles. One exchange (the per-doc
    * regroup); the corpus text itself never shuffles.
    *
    * `maxOverlapFrac` makes this the fraction-threshold variant used by
    * open-eval decontamination (drop a document only when MORE than that
    * fraction of its distinct n-grams hit the benchmark; 0.0 = any hit).
    *
    * Overlap equality is on the 8-byte fingerprint, not the raw shingle
    * string — the d08 fingerprint-as-identity contract (a collision
    * counts as overlap; at 1e9+7 hash space and benchmark-sized probes
    * the false-contamination rate is negligible, and the t24 oracle
    * replays the same hashes bitwise).
    *
    * Output: (idCol, n_shingles, overlap_cnt, overlap_frac,
    * contaminated ∈ {0,1}), one row per input document (empty docs get
    * n_shingles = 0, contaminated = 0).
    */
  def ngramOverlapJoin(df: DataFrame, idCol: String, textCol: String,
      probe: DataFrame, probeTextCol: String, n: Int = 3,
      maxOverlapFrac: Double = 0.0): DataFrame = {
    require(maxOverlapFrac >= 0.0 && maxOverlapFrac < 1.0,
      s"maxOverlapFrac must be in [0, 1): $maxOverlapFrac")
    val probeKeys = probe
      .select(explode(shingleSetFromTokens(
        tokens(col(probeTextCol)), n)).as("__s"))
      .select(polyHash(col("__s")).as("__ph"))
      .distinct()
    val docShingles = df
      // explode_outer: zero-shingle documents must still report a row
      .select(col(idCol), explode_outer(shingleSetFromTokens(
        tokens(col(textCol)), n)).as("__s"))
      .select(col(idCol), polyHash(col("__s")).as("__h"))
    docShingles
      .join(broadcast(probeKeys), col("__h") === col("__ph"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("__h")).as("n_shingles"),
        count(col("__ph")).as("overlap_cnt"))
      .select(col(idCol), col("n_shingles"), col("overlap_cnt"),
        when(col("n_shingles") > 0,
          col("overlap_cnt").cast("double") / col("n_shingles").cast("double"))
          .otherwise(lit(0.0)).as("overlap_frac"),
        when(col("n_shingles") > 0,
          (col("overlap_cnt").cast("double") >
            col("n_shingles").cast("double") * maxOverlapFrac).cast("int"))
          .otherwise(lit(0)).as("contaminated"))
  }

  /** Keep only documents below the overlap threshold (all original
    * columns) — [[ngramOverlapJoin]]'s filtering form.
    */
  def decontaminateJoin(df: DataFrame, idCol: String, textCol: String,
      probe: DataFrame, probeTextCol: String, n: Int = 3,
      maxOverlapFrac: Double = 0.0): DataFrame = {
    val flagged =
      ngramOverlapJoin(df, idCol, textCol, probe, probeTextCol, n,
        maxOverlapFrac)
        .filter(col("contaminated") === 1)
        .select(col(idCol))
    df.join(flagged, Seq(idCol), "left_anti")
  }
}
