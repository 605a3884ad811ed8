package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy-string matching — the entity-resolution join: pair rows
  * whose strings are within an edit-distance budget, WITHOUT the O(n×m)
  * cross product. Candidates must share a blocking key (default: a
  * character prefix); only candidates pay the levenshtein verification.
  *
  * Scale design: the join is a plain hash equi-join on the block key, so
  * it shuffles (block, string) pairs and distributes like any other join;
  * the quadratic term is bounded by the largest block (pick blockLen so
  * blocks stay small; a skewed block behaves like any skewed join key and
  * AQE's skew-join splitting applies). Standard recall trade-off of
  * prefix blocking: pairs that differ inside the first blockLen
  * characters are not candidates — choose the block from a stable region
  * of the key, or union several blocking passes (e.g. prefix + suffix)
  * for higher recall, exactly as in classical record-linkage practice.
  */
object FuzzyJoin {

  /** Inner fuzzy join: rows of `left` paired with rows of `right` whose
    * `rightCol` is within `maxDist` edits of `leftCol`, candidates
    * blocked on a shared `blockLen`-character prefix. Emits all left and
    * right columns plus `edit_dist`.
    *
    * The canonical entity-resolution call has the SAME column name on
    * both sides (two tables each with `name`): the right side's match
    * column is then emitted as `<rightCol>_right`. Any other shared
    * column name is rejected up front — a silent duplicate would make
    * every downstream reference ambiguous.
    */
  def blockedByPrefix(left: DataFrame, leftCol: String,
      right: DataFrame, rightCol: String,
      maxDist: Int, blockLen: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    require(blockLen > 0, "blockLen must be positive")
    val rightOut =
      if (rightCol == leftCol || left.columns.contains(rightCol))
        rightCol + "_right"
      else rightCol
    val r0 = right.withColumnRenamed(rightCol, rightOut)
    val clash = left.columns.toSet.intersect(r0.columns.toSet)
    require(clash.isEmpty,
      s"column name(s) ${clash.mkString(", ")} exist on both sides — " +
        "rename before joining (only the match column is auto-renamed)")
    val l = left.withColumn("__blk", substring(col(leftCol), 1, blockLen))
    val r = r0.withColumn("__blk", substring(col(rightOut), 1, blockLen))
    l.join(r, Seq("__blk"))
      .withColumn("edit_dist", levenshtein(col(leftCol), col(rightOut)))
      .filter(col("edit_dist") <= maxDist)
      .drop("__blk")
  }
}
