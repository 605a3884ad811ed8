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
  * characters are not candidates — `blockedMultiPass` unions several
  * blocking passes (default prefix + suffix, deduplicated before
  * verification) for higher recall, exactly as in classical
  * record-linkage practice.
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
      maxDist: Int, blockLen: Int): DataFrame =
    blockedMultiPass(left, leftCol, right, rightCol, maxDist, blockLen,
      passes = Seq(prefixBlock(blockLen)))

  /** Higher-recall variant: candidates from the UNION of several blocking
    * passes (default prefix + suffix — the classical record-linkage
    * remedy), deduplicated BEFORE the levenshtein verification so each
    * candidate pair pays the edit distance once no matter how many passes
    * surface it. A pair is still missed only if it disagrees within the
    * first `blockLen` characters AND the last `blockLen` characters —
    * with maxDist edits total, choosing blockLen > maxDist guarantees at
    * least one untouched block for single-sided edit clusters; truly
    * adversarial pairs need a domain-stable key instead.
    *
    * Each pass is one hash equi-join; P passes = P joins + one distinct —
    * still linear in corpus size, P× the shuffle of the single pass.
    */
  def blockedMultiPass(left: DataFrame, leftCol: String,
      right: DataFrame, rightCol: String,
      maxDist: Int, blockLen: Int,
      passes: Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = Seq.empty)
      : DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    require(blockLen > 0, "blockLen must be positive")
    val blocks =
      if (passes.nonEmpty) passes
      else Seq(prefixBlock(blockLen), suffixBlock(blockLen))
    val rightOut =
      if (rightCol == leftCol || left.columns.contains(rightCol))
        rightCol + "_right"
      else rightCol
    val r0 = right.withColumnRenamed(rightCol, rightOut)
    val clash = left.columns.toSet.intersect(r0.columns.toSet)
    require(clash.isEmpty,
      s"column name(s) ${clash.mkString(", ")} exist on both sides — " +
        "rename before joining (only the match column is auto-renamed)")
    val candidates = blocks.map { blk =>
      val l = left.withColumn("__blk", blk(col(leftCol)))
      val r = r0.withColumn("__blk", blk(col(rightOut)))
      l.join(r, Seq("__blk")).drop("__blk")
    }.reduce(_ unionByName _)
    val deduped =
      if (blocks.size == 1) candidates // single pass can't duplicate
      else candidates.distinct()
    deduped
      .withColumn("edit_dist", levenshtein(col(leftCol), col(rightOut)))
      .filter(col("edit_dist") <= maxDist)
  }

  private def prefixBlock(blockLen: Int)
      : org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    c => substring(c, 1, blockLen)

  private def suffixBlock(blockLen: Int)
      : org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    c => substring(c, -blockLen, blockLen)
}
