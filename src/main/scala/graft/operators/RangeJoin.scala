package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join via bucketing — the second whole-operator
  * semantic Spark lacks a first-class primitive for. A literal
  * `p.x >= r.lo AND p.x < r.hi` join has no equi-key, so Spark plans a
  * BroadcastNestedLoopJoin: O(|points| × |ranges|) comparisons, and a hard
  * wall once the ranges side outgrows the broadcast limit.
  *
  * The bucketed formulation turns it into an equi-join: discretize the
  * domain into `bucketWidth`-sized bins, fan each range out to the bins it
  * overlaps (`explode(sequence(...))`), bin each point with a single
  * `floor`, equi-join on the bin, and re-check the exact bounds. Cost is
  * O(|points| + |ranges| × spansPerRange) shuffled on a well-distributed
  * integer key — the plan AQE can re-balance and that survives a 100×
  * scale-up (RangeJoinSpec asserts equivalence to the naive theta-join and
  * that no nested-loop join appears).
  *
  * `bucketWidth` trades fan-out against selectivity: ~the median range
  * length is a good default (each range spans 1-2 buckets; a bucket join
  * admits only near-miss candidates).
  *
  * Interval semantics are closed-open `[lo, hi)`. Column names must be
  * disjoint between the two frames (rename before calling).
  */
object RangeJoin {

  /** Internal bucket column. Carries `RangeJoinRewrite.BucketPrefix` so
    * the optimizer rule's idempotency marker also recognizes joins this
    * operator already bucketed — otherwise a session with the rewrite
    * width conf set would re-bucket (correct but wasteful: a second
    * explode fan-out) every explicit RangeJoin plan.
    */
  private val BucketCol = graft.plans.RangeJoinRewrite.BucketPrefix + "op"

  /** Join each point row to every range row whose `[lo, hi)` contains the
    * point. Output: point columns ++ range columns, inner-join semantics.
    */
  private def requireNoBucketCol(dfs: DataFrame*): Unit = {
    val clash = dfs.exists(_.columns.contains(BucketCol))
    require(!clash, // fail fast instead of silently clobbering the column
      s"range join reserves column name $BucketCol; rename it before calling")
  }

  def pointInInterval(points: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    requireNoBucketCol(points, ranges)
    val pb = points.withColumn(BucketCol,
      floor(col(pointCol) / bucketWidth).cast("long"))
    // a range [lo, hi) overlaps buckets floor(lo/w) .. floor(hi/w); the hi
    // boundary bucket is included even when hi is exactly on a bucket edge
    // (one spurious candidate bucket, removed by the exact re-check)
    val rb = ranges.withColumn(BucketCol,
      explode(sequence(floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    pb.join(rb, Seq(BucketCol))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop(BucketCol)
  }

  /** Interval-overlap join: pairs of (left, right) rows whose [lLo, lHi) ×
    * [rLo, rHi) intervals overlap. Same bucketing idea, both sides fanned
    * out, de-duplicated on the bucket where the overlap starts so each
    * qualifying pair emits exactly once (no post-join distinct needed).
    */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    requireNoBucketCol(left, right)
    def fanOut(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn(BucketCol,
        explode(sequence(floor(col(lo) / bucketWidth).cast("long"),
          floor(col(hi) / bucketWidth).cast("long"))))
    val overlapStart = greatest(col(lLo), col(rLo))
    fanOut(left, lLo, lHi).join(fanOut(right, rLo, rHi), Seq(BucketCol))
      .filter(col(lLo) < col(rHi) && col(rLo) < col(lHi))
      // emit the pair only from the bucket containing the overlap start —
      // every other shared bucket sees the same pair and drops it here
      .filter(col(BucketCol) === floor(overlapStart / bucketWidth).cast("long"))
      .drop(BucketCol)
  }
}
