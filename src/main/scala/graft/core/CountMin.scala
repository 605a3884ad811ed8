package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a TABLE — the
  * point-frequency companion closing the sketch family: X35 Misra-Gries
  * answers "which items are heavy", X50 KMV "how many distinct", X39
  * Bloom "was this seen"; Count-Min answers "about how often did THIS
  * item occur" with a one-sided (over-estimate only) guarantee, in
  * d·width cells regardless of item cardinality.
  *
  * Formulated as a cell table rather than an opaque aggregate buffer
  * because that is what a 100 TB pipeline wants operationally: the
  * build is d map-side-combined bucket counts (shuffle carries ≤
  * d·width partial cells per task), two sketches MERGE by summing
  * cells, a day's increment is a union + re-sum, and point queries are
  * a broadcast join of the (tiny) probe set against ≤ d·width rows.
  *
  * Determinism: bucket_j(x) = (a_j·polyHash(x) + b_j) mod p mod width —
  * the engine-portable PolyHash under the SAME fixed (a, b) constants
  * the MinHash signatures use, so an oracle replays every cell and
  * every estimate bitwise, hash collisions included.
  */
object CountMin {

  /** Depth is capped by the fixed constant pool (shared with MinHash —
    * same public-constant convention, disjoint use).
    */
  val MaxDepth: Int = TextFunctions.MinHashA.length

  private def bucket(j: Int, item: Column, width: Int): Column =
    (TextFunctions.polyHash(item) * TextFunctions.MinHashA(j) +
      TextFunctions.MinHashB(j)) % TextFunctions.HashMod % width

  /** Build the cell table (row, bucket, cnt) over `df.itemCol` — one
    * count per occurrence (weight 1). ≤ depth·width rows come back.
    */
  def build(df: DataFrame, itemCol: String, width: Int, depth: Int)
      : DataFrame = {
    require(width >= 2, "width must be >= 2")
    require(depth >= 1 && depth <= MaxDepth,
      s"depth must be in [1, $MaxDepth]")
    val rows = explode(array((0 until depth).map(j =>
      struct(lit(j).as("row"),
        bucket(j, col(itemCol), width).as("bucket"))): _*))
    df.select(rows.as("c"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes.itemCol`: min over the depth rows of
    * the probed cells (absent cell = 0). The classic CM guarantee:
    * estimate ≥ true count, with overshoot bounded by collisions.
    * Output: probes' columns + (cm_estimate: Long).
    */
  def estimate(sketch: DataFrame, probes: DataFrame, itemCol: String,
      width: Int, depth: Int): DataFrame = {
    require(width >= 2, "width must be >= 2")
    require(depth >= 1 && depth <= MaxDepth,
      s"depth must be in [1, $MaxDepth]")
    val cells = explode(array((0 until depth).map(j =>
      struct(lit(j).as("row"),
        bucket(j, col(itemCol), width).as("bucket"))): _*))
    probes
      .withColumn("c", cells)
      .select(probes.columns.map(col) :+ col("c.row").as("row") :+
        col("c.bucket").as("bucket"): _*)
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_estimate"))
  }
}
