package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salting for joins and aggregations: when a handful of hot keys
  * dominate (the power-law reality of 100 TB telemetry/web corpora), a
  * plain hash join/agg puts a whole hot key on one task. Salting splits
  * each hot key into `saltFactor` sub-keys:
  *
  *  - the LARGE side gets a deterministic salt derived from a secondary
  *    column (stable across retries — no rand(), so repeated runs shuffle
  *    identically);
  *  - the SMALL side is exploded across all `saltFactor` salts so every
  *    sub-key still finds its match.
  *
  * AQE's skew-join handles sort-merge skew automatically; salting remains
  * the tool for skewed AGGREGATIONS and for broadcast-infeasible
  * dimension joins with hot keys.
  */
object Salt {

  /** Deterministic salt in [0, saltFactor) from an arbitrary column. */
  def saltOf(c: Column, saltFactor: Int): Column =
    pmod(hash(c), lit(saltFactor))

  /** Salted inner equi-join: large ⋈ small on `key`, hot keys spread over
    * `saltFactor` partitions. `saltSource` must be a column of the large
    * side (any well-distributed value, e.g. its row id).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltSource: String, saltFactor: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      saltOf(col(saltSource), saltFactor))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation: partial aggregate on (key, salt), then
    * final aggregate on key — the manual form of map-side combine for
    * aggregates that don't partial-combine well (e.g. collect-like).
    * `partial` builds the per-(key,salt) aggregates; `merge` combines the
    * partials per key.
    */
  def saltedAgg(df: DataFrame, key: String, saltSource: String,
      saltFactor: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame =
    df.withColumn("__salt", saltOf(col(saltSource), saltFactor))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(merge.head, merge.tail: _*)
}
