package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval union (merge-overlaps) per key — the range twin of
  * sessionization: sessions cluster POINTS by gaps (X101's
  * session_window, q31/d22), this merges RANGES that overlap or touch,
  * yielding per-key covered spans and total coverage. The availability
  * /uptime/exposure primitive: "how long was the user actually in a
  * session", "what fraction of the day was the pipeline busy",
  * "effective ad exposure after overlap collapse" — all interval-union
  * questions where summing raw durations double-counts overlaps.
  *
  * Gaps-and-islands over intervals: within a key, order by
  * (start, end, tiebreak), carry the running max of interval ends; a
  * new island starts where start > every previous end. ONE
  * key-partitioned window pass + one grouped aggregation — no joins,
  * no self-products. All arithmetic on integral bounds (epoch micros):
  * exact, merge-order-free.
  *
  * Intervals are CLOSED-OPEN [start, end): touching intervals
  * ([1,5),[5,9)) merge — the convention that makes coverage additive.
  */
object Intervals {

  /** Merged islands per key: (keyCol, span_start, span_end, n_merged,
    * covered — the island's length, = span_end − span_start by
    * construction). Rows with NULL bounds or end < start are dropped.
    */
  def mergeOverlaps(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val clean = df.filter(col(startCol).isNotNull &&
      col(endCol).isNotNull && col(endCol) >= col(startCol))
    val ordered = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val prevFrame = ordered.rowsBetween(Window.unboundedPreceding, -1)
    val islands = clean
      .withColumn("__pmax", max(col(endCol)).over(prevFrame))
      .withColumn("__brk",
        when(col("__pmax").isNull || col(startCol) > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("__isl", sum("__brk").over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    islands.groupBy(col(keyCol), col("__isl"))
      .agg(min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_merged"))
      .select(col(keyCol), col("span_start"), col("span_end"),
        col("n_merged"),
        (col("span_end") - col("span_start")).as("covered"))
  }

  /** Per-key coverage report over the merged spans: total covered
    * length, span count, and the double-counting the merge removed
    * (raw duration sum − covered).
    */
  def coverage(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val raw = df.filter(col(startCol).isNotNull &&
      col(endCol).isNotNull && col(endCol) >= col(startCol))
      .groupBy(col(keyCol))
      .agg(sum(col(endCol) - col(startCol)).as("raw_total"),
        count(lit(1)).as("n_intervals"))
    val merged = mergeOverlaps(df, keyCol, startCol, endCol)
      .groupBy(col(keyCol))
      .agg(sum(col("covered")).as("covered"),
        count(lit(1)).as("n_spans"))
    raw.join(merged, keyCol)
      .select(col(keyCol), col("n_intervals"), col("n_spans"),
        col("raw_total"), col("covered"),
        (col("raw_total") - col("covered")).as("overlap_removed"))
  }
}
