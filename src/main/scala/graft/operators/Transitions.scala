package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over per-entity ordered event
  * streams — "what do users do next": for every adjacent (state → next
  * state) pair, its count and the row-normalized transition probability.
  * The journey-analysis primitive behind flow diagrams and next-action
  * models (beyond-reference op, SURVEY §2.13).
  *
  * Plan shape: ONE hash exchange on the entity for the lead window, then
  * a map-side-combinable (from, to) count — the matrix is tiny (|states|²
  * at most), so the normalizing window over it is free. No self-join (the
  * naive adjacent-pair formulation joins the stream to itself on
  * rank = rank+1, shuffling the data twice).
  *
  * prob is a single division of two exact integer counts — one correctly
  * rounded IEEE op, so the q47 oracle replays it bitwise.
  */
object Transitions {

  /** (from_state, to_state, n, prob), one row per observed transition.
    * Adjacency is defined by `orderCols` within each entity; ties must be
    * broken by a unique column for a deterministic matrix.
    */
  def matrix(df: DataFrame, entityCol: String, stateCol: String,
      orderCols: String*): DataFrame = {
    require(orderCols.nonEmpty, "at least one ordering column is required")
    // NOTE on NULL states: any pair whose FOLLOWING state is null is
    // dropped (x→NULL mid-stream as well as the final x→end-of-stream —
    // lead() cannot distinguish them), while NULL→y pairs are counted as
    // a real null from-group — matching SQL GROUP BY + IS NOT NULL
    // semantics in any engine (and the q47 oracle).
    val byEntity = Window.partitionBy(entityCol)
      .orderBy(orderCols.map(col): _*)
    val byFrom = Window.partitionBy("from_state")
    df
      .select(col(entityCol), col(stateCol).as("from_state"),
        lead(col(stateCol), 1).over(byEntity).as("to_state"))
      .filter(col("to_state").isNotNull)
      .groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
      .withColumn("prob",
        col("n").cast("double") / sum("n").over(byFrom).cast("double"))
  }
}
