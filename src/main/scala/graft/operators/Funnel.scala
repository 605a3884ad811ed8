package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Funnel analysis — ordered step completion per entity: "did the user do
  * A, then B (at or after A), then C (at or after B), all within a
  * horizon of A?" The product-analytics staple.
  *
  * Formulated as CHAINED CONDITIONAL MINIMUMS over one window partition:
  * t1 = min ts of step-1 events; t_{i+1} = min ts of step-(i+1) events at
  * or after t_i (and within the horizon). Each step is a window aggregate
  * over the same (entity) partitioning, so Catalyst plans ONE exchange
  * and reuses the sorted partition across all steps — no per-user
  * collect, no UDF, no self-joins-per-step (the naive formulation
  * shuffles once per step).
  *
  * Ties: an event can satisfy consecutive steps at the same timestamp
  * (ts >= prev, the standard inclusive convention); equal-timestamp
  * A-then-B therefore counts as ordered. Use strict > via a shifted
  * horizon upstream if exclusive semantics are needed.
  */
object Funnel {

  /** Per-entity step-completion: (entityCol, steps_completed, t_first,
    * t_last) where steps_completed ∈ [0, steps.length], t_first is the
    * step-1 time, t_last the time of the deepest completed step.
    */
  def completion(df: DataFrame, entityCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      horizon: Column = lit(null)): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(entityCol))
    // t1 from the raw events…
    val step1 = df.withColumn("__t1",
      min(when(col(typeCol) === steps.head, col(tsCol))).over(w))
    val withDeadline = step1.withColumn("__dl",
      when(horizon.isNotNull, col("__t1") + horizon))
    // …then each later step chains on the previous step's window column.
    // Chained selects over the SAME partitioning → one exchange total.
    val chained = steps.zipWithIndex.tail.foldLeft(withDeadline) {
      case (acc, (step, i)) =>
        acc.withColumn(s"__t${i + 1}",
          min(when(col(typeCol) === step && col(tsCol) >= col(s"__t$i") &&
            (col("__dl").isNull || col(tsCol) <= col("__dl")),
            col(tsCol))).over(w))
    }
    val ts = steps.indices.map(i => col(s"__t${i + 1}"))
    // fold shallow→deep so the DEEPEST non-null step lands outermost in
    // the final when-chain (foldLeft wraps later elements outside)
    val completed = ts.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (t, idx)) =>
        when(t.isNotNull, lit(idx + 1)).otherwise(acc)
    }
    val deepest = ts.reverse.zipWithIndex.foldLeft(lit(null).cast("timestamp")) {
      case (acc, (t, _)) => coalesce(acc, t)
    }
    chained
      .groupBy(col(entityCol))
      .agg(first(completed).as("steps_completed"),
        first(col("__t1")).as("t_first"),
        first(deepest).as("t_last"))
      .withColumn("steps_completed", col("steps_completed").cast("long"))
  }

  /** Funnel report: one row per step with the entity count that reached
    * at least that depth (classic drop-off table).
    */
  def report(df: DataFrame, entityCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      horizon: Column = lit(null)): DataFrame = {
    val comp = completion(df, entityCol, typeCol, tsCol, steps, horizon)
    val levels = comp.sparkSession.range(1)
      .select(posexplode(typedLit(steps)).as(Seq("pos", "step")))
      .select((col("pos") + 1).cast("long").as("level"), col("step"))
    val counts = comp.crossJoin(broadcast(levels))
      .filter(col("steps_completed") >= col("level"))
      .groupBy(col("level"), col("step"))
      .agg(count(lit(1)).as("n_entities"))
    // left join FROM the levels so a step nobody reached still emits its
    // zero row — "one row per step" must hold or positional consumers
    // (charts, step-to-step conversion) silently misalign
    levels.join(counts, Seq("level", "step"), "left")
      .select(col("level"), col("step"),
        coalesce(col("n_entities"), lit(0L)).as("n_entities"))
      .orderBy("level")
  }
}
