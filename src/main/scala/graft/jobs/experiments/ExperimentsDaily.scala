package graft.jobs.experiments

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.jobs.clientsdaily.Fields

/** experiments_daily: the clients_daily rollup keyed additionally by
  * experiment, ported from mozetl/experimentsdaily/rollup.py.
  */
object ExperimentsDaily {

  /** rollup.py:7. */
  val ExcludedId = "pref-flip-screenshots-release-1369150"

  def loadFilter(frame: DataFrame): DataFrame =
    frame.where(col("experiment_id") =!= ExcludedId)

  /** rollup.py:18-27. */
  def toExperimentProfileDayAggregates(frameWithExtracts: DataFrame): DataFrame = {
    val f =
      if (frameWithExtracts.columns.contains("activity_date")) frameWithExtracts
      else frameWithExtracts.select(col("*"), Fields.activityDateColumn)
    f.groupBy("experiment_id", "client_id", "activity_date")
      .agg(Fields.experimentFieldAggregators.head,
        Fields.experimentFieldAggregators.tail: _*)
  }
}
