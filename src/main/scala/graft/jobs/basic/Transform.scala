package graft.jobs.basic

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Config-driven ping projection (mozetl/basic/transform.py:12-66).
  *
  * The reference maps each raw JSON ping through `get_pings_properties`
  * (slash-separated path extraction), applies per-column cleaning
  * functions row-at-a-time in Python, filters, and promotes the RDD to a
  * DataFrame with a declared schema. Here the whole pipeline is columnar:
  * each path becomes one codegen'd `get_json_object` + cast, cleaning is a
  * Column→Column function, and the filter is a predicate over the
  * projected columns — no row-at-a-time stage anywhere.
  */
object Transform {

  /** One output column: name, slash-separated JSON path into the ping,
    * optional cleaning expression, target type
    * (transform.py:12-14 ColumnConfig).
    */
  case class ColumnConfig(
      name: String,
      path: String,
      clean: Option[Column => Column] = None,
      dataType: DataType = org.apache.spark.sql.types.StringType)

  /** Column set + ping filter (transform.py:17-28 DataFrameConfig). The
    * filter is expressed over the PROJECTED columns, mirroring the
    * reference's filter over extracted path values.
    */
  case class FrameConfig(columns: Seq[ColumnConfig], pingFilter: Column)

  /** `clientId` → `$.clientId`, `payload/study_state` →
    * `$.payload.study_state`.
    */
  def jsonPath(slashPath: String): String =
    "$." + slashPath.split("/").mkString(".")

  /** convert_pings (transform.py:31-38): project each configured path out
    * of the raw JSON column, clean, cast, filter.
    */
  def convertPings(pings: DataFrame, cfg: FrameConfig,
      rawCol: String = "raw"): DataFrame = {
    val cols = cfg.columns.map { c =>
      val extracted = get_json_object(col(rawCol), jsonPath(c.path))
      c.clean.fold(extracted)(f => f(extracted))
        .cast(c.dataType).as(c.name)
    }
    pings.select(cols: _*).filter(cfg.pingFilter)
  }
}
