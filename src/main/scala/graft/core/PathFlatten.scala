package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** moztelemetry-style ping path flattening: the reference's
  * get_pings_properties selects slash-separated paths out of nested ping
  * dicts row-at-a-time in Python (bhr_collection.py:491-514,
  * graphics_telemetry_dashboard.py:114-147). Spark-first, a path is just
  * a nested column reference — flattening is a projection, fully pruned
  * and codegen'd, with the original slash path preserved as the output
  * column name (the downstream jobs key on those names).
  */
object PathFlatten {

  /** "payload/system/os/name" → col("payload.system.os.name") aliased
    * back to the slash path.
    */
  def pathColumn(path: String): Column =
    col(path.split("/").mkString(".")).as(path)

  /** Project a frame down to the given slash paths (missing intermediate
    * fields surface as analysis errors, matching the reference's KeyError
    * behavior; use `existingPaths` to pre-filter defensively).
    */
  def flatten(df: DataFrame, paths: Seq[String]): DataFrame =
    df.select(paths.map(pathColumn): _*)

  /** The subset of `paths` resolvable against the frame's schema.
    * Matches Spark's own resolution rules, which the previous version
    * under-approximated: field lookup is CASE-INSENSITIVE (the analyzer's
    * default), and a path step may pass through an array of structs
    * (projection maps over elements) or a map's value type — both shapes
    * are routine in ping payloads (histogram maps, addon arrays).
    */
  def existingPaths(df: DataFrame, paths: Seq[String]): Seq[String] = {
    import org.apache.spark.sql.types._
    def step(dt: DataType, part: String): Option[DataType] = dt match {
      case s: StructType =>
        s.fields.find(_.name.equalsIgnoreCase(part)).map(_.dataType)
      case a: ArrayType => step(a.elementType, part)
      case m: MapType   => step(m.valueType, part)
      case _            => None
    }
    paths.filter { p =>
      p.split("/").foldLeft(Option(df.schema: DataType)) {
        (acc, part) => acc.flatMap(step(_, part))
      }.isDefined
    }
  }
}
