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

  /** The subset of `paths` resolvable against the frame's schema. */
  def existingPaths(df: DataFrame, paths: Seq[String]): Seq[String] =
    paths.filter { p =>
      val parts = p.split("/")
      var dt: org.apache.spark.sql.types.DataType = df.schema
      parts.forall { part =>
        dt match {
          case s: org.apache.spark.sql.types.StructType
              if s.fieldNames.contains(part) =>
            dt = s(part).dataType; true
          case _ => false
        }
      }
    }
}
