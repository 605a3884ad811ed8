package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StructType}

/** As-of (nearest-event temporal) join — a whole-operator semantic Spark
  * lacks natively, composed from existing operators (preference (a) of the
  * custom-operator ladder): for each left row, attach the payload of the
  * single right row with the greatest `rightTime <= leftTime` (backward) or
  * smallest `rightTime >= leftTime` (forward) within the same key group.
  *
  * SINGLE-SHUFFLE formulation built for the 100 TB case: tag and union the
  * two sides, then one window pass partitioned by key carries the latest
  * right payload forward (`last(_, ignoreNulls)` over a running frame).
  * Compared to the naive formulations this avoids
  *   - the O(|L|×|R|) theta-join (BroadcastNestedLoopJoin) Spark would plan
  *     for `l.key = r.key AND r.t <= l.t` + per-row max, and
  *   - a range fan-out join whose skew follows the busiest key.
  * Both sides shuffle exactly once, on the key columns; payload travels as
  * one struct per right row. The plan contains NO join node at all
  * (AsofJoinSpec asserts a single exchange and join-free plan).
  *
  * Ordering inside a key is (time, side, rightOrder): right rows sort
  * before left rows at equal times, which yields the inclusive `<=` / `>=`
  * bound; `rightOrder` (a unique right column) makes the winner among
  * equal-time right rows deterministic.
  *
  * Payload column names must not collide with left column names — rename
  * on the right frame before calling (as pandas `merge_asof` requires too).
  */
object AsofJoin {

  /** Backward as-of join (the pandas `merge_asof` default): latest right
    * row at or before the left row's time.
    *
    * @param payload    right columns to attach to each matched left row
    * @param rightOrder unique right column breaking ties among equal-time
    *                   right rows (largest wins); None if times are unique
    * @param tolerance  optional predicate on (leftTime, matchedRightTime);
    *                   when false the match is discarded (payload nulls)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      rightOrder: Option[String] = None,
      tolerance: Option[(Column, Column) => Column] = None): DataFrame =
    asof(left, right, keys, leftTime, rightTime, payload, rightOrder,
      tolerance, forward = false)

  /** Forward as-of join: earliest right row at or after the left row's
    * time (ties broken toward the smallest `rightOrder`).
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      rightOrder: Option[String] = None,
      tolerance: Option[(Column, Column) => Column] = None): DataFrame =
    asof(left, right, keys, leftTime, rightTime, payload, rightOrder,
      tolerance, forward = true)

  /** Internal column names used by the union+window formulation. Caller
    * frames must not use them (require below) — a silent collision would
    * corrupt output rather than fail.
    */
  private val Reserved = Set("__t", "__side", "__rid", "__rp", "__m")

  private def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      rightOrder: Option[String],
      tolerance: Option[(Column, Column) => Column],
      forward: Boolean): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    val clash = (left.columns ++ right.columns).filter(Reserved).distinct
    require(clash.isEmpty,
      s"as-of join reserves column names ${Reserved.mkString(", ")}; " +
        s"rename ${clash.mkString(", ")} before calling")
    val leftNonKey = left.columns.filterNot(keys.contains).toSeq
    // the matched payload travels as ONE struct per right row; rightTime
    // rides along so the tolerance predicate can see it
    val payloadFields = (payload :+ rightTime).distinct
    val rpType = StructType(payloadFields.map(f => right.schema(f)))
    val ridType: DataType =
      rightOrder.map(right.schema(_).dataType).getOrElse(LongType)

    def nullAs(dt: DataType, name: String): Column = lit(null).cast(dt).as(name)

    // Join semantics never match on NULL keys, but the window partitioning
    // below groups NULL key values into one partition like GROUP BY would —
    // so null-keyed right rows must be dropped up front or they would match
    // null-keyed left rows (diverging from any real join, incl. the DuckDB
    // ASOF oracle). Null-keyed LEFT rows stay and get a null payload.
    val rightKeyed = right.filter(keys.map(col(_).isNotNull).reduce(_ && _))

    val rSide = rightKeyed.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        rightOrder.map(col).getOrElse(lit(null).cast(ridType)).as("__rid"),
        struct(payloadFields.map(col): _*).as("__rp")) ++
      leftNonKey.map(c => nullAs(left.schema(c).dataType, c)): _*)
    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(1).as("__side"),
        nullAs(ridType, "__rid"),
        nullAs(rpType, "__rp")) ++
      leftNonKey.map(col): _*)

    // Backward scans time ascending so `last` sees the greatest rt <= lt;
    // forward scans descending so it sees the smallest rt >= lt. Right
    // rows order before left rows at equal __t either way (inclusive
    // bound); __rid orients so the LAST equal-time right row is the
    // deterministic winner.
    val ord =
      if (forward) Seq(col("__t").desc, col("__side").asc, col("__rid").desc)
      else Seq(col("__t").asc, col("__side").asc, col("__rid").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = rSide.unionByName(lSide)
      .withColumn("__m", last("__rp", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val valid = tolerance match {
      case Some(pred) =>
        col("__m").isNotNull && pred(col("__t"), col("__m").getField(rightTime))
      case None => col("__m").isNotNull
    }
    matched.select(
      left.columns.map(col).toSeq ++
        payload.map(p => when(valid, col("__m").getField(p)).as(p)): _*)
  }

  /** Nearest-mode as-of join: for each left row, the right row with the
    * SMALLEST |rightTime − leftTime| within the key group, ties toward
    * the backward (earlier-or-equal) side — completing the
    * backward/forward pair with the mode pandas calls
    * `direction='nearest'`. Time columns must be integral (epoch
    * micros): distance comparison needs arithmetic, not just ordering.
    *
    * Same single-shuffle discipline: ONE union, ONE key-partitioned
    * exchange, TWO in-partition window sorts (ascending carry for the
    * backward candidate, descending for the forward), and a projection
    * picks the closer side. Still no join node.
    *
    * `toleranceMicros`: matches farther than this are discarded
    * (payload nulls); None = unbounded.
    */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      rightOrder: Option[String] = None,
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    val reserved = Reserved ++ Set("__mb", "__mf")
    val clash = (left.columns ++ right.columns).filter(reserved).distinct
    require(clash.isEmpty,
      s"as-of join reserves column names ${reserved.mkString(", ")}; " +
        s"rename ${clash.mkString(", ")} before calling")
    val leftNonKey = left.columns.filterNot(keys.contains).toSeq
    val payloadFields = (payload :+ rightTime).distinct
    val rpType = StructType(payloadFields.map(f => right.schema(f)))
    val ridType: DataType =
      rightOrder.map(right.schema(_).dataType).getOrElse(LongType)
    def nullAs(dt: DataType, name: String): Column =
      lit(null).cast(dt).as(name)
    val rightKeyed = right.filter(keys.map(col(_).isNotNull).reduce(_ && _))
    val rSide = rightKeyed.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__side"),
        rightOrder.map(col).getOrElse(lit(null).cast(ridType)).as("__rid"),
        struct(payloadFields.map(col): _*).as("__rp")) ++
      leftNonKey.map(c => nullAs(left.schema(c).dataType, c)): _*)
    val lSide = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__side"),
        nullAs(ridType, "__rid"), nullAs(rpType, "__rp")) ++
      leftNonKey.map(col): _*)
    val pcols = keys.map(col)
    val wAsc = Window.partitionBy(pcols: _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__rid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy(pcols: _*)
      .orderBy(col("__t").desc, col("__side").asc, col("__rid").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rSide.unionByName(lSide)
      .withColumn("__mb", last("__rp", ignoreNulls = true).over(wAsc))
      .withColumn("__mf", last("__rp", ignoreNulls = true).over(wDesc))
      .filter(col("__side") === 1)
    val dtb = col("__t") - col("__mb").getField(rightTime)
    val dtf = col("__mf").getField(rightTime) - col("__t")
    val pick = when(col("__mb").isNull, col("__mf"))
      .when(col("__mf").isNull, col("__mb"))
      .when(dtf < dtb, col("__mf"))
      .otherwise(col("__mb"))
    val withPick = matched.withColumn("__m", pick)
    val dist = abs(col("__m").getField(rightTime) - col("__t"))
    val valid = toleranceMicros match {
      case Some(tol) => col("__m").isNotNull && dist <= lit(tol)
      case None => col("__m").isNotNull
    }
    withPick.select(
      left.columns.map(col).toSeq ++
        payload.map(p => when(valid, col("__m").getField(p)).as(p)): _*)
  }
}
