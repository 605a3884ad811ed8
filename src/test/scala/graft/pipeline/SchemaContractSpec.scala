package graft.pipeline

import graft.SparkSpec
import graft.core.Graft
import graft.queries.GateQuery
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Contract test for the normalized shape of every driver test table.
  *
  * The round-8 break: the testdata writer changed `events.ts` from parquet
  * TIMESTAMP(NANOS) (read as long under nanosAsLong) to TIMESTAMP(MICROS,
  * isAdjustedToUTC=0) (read as TIMESTAMP_NTZ), and a reader that hard-assumed
  * one physical encoding threw AnalysisException in 23 gate queries before the
  * suite noticed. This spec pins what downstream code may rely on — the
  * NORMALIZED schema after Graft.table / GateQuery.table — for each table, so
  * any future encoding flip (nanos ↔ micros, NTZ ↔ UTC-adjusted, int32 dates)
  * fails HERE, loudly, before the driver's gate does.
  */
class SchemaContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def available: Boolean =
    new java.io.File(sfDir + "/events.parquet").exists()

  /** Normalized column types every reader may assume. Integer widths are
    * pinned loosely (any integral type) — only semantics-bearing types
    * (timestamps, floating point, arrays) are pinned exactly.
    */
  private val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)

  private def assertTs(name: String, colName: String): Unit = {
    val df = GateQuery.table(spark, sfDir, name)
    withClue(s"$name.$colName after normalization: ") {
      df.schema(colName).dataType shouldBe TimestampType
    }
    // The instant must round-trip to integer epoch microseconds — the unit
    // every temporal gate (sessionize, as-of, funnel, EWMA) diffs in, and
    // the unit DuckDB's epoch_us(ts) yields on the oracle side.
    val us = df.select(min(unix_micros(col(colName)))).head.getLong(0)
    // sanity window 1990-01-01 .. 2100-01-01 (TPC-H order dates are 1992-98;
    // events are recent) — a nanos value mistaken for micros lands ~year
    // 55941, a micros value mistaken for millis lands in 1970: both fail
    us should be > 631152000000000L
    us should be < 4102444800000000L
  }

  it should "normalize events.ts to a UTC-session TimestampType" in {
    assume(available, s"$sfDir not present")
    assertTs("events", "ts")
  }

  it should "normalize orders.o_orderdate and lineitem.l_shipdate" in {
    assume(available, s"$sfDir not present")
    assertTs("orders", "o_orderdate")
    assertTs("lineitem", "l_shipdate")
  }

  it should "reject an un-normalizable timestamp encoding loudly" in {
    import spark.implicits._
    val df = Seq(("2024-01-01")).toDF("ts") // StringType: no branch matches
    an[IllegalStateException] should be thrownBy GateQuery.normalizeTs(df, "ts")
  }

  it should "normalize the long-nanos vintage identically to the micros vintage" in {
    import spark.implicits._
    // 2024-06-01 12:34:56.789012 UTC in ns and as NTZ micros
    val usExpected = 1717245296789012L
    val fromNanos = Seq(usExpected * 1000L).toDF("ts")
    val nanosCol = GateQuery.normalizeTs(fromNanos, "ts")
    val got = fromNanos.select(unix_micros(nanosCol)).head.getLong(0)
    got shouldBe usExpected

    val fromNtz = spark.sql(
      s"SELECT make_timestamp_ntz(2024, 6, 1, 12, 34, 56.789012) AS ts")
    val ntzCol = GateQuery.normalizeTs(fromNtz, "ts")
    fromNtz.select(unix_micros(ntzCol)).head.getLong(0) shouldBe usExpected
  }

  it should "keep every test table's key columns at stable types" in {
    assume(available, s"$sfDir not present")
    def typeOf(t: String, c: String): DataType =
      Graft.table(spark, sfDir, t).schema(c).dataType
    integral should contain(typeOf("events", "event_id"))
    integral should contain(typeOf("events", "user_id"))
    typeOf("events", "value") shouldBe DoubleType
    typeOf("events", "event_type") shouldBe StringType
    integral should contain(typeOf("documents", "doc_id"))
    typeOf("documents", "text") shouldBe StringType
    integral should contain(typeOf("embeddings", "vec_id"))
    typeOf("embeddings", "embedding") shouldBe ArrayType(FloatType, containsNull = true)
    integral should contain(typeOf("orders", "o_orderkey"))
    typeOf("orders", "o_totalprice") shouldBe DoubleType
    integral should contain(typeOf("lineitem", "l_orderkey"))
    typeOf("lineitem", "l_quantity") shouldBe DoubleType
  }
}
