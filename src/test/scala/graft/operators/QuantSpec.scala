package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Guarded fixed-point quantizer: exact in-range values, raise (never a
  * silent NULL drop) past the DECIMAL(18,0) range.
  */
class QuantSpec extends SparkSpec {
  import spark.implicits._

  "fixedPoint" should "quantize in-range values exactly (round half up)" in {
    val out = Seq(1.2345675, -2.0, 0.0).toDF("v")
      .select(Quant.fixedPoint(col("v"), 1000000.0).cast("long").as("q"))
      .collect().map(_.getLong(0))
    out shouldBe Array(1234568L, -2000000L, 0L)
  }

  it should "raise on values past the exact DECIMAL(18,0) range" in {
    val ex = intercept[Exception] {
      Seq(1.0e13).toDF("v")
        .select(Quant.fixedPoint(col("v"), 1000000.0))
        .collect()
    }
    ex.getMessage should include("quantized magnitude exceeds")
  }
}
