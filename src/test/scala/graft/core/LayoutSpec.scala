package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: Morton interleave pins, the data-skipping property
  * (every z-bucket bounds BOTH dimensions, unlike a linear sort), scaling
  * edge cases, and determinism/row preservation of the layout form.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  "interleaveBits" should "produce the textbook Morton codes" in {
    val rows = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L), (2L, 1L))
      .toDF("a", "b")
      .select(Layout.interleaveBits(col("a"), col("b"), bits = 2).as("z"))
      .as[Long].collect().toSeq
    // a bits land at even positions, b bits at odd:
    // (3,0)→0b0101, (0,3)→0b1010, (3,3)→0b1111, (2,1)→0b0110
    rows shouldBe Seq(0L, 5L, 10L, 15L, 6L)
  }

  "zvalues" should "bound BOTH dimensions within every bucket on a " +
      "uniform grid (the skipping property a linear sort lacks)" in {
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x, y))
      .toDF("x", "y")
    val boxes = Layout.zvalues(grid, "x", "y", bits = 2, nBuckets = 16)
      .groupBy("__zbucket")
      .agg((max("x") - min("x")).as("xspan"),
        (max("y") - min("y")).as("yspan"),
        count(lit(1)).as("n"))
      .collect()
    boxes.length shouldBe 16
    // global span is 15; every z-tile bounds BOTH dimensions to ≤ 4
    // (quarter-ish, integer-div boundaries): a 16-slice linear sort
    // would give xspan 0 but yspan 15
    boxes.foreach { r =>
      r.getAs[Int]("xspan") should be <= 4
      r.getAs[Int]("yspan") should be <= 4
    }
    boxes.map(_.getAs[Long]("n")).sum shouldBe 256L
  }

  it should "scale degenerate constant columns to zero, not divide by " +
      "zero" in {
    val df = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("x", "y")
    val got = Layout.zvalues(df, "x", "y", bits = 4, nBuckets = 4)
    got.select(max("__zy")).as[Long].collect().head shouldBe 0L
    got.select(countDistinct("__zx")).as[Long].collect().head shouldBe 3L
  }

  "zvaluesN" should "bound every dimension within every bucket in 3-D" in {
    val grid = (for (x <- 0 until 16; y <- 0 until 16; z <- 0 until 16)
      yield (x, y, z)).toDF("x", "y", "z")
    val boxes = Layout
      .zvaluesN(grid, Seq("x", "y", "z"), bits = 2, nBuckets = 64)
      .groupBy("__zbucket")
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"),
        (max("z") - min("z")).as("zs"), count(lit(1)).as("n"))
      .collect()
    boxes.length shouldBe 64
    boxes.foreach { r =>
      r.getAs[Int]("xs") should be <= 5
      r.getAs[Int]("ys") should be <= 5
      r.getAs[Int]("zs") should be <= 5
    }
    boxes.map(_.getAs[Long]("n")).sum shouldBe 4096L
  }

  it should "cycle bits across dimensions (3-col Morton pin)" in {
    // bits=1, three dims: z = x<<0 | y<<1 | z<<2 over the low bit
    val got = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L), (1L, 1L, 1L))
      .toDF("a", "b", "c")
      .select(Layout.interleaveBitsN(
        Seq(col("a"), col("b"), col("c")), bits = 1).as("m"))
      .as[Long].collect().toSeq
    got shouldBe Seq(1L, 2L, 4L, 7L)
  }

  "zorderLayout" should "preserve rows and lay the curve out " +
      "deterministically" in {
    val grid = (for (x <- 0 until 32; y <- 0 until 32)
      yield (x * 3, y * 5)).toDF("x", "y")
    val a = Layout.zorderLayout(grid, "x", "y", bits = 5, nBuckets = 8)
    a.count() shouldBe 32L * 32L
    val takeTwice = Seq(a, Layout
        .zorderLayout(grid.repartition(7), "x", "y", bits = 5, nBuckets = 8))
      .map(_.select("x", "y", "__z", "__zbucket").collect()
        .map(_.toSeq).sortBy(_.toString))
    takeTwice.head shouldBe takeTwice(1)
  }
}
