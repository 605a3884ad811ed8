package graft.pipeline

import graft.SparkSpec
import graft.operators.Scd

/** SCD2 merge (operators/Scd): all five branch behaviors, closeMissing
  * policy, null-safe change detection, multi-key dimensions, partition
  * invariance.
  */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private val D = "2024-06-01"

  // k=1 closed+open history (unchanged), k=2 open (will change),
  // k=3 open (absent from updates), k=4 arrives new
  private lazy val history = Seq(
    (1L, "bronze", "2019-01-01", "2020-01-01"),
    (1L, "silver", "2020-01-01", null),
    (2L, "bronze", "2020-01-01", null),
    (3L, "gold", "2020-01-01", null)
  ).toDF("k", "tier", "valid_from", "valid_to")

  private lazy val updates = Seq(
    (1L, "silver"), // unchanged
    (2L, "gold"), // changed
    (4L, "bronze") // new key
  ).toDF("k", "tier")

  private def merged(closeMissing: Boolean = false) =
    Scd.merge2(history, updates, Seq("k"), Seq("tier"), D,
        closeMissing = closeMissing)
      .as[(Long, String, String, Option[String])].collect().toSet

  behavior of "Scd.merge2"

  it should "close changed rows, insert new versions, pass the rest" in {
    merged() shouldBe Set(
      (1L, "bronze", "2019-01-01", Some("2020-01-01")), // closed history
      (1L, "silver", "2020-01-01", None), // unchanged open
      (2L, "bronze", "2020-01-01", Some(D)), // closed now
      (2L, "gold", D, None), // replacement
      (3L, "gold", "2020-01-01", None), // absent -> stays open
      (4L, "bronze", D, None)) // new key
  }

  it should "close keys missing from a total snapshot when asked" in {
    merged(closeMissing = true) should contain(
      (3L, "gold", "2020-01-01", Some(D)))
    merged(closeMissing = true).count(_._1 == 3L) shouldBe 1
  }

  it should "treat null tracked values null-safely" in {
    val h = Seq((1L, Option.empty[String], "2020-01-01", null: String))
      .toDF("k", "tier", "valid_from", "valid_to")
    val u = Seq((1L, Option.empty[String])).toDF("k", "tier")
    // null == null -> unchanged, nothing closes
    Scd.merge2(h, u, Seq("k"), Seq("tier"), D).count() shouldBe 1L
  }

  it should "support composite keys and several tracked columns" in {
    val h = Seq((1L, "us", "a", 10, "2020-01-01", null: String))
      .toDF("k", "region", "grade", "score", "valid_from", "valid_to")
    val u = Seq((1L, "us", "a", 11)).toDF("k", "region", "grade", "score")
    val out = Scd.merge2(h, u, Seq("k", "region"),
        Seq("grade", "score"), D)
      .orderBy("valid_from").collect()
    out.length shouldBe 2
    out(0).getString(5) shouldBe D // closed at asOf
    out(1).getInt(3) shouldBe 11 // new version carries the update
  }

  it should "be invariant to partitioning" in {
    val a = Scd.merge2(history.repartition(5), updates.repartition(3),
      Seq("k"), Seq("tier"), D)
      .as[(Long, String, String, Option[String])].collect().toSet
    a shouldBe merged()
  }

  it should "time-travel with asOf across the merged history" in {
    val h2 = Scd.merge2(history, updates, Seq("k"), Seq("tier"), D)
    // before the merge date: the pre-merge open rows
    Scd.asOf(h2, "2022-01-01")
      .as[(Long, String, String, Option[String])].collect().toSet shouldBe
      Set((1L, "silver", "2020-01-01", None),
        (2L, "bronze", "2020-01-01", Some(D)),
        (3L, "gold", "2020-01-01", None))
    // on/after the merge date: the new versions win
    Scd.asOf(h2, D).as[(Long, String, String, Option[String])]
      .collect().toSet shouldBe
      Set((1L, "silver", "2020-01-01", None),
        (2L, "gold", D, None),
        (3L, "gold", "2020-01-01", None),
        (4L, "bronze", D, None))
    // far past: only the earliest closed version existed
    Scd.asOf(h2, "2019-06-01")
      .as[(Long, String, String, Option[String])]
      .collect().toSet shouldBe
      Set((1L, "bronze", "2019-01-01", Some("2020-01-01")))
  }

  it should "reject empty key or tracked lists" in {
    an[IllegalArgumentException] should be thrownBy
      Scd.merge2(history, updates, Seq.empty, Seq("tier"), D)
    an[IllegalArgumentException] should be thrownBy
      Scd.merge2(history, updates, Seq("k"), Seq.empty, D)
  }
}
