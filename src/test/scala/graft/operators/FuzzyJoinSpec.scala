package graft.operators

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def names = Seq("alpha-001", "alpha-002", "alpha-999", "beta-001")
    .toDF("name")

  it should "pair strings within the edit budget inside a block" in {
    val probes = Seq("alpha-00X", "beta-00X").toDF("probe")
    val got = FuzzyJoin.blockedByPrefix(probes, "probe", names, "name",
      maxDist = 1, blockLen = 6)
      .select("probe", "name").as[(String, String)].collect().toSet
    got shouldBe Set(
      ("alpha-00X", "alpha-001"), ("alpha-00X", "alpha-002"),
      ("beta-00X", "beta-001"))
  }

  it should "miss pairs differing inside the block prefix (documented)" in {
    val probes = Seq("Xlpha-001").toDF("probe")
    FuzzyJoin.blockedByPrefix(probes, "probe", names, "name",
      maxDist = 1, blockLen = 6).count() shouldBe 0L
  }

  it should "plan a hash equi-join, never a cross product" in {
    val probes = Seq("alpha-00X").toDF("probe")
    val df = FuzzyJoin.blockedByPrefix(probes, "probe", names, "name",
      maxDist = 1, blockLen = 6)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  it should "handle the same match-column name on both sides" in {
    val other = Seq("alpha-003", "gamma-001").toDF("name")
    val got = FuzzyJoin.blockedByPrefix(names, "name", other, "name",
      maxDist = 1, blockLen = 6)
      .select("name", "name_right").as[(String, String)].collect().toSet
    got shouldBe Set(
      ("alpha-001", "alpha-003"), ("alpha-002", "alpha-003"))
  }

  it should "reject other shared column names loudly" in {
    val l = Seq(("a", 1)).toDF("name", "extra")
    val r = Seq(("b", 2)).toDF("other", "extra")
    val ex = the[IllegalArgumentException] thrownBy
      FuzzyJoin.blockedByPrefix(l, "name", r, "other", 1, 1)
    ex.getMessage should include("extra")
  }

  it should "emit the edit distance and honor maxDist 0" in {
    val probes = Seq("alpha-001").toDF("probe")
    val got = FuzzyJoin.blockedByPrefix(probes, "probe", names, "name",
      maxDist = 0, blockLen = 6)
      .select("name", "edit_dist").as[(String, Int)].collect().toSeq
    got shouldBe Seq(("alpha-001", 0))
  }
}
