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

  "blockedMultiPass" should "recall prefix-divergent pairs via the suffix pass" in {
    // Xlpha-001 differs from alpha-001 in the first character: invisible
    // to prefix blocking (the case documented above), caught by suffix
    val probes = Seq("Xlpha-001", "alpha-00X").toDF("probe")
    val got = FuzzyJoin.blockedMultiPass(probes, "probe", names, "name",
      maxDist = 1, blockLen = 6)
      .select("probe", "name").as[(String, String)].collect().toSet
    got should contain(("Xlpha-001", "alpha-001"))
    // and the prefix pass still contributes its pairs
    got should contain(("alpha-00X", "alpha-001"))
  }

  it should "match brute force for single-end edits, with deduped candidates" in {
    // every planted pair differs at ONE end only, so prefix+suffix union
    // must equal the unblocked brute-force join exactly
    val l = Seq("grafting-9", "Xrafting-0", "grafting-0").toDF("probe")
    val r = Seq("grafting-0", "grafting-X").toDF("name")
    val multi = FuzzyJoin.blockedMultiPass(l, "probe", r, "name",
      maxDist = 1, blockLen = 4)
      .select("probe", "name", "edit_dist")
      .as[(String, String, Int)].collect()
    val brute = l.crossJoin(r)
      .withColumn("edit_dist",
        org.apache.spark.sql.functions.levenshtein(
          org.apache.spark.sql.functions.col("probe"),
          org.apache.spark.sql.functions.col("name")))
      .filter("edit_dist <= 1")
      .as[(String, String, Int)].collect()
    // exact-match pairs share BOTH blocks — surfaced twice, verified once
    multi.length shouldBe multi.toSet.size
    multi.toSet shouldBe brute.toSet
  }

  it should "emit the edit distance and honor maxDist 0" in {
    val probes = Seq("alpha-001").toDF("probe")
    val got = FuzzyJoin.blockedByPrefix(probes, "probe", names, "name",
      maxDist = 0, blockLen = 6)
      .select("name", "edit_dist").as[(String, Int)].collect().toSeq
    got shouldBe Seq(("alpha-001", 0))
  }
}
