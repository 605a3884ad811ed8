package graft.operators

import graft.SparkSpec

/** Fellegi–Sunter scoring: hand-computed frequency-based weights,
  * rare-agreement premium, null-safe agreement, degenerate fields,
  * determinism.
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  // reference: lang 'en' x3, 'kr' x1 -> u = (9+1)/16 = 0.625
  private val ref = Seq("en", "en", "en", "kr").toDF("lang")

  private def microW(m: Double, u: Double): Long =
    math.floor(math.log(m / u) * 1e6 + 0.5).toLong

  "fsScore" should "compute the hand-derived agreement weight" in {
    val pairs = Seq(("en", "en"), ("en", "kr")).toDF("l_a", "l_b")
    val out = Linkage.fsScore(pairs,
        Seq(Linkage.Field("l_a", "l_b", "lang")), ref, m = 0.9)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toList.sortBy(_._2)
    // agree: ln(0.9/0.625); disagree: ln(0.1/0.375)
    out should contain(("en", "en", microW(0.9, 0.625)))
    out should contain(("en", "kr", microW(0.1, 0.375)))
  }

  it should "sum weights across fields exactly" in {
    val ref2 = Seq(("en", "web"), ("en", "web"), ("kr", "book"),
      ("kr", "web")).toDF("lang", "src")
    val pairs = Seq(("en", "en", "web", "book")).toDF(
      "l_a", "l_b", "s_a", "s_b")
    val r = Linkage.fsScore(pairs, Seq(
        Linkage.Field("l_a", "l_b", "lang"),
        Linkage.Field("s_a", "s_b", "src")), ref2, m = 0.8)
      .collect().head
    // lang u = (4+4)/16 = 0.5 agree; src u = (9+1)/16 = 0.625 disagree
    r.getLong(4) shouldBe microW(0.8, 0.5) + microW(0.2, 0.375)
    r.getDouble(5) shouldBe r.getLong(4).toDouble / 1e6
  }

  it should "treat NULL = NULL as agreement (the snapshot-diff rule)" in {
    val pairs = Seq((None: Option[String], None: Option[String]),
      (Some("en"), None)).toDF("l_a", "l_b")
    val out = Linkage.fsScore(pairs,
        Seq(Linkage.Field("l_a", "l_b", "lang")), ref)
      .collect().map(r => (r.isNullAt(0), r.isNullAt(1)) -> r.getLong(2))
      .toMap
    out((true, true)) should be > out((false, true))
  }

  it should "NULL the score when a constant field disagrees" in {
    val constRef = Seq("same", "same").toDF("lang")
    val pairs = Seq(("same", "other")).toDF("l_a", "l_b")
    val r = Linkage.fsScore(pairs,
        Seq(Linkage.Field("l_a", "l_b", "lang")), constRef)
      .collect().head
    r.isNullAt(2) shouldBe true
  }

  it should "be invariant under repartitioning" in {
    val pairs = Seq(("en", "en"), ("kr", "en"), ("kr", "kr"))
      .toDF("l_a", "l_b")
    val a = Linkage.fsScore(pairs,
        Seq(Linkage.Field("l_a", "l_b", "lang")), ref)
      .orderBy("l_a", "l_b").collect().map(_.toSeq)
    val b = Linkage.fsScore(pairs.repartition(5),
        Seq(Linkage.Field("l_a", "l_b", "lang")), ref.repartition(3))
      .orderBy("l_a", "l_b").collect().map(_.toSeq)
    a shouldBe b
  }

  it should "reject invalid priors and empty field lists" in {
    val pairs = Seq(("en", "en")).toDF("l_a", "l_b")
    an[IllegalArgumentException] should be thrownBy
      Linkage.fsScore(pairs, Seq.empty, ref)
    an[IllegalArgumentException] should be thrownBy
      Linkage.fsScore(pairs,
        Seq(Linkage.Field("l_a", "l_b", "lang")), ref, m = 1.0)
  }
}
