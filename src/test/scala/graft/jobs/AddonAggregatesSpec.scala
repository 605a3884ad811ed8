package graft.jobs

import graft.SparkSpec
import graft.jobs.addons.AddonAggregates
import MainSummaryFixture._
import org.apache.spark.sql.functions.col

class AddonAggregatesSpec extends SparkSpec {

  private def df(snippets: Map[String, Any]*) =
    makeDF(schema, base, snippets)

  it should "count self-installed vs system/foreign/shield addons" in {
    val in = df(Map("active_addons" -> Seq(
      addon("cool@addon", installDay = 17000L),
      addon("uBlock0@raymondhill.net", installDay = 16900L),
      addon("screenshots@mozilla.org"),
      addon("sys@thing", isSystem = true),
      addon("foreign@thing", foreignInstall = true),
      addon("study@shield.mozilla.org"),
      addon("web@ext", isWebExtension = true, installDay = 17100L))))
    val out = AddonAggregates.run(in)
    val r = out.collect().head
    // self-install: cool@, uBlock0@, web@ext (mozilla/system/foreign excluded;
    // note study@shield.mozilla.org is ALSO excluded via %mozilla%)
    r.getAs[Long]("n_self_installed_addons") shouldBe 3L
    r.getAs[Long]("n_shield_addons") shouldBe 1L
    r.getAs[Long]("n_foreign_installed_addons") shouldBe 1L
    r.getAs[Long]("n_system_addons") shouldBe 1L
    r.getAs[Long]("n_web_extensions") shouldBe 1L
    // earliest self-install day: 16900 → 1970-01-01 + 16900d = 2016-04-09
    r.getAs[String]("first_addon_install_date") shouldBe "20160409"
    // profile_creation_date 16801 → 2016-01-01 (UTC session pins this)
    r.getAs[String]("profile_creation_date") shouldBe "20160101"
    r.getAs[String]("app_version") shouldBe "54"
  }

  // tests/test_addon_aggregates.py:50-186 over tests/ms-test-data.json,
  // reproduced snippet-for-snippet: 5 pings / 4 clients, duplicate addons
  // across a client's pings, a null addon entry, and mixed channels/locales
  private def msTestData = {
    def a(id: String, installDay: java.lang.Long, isSystem: Boolean = false,
        foreign: Boolean = false, webExt: Boolean = false): org.apache.spark.sql.Row =
      org.apache.spark.sql.Row(id, false, if (id == null) null else s"name-$id",
        false, false, "1.0", 1L, "extension", foreign, false, installDay,
        16001L, 2L, isSystem, webExt, true)
    df(
      Map("client_id" -> "1", "locale" -> "en-US", "document_id" -> "p1",
        "normalized_channel" -> "release", "profile_creation_date" -> 15000L,
        "app_version" -> "57", "active_addons" -> Seq(
          a("system-addon", 16890L, isSystem = true),
          a("foreign-install-addon", 16890L, foreign = true))),
      Map("client_id" -> "1", "locale" -> "en-US", "document_id" -> "p2",
        "normalized_channel" -> "release", "profile_creation_date" -> 15000L,
        "app_version" -> "57", "active_addons" -> Seq(
          a("system-addon", 16890L, isSystem = true),
          a("foreign-install-addon", 16890L, foreign = true),
          a("some-new-we", 16890L, webExt = true))),
      Map("client_id" -> "2", "locale" -> "de", "document_id" -> "p3",
        "normalized_channel" -> "beta", "profile_creation_date" -> 15001L,
        "app_version" -> "57", "active_addons" -> Seq(
          a("shield@shield.mozilla.org", 17000L),
          org.apache.spark.sql.Row(null, null, null, null, null, null, null,
            null, null, null, null, null, null, null, null, null))),
      Map("client_id" -> "3", "locale" -> "en-US", "document_id" -> "p4",
        "normalized_channel" -> "beta", "profile_creation_date" -> 15002L,
        "app_version" -> "56", "active_addons" -> Seq(
          a("we-addon", 16800L, webExt = true))),
      Map("client_id" -> "4", "locale" -> "ru", "document_id" -> "p5",
        "normalized_channel" -> "nightly", "profile_creation_date" -> 15003L,
        "app_version" -> "58", "active_addons" -> Seq(
          a("x@shield.mozilla.org", 16900L),
          a("system1", 17000L, isSystem = true),
          a("system2", 17000L, isSystem = true))))
  }

  it should "explode the reference fixture to 11 addon rows with zeroed null entries" in {
    val exploded = AddonAggregates.explodeAddons(msTestData)
    exploded.count() shouldBe 11
    val nullRow = AddonAggregates.addAddonColumns(exploded)
      .filter(col("addon_id").isNull).collect().head
    Seq("is_system", "is_web_extension", "is_shield_addon",
      "is_foreign_install", "is_self_install")
      .foreach(c => nullRow.getAs[Int](c) shouldBe 0)
  }

  it should "reproduce the reference per-client addon counts" in {
    val agg = AddonAggregates.run(msTestData)
    def counts(cid: String): Seq[Long] = {
      val r = agg.filter(col("client_id") === cid).collect().head
      Seq("n_self_installed_addons", "n_foreign_installed_addons",
        "n_web_extensions", "n_system_addons", "n_shield_addons")
        .map(r.getAs[Long](_))
    }
    counts("1") shouldBe Seq(1L, 1L, 1L, 1L, 0L)
    counts("2") shouldBe Seq(0L, 0L, 0L, 0L, 1L)
    counts("3") shouldBe Seq(1L, 0L, 1L, 0L, 0L)
    counts("4") shouldBe Seq(0L, 0L, 0L, 2L, 1L)
  }

  it should "reproduce the reference days-to-first-install per client" in {
    import java.time.LocalDate
    import java.time.format.DateTimeFormatter.BASIC_ISO_DATE
    import java.time.temporal.ChronoUnit
    val agg = AddonAggregates.run(msTestData)
    val expected = Map("1" -> Some(16890L - 15000L), "2" -> None,
      "3" -> Some(16800L - 15002L), "4" -> None)
    agg.collect().foreach { r =>
      val days = Option(r.getAs[String]("first_addon_install_date")).map(fi =>
        ChronoUnit.DAYS.between(
          LocalDate.parse(r.getAs[String]("profile_creation_date"), BASIC_ISO_DATE),
          LocalDate.parse(fi, BASIC_ISO_DATE)))
      days shouldBe expected(r.getAs[String]("client_id"))
    }
  }

  it should "reproduce the reference channel/locale/version group counts" in {
    val agg = AddonAggregates.run(msTestData)
    def groupCounts(field: String): Map[String, Long] =
      agg.groupBy(field).count().collect()
        .map(r => r.getAs[String](field) -> r.getAs[Long]("count")).toMap
    groupCounts("normalized_channel") shouldBe
      Map("release" -> 1L, "beta" -> 2L, "nightly" -> 1L)
    groupCounts("locale") shouldBe Map("en-US" -> 2L, "de" -> 1L, "ru" -> 1L)
    groupCounts("app_version") shouldBe Map("57" -> 2L, "56" -> 1L, "58" -> 1L)
  }

  it should "dedupe identical exploded rows before aggregating" in {
    val in = df(
      Map("document_id" -> "d1",
        "active_addons" -> Seq(addon("cool@addon"))),
      Map("document_id" -> "d2",
        "active_addons" -> Seq(addon("cool@addon"))))
    val out = AddonAggregates.run(in)
    out.collect().head.getAs[Long]("n_self_installed_addons") shouldBe 1L
  }
}
