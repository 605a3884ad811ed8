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
