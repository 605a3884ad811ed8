package graft.jobs

import graft.SparkSpec
import graft.jobs.symbolication.{MissingSymbols, SignatureCorrelations}
import org.apache.spark.sql.functions._

case class CrashModule(filename: String, version: String,
    debug_id: String, debug_file: String, missing_symbols: Boolean)

class SymbolicationSpec extends SparkSpec {
  import spark.implicits._

  private def Module(filename: String, version: String, debug_id: String,
      debug_file: String, missing_symbols: Boolean): CrashModule =
    CrashModule(filename, version, debug_id, debug_file, missing_symbols)

  // mirrors modules_with_missing_symbols.py:63-99 semantics: dedup per
  // (uuid, module), threshold, known-module and (deleted) filters
  private def crashes = Seq(
    // badmod.dll appears twice in one crash → counts once for that uuid
    ("c1", "Firefox", Seq(
      Module("badmod.dll", "1.0", "D1", "badmod.pdb", true),
      Module("badmod.dll", "1.0", "D1", "badmod.pdb", true),
      Module("xul.dll", "99.0.1", "DX", "xul.pdb", true))),
    ("c2", "Firefox", Seq(
      Module("badmod.dll", "1.0", "D1", "badmod.pdb", true),
      Module("ignored.dll", "2.0", "D2", "ignored.pdb", true),
      Module("gone.dll (deleted)", "3.0", "D3", "gone.pdb", true))),
    ("c3", "Firefox", Seq(
      Module("badmod.dll", "1.0", "D1", "badmod.pdb", true),
      Module("fine.dll", "4.0", "D4", "fine.pdb", false))),
    // non-Firefox product is excluded entirely
    ("c4", "Thunderbird", Seq(
      Module("badmod.dll", "1.0", "D1", "badmod.pdb", true)))
  ).toDF("uuid", "product", "modules")

  it should "count crashes per module build with per-crash dedup" in {
    val counts = MissingSymbols.moduleCounts(crashes, Set("IGNORED.dll"))
    val m = counts.collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    m("badmod.dll") shouldBe 3 // c1 (deduped), c2, c3 — not c4
    m("xul.dll") shouldBe 1
    // known_modules, (deleted), and missing_symbols=false all filtered
    m.keySet shouldBe Set("badmod.dll", "xul.dll")
  }

  it should "threshold, drop old firefox builds, and classify" in {
    val report = MissingSymbols.report(crashes,
      knownModules = Set.empty,
      firefoxModules = Set("xul.dll"),
      windowsModules = Set("badmod.dll"),
      oldMajorVersions = Seq("98", "99"), // xul 99.0.1 is expired
      minCrashes = 0)
    val rows = MissingSymbols.finalizeReport(report,
      symbolsNowAvailable = (f, _) => f == "badmod.pdb")
    val byName = rows.map(r => r.filename -> r).toMap
    byName.keySet should not contain "xul.dll" // old firefox module dropped
    byName("badmod.dll").category shouldBe "os"
    // the probe runs on the driver against the collected report
    byName("badmod.dll").symbolsNowAvailable shouldBe true
  }

  // Correlated corpus: sigA crashes carry addon "foo" far above baseline.
  private def sigCrashes = {
    val base = (1 to 40).map(i => ("sigA", "foo", s"mod${i % 2}")) ++
      (1 to 40).map(i => ("sigB", null, s"mod${i % 3}")) ++
      (1 to 20).map(i => ("sigC", if (i % 10 == 0) "foo" else null, "modX"))
    base.toDF("signature", "Addon", "module")
  }

  it should "surface chi-square deviations for top signatures" in {
    val devs = SignatureCorrelations.deviations(
      sigCrashes, Seq("Addon", "module"), topN = 2)
    val sigA = devs.filter($"signature" === "sigA" && $"attr" === "Addon")
      .collect()
    sigA should have length 1
    sigA.head.getAs[String]("value") shouldBe "foo"
    sigA.head.getAs[Long]("count_group") shouldBe 40
    // p_group (1.0) far above p_reference (42/100)
    sigA.head.getAs[Double]("p_group") shouldBe 1.0
    // sigB never carries the addon → no Addon deviation row for it
    devs.filter($"signature" === "sigB" && $"attr" === "Addon")
      .count() shouldBe 0
  }

  it should "collect addon-related signatures" in {
    val (devs, addonSigs) = SignatureCorrelations.run(
      sigCrashes, Seq("Addon", "module"), topN = 2)
    val rows = addonSigs.collect()
    rows.map(_.getString(0)) shouldBe Array("sigA")
    rows.head.getAs[Long]("total") shouldBe 40
    devs.columns should contain allOf ("chi2", "p_group", "p_reference")
  }
}
