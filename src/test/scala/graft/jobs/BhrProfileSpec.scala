package graft.jobs

import graft.SparkSpec
import graft.jobs.bhr.{BhrCollection, ProfileProcessor}
import graft.jobs.bhr.ProfileProcessor.{Config, SampleRow}

/** ProfileProcessor coverage (bhr_collection.py:43-456): pseudo-stack
  * interning, prune-cache "(other)" collapsing, per-date sample
  * tracking, the minimal-sample-table mode, and the bridge from the
  * distributed aggregation.
  */
class BhrProfileSpec extends SparkSpec {

  private def row(stack: Seq[(String, String)], thread: String = "Gecko",
      date: String = "20170101", ms: Double = 100.0, count: Double = 1.0,
      runnable: String = "r1", annotations: Seq[(String, String)] = Seq.empty)
      : SampleRow =
    SampleRow(stack, runnable, thread, date, annotations, "win", ms, count)

  behavior of "ProfileProcessor"

  it should "intern shared stack prefixes once" in {
    val p = new ProfileProcessor(Config(uuid = "u"))
    p.ingest(Seq(
      row(Seq(("main", "xul.pdb"), ("run", "xul.pdb"))),
      row(Seq(("main", "xul.pdb"), ("paint", "xul.pdb")))))
    val prof = p.processIntoProfile()
    prof.threads.length shouldBe 1
    val t = prof.threads.head
    // root + main + run + paint = 4 stack nodes; "main" interned once
    t.stackTable.length shouldBe 4
    t.funcTable.length shouldBe 4 // (root), main, run, paint
    t.libs.length shouldBe 1
    // .pdb suffix stripped in the lib display name, kept in debugName
    t.libs.head.name shouldBe "xul"
    t.libs.head.debugName shouldBe "xul.pdb"
    t.sampleTable.length shouldBe 2
    prof.uuid shouldBe "u"
  }

  it should "accumulate per-date hang totals for identical samples" in {
    val p = new ProfileProcessor(Config(uuid = "u"))
    val s = Seq(("main", "xul.pdb"))
    p.ingest(Seq(
      row(s, ms = 100.0, count = 2.0),
      row(s, ms = 50.0, count = 1.0),
      row(s, date = "20170102", ms = 7.0)))
    val t = p.processIntoProfile().threads.head
    t.sampleTable.length shouldBe 1
    t.dates.map(_.date) shouldBe Seq("20170101", "20170102")
    t.dates(0).sampleHangMs shouldBe Seq(Some(150.0))
    t.dates(0).sampleHangCount shouldBe Seq(Some(3.0))
    t.dates(1).sampleHangMs shouldBe Seq(Some(7.0))
  }

  it should "collapse rare stack suffixes into (other) under the threshold" in {
    val p = new ProfileProcessor(Config(uuid = "u",
      stackAcceptanceThreshold = 0.3))
    val common = Seq(("main", "xul.pdb"), ("hot", "xul.pdb"))
    val rare = Seq(("main", "xul.pdb"), ("cold", "xul.pdb"))
    // hot path carries 90% of the hang ms; cold is 10% (< 30% of parent)
    p.ingest(Seq(row(common, ms = 900.0), row(rare, ms = 100.0)))
    val prof = p.processIntoProfile()
    val t = prof.threads.head
    // cold never becomes a stack node; an "(other)" child appears
    val names = t.funcTable.name.map(t.stringArray)
    names should contain("(other)")
    names should not contain "cold"
    // the rare sample's stack resolves to main → (other)
    val rareStack = p.reconstructStack("Gecko",
      t.sampleTable.stack(t.sampleTable.length - 1))
    rareStack.map(_._1) shouldBe Seq("main", "(other)")
  }

  it should "chain annotations and zero-duration rows are dropped" in {
    val p = new ProfileProcessor(Config(uuid = "u"))
    p.ingest(Seq(
      row(Seq(("main", "xul.pdb")),
        annotations = Seq(("PaintWhileInterruptingJS", "true"), ("k", "v"))),
      row(Seq(("dead", "xul.pdb")), ms = 0.0)))
    val t = p.processIntoProfile().threads.head
    t.annotationsTable.length shouldBe 2
    t.annotationsTable.prefix shouldBe Seq(None, Some(0))
    t.funcTable.name.map(t.stringArray) should not contain "dead"
  }

  it should "skip Gecko_Child samples and drop ms in minimal mode" in {
    val p = new ProfileProcessor(Config(uuid = "u",
      useMinimalSampleTable = true))
    p.ingest(Seq(
      row(Seq(("main", "xul.pdb")), thread = "Gecko_Child"),
      row(Seq(("main", "xul.pdb")), thread = "Gecko")))
    val prof = p.processIntoProfile()
    val child = prof.threads.find(_.name == "Gecko_Child").get
    child.processType shouldBe "tab"
    child.sampleTable.length shouldBe 0
    val gecko = prof.threads.find(_.name == "Gecko").get
    gecko.sampleTable.length shouldBe 1
    gecko.dates.head.sampleHangMs shouldBe Seq.empty
    gecko.dates.head.sampleHangCount shouldBe Seq(Some(1.0))
  }

  it should "merge usage hours across ingests" in {
    val p = new ProfileProcessor(Config(uuid = "u"))
    p.ingest(Seq(row(Seq(("m", "x")))), Map("20170101" -> 10.0))
    p.ingest(Seq(row(Seq(("m", "x")))), Map("20170101" -> 5.0, "20170102" -> 1.0))
    p.processIntoProfile().usageHoursByDate shouldBe
      Map("20170101" -> 15.0, "20170102" -> 1.0)
  }

  it should "bridge the distributed aggregation into sample rows" in {
    import spark.implicits._
    val hangs = Seq(
      BhrCollection.Hang(Seq("xul.pdb\\ABC:0x1f", "pseudo\\null:js::Run"),
        1000.0, "Gecko", "r1", "parent", "20170101", "win",
        annotations = Seq(("PaintWhileInterruptingJS", "true"))),
      BhrCollection.Hang(Seq("xul.pdb\\ABC:0x1f", "pseudo\\null:js::Run"),
        200.0, "Gecko", "r1", "parent", "20170101", "win",
        annotations = Seq(("PaintWhileInterruptingJS", "true")))).toDS()
    val rows = BhrCollection.toSampleRows(BhrCollection.aggregateHangs(hangs))
    rows.length shouldBe 1
    val r = rows.head
    r.hangMs shouldBe 1200.0
    r.hangCount shouldBe 2.0
    // first ':' splits lib from frame; frame may itself contain "::"
    r.stack shouldBe Seq(("0x1f", "xul.pdb\\ABC"), ("js::Run", "pseudo\\null"))
    // annotations survive the distributed aggregation into the bridge
    r.annotations shouldBe Seq(("PaintWhileInterruptingJS", "true"))
    // end-to-end: the bridged rows feed the processor
    val p = new ProfileProcessor(Config(uuid = "u"))
    p.ingest(rows)
    p.processIntoProfile().threads.head.sampleTable.length shouldBe 1
  }
}
