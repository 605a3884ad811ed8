package graft.jobs

import graft.SparkSpec
import graft.jobs.search.Rollups
import MainSummaryFixture._

class RollupsSpec extends SparkSpec {

  it should "read a date partition, transform, and write versioned output" in {
    val tmp = java.nio.file.Files.createTempDirectory("graft-rollup").toString
    val inBase = s"$tmp/main_summary"
    val outBase = s"$tmp/search"
    makeDF(schema, base, Seq(Map("document_id" -> "d1")))
      .write.parquet(s"$inBase/submission_date_s3=20170101")

    val out = Rollups.searchClientsDailyEtl(spark, "20170101", inBase, outBase)
    out shouldBe s"$outBase/v7/submission_date_s3=20170101"
    spark.read.parquet(out).count() shouldBe 1
    // default save mode is error-if-exists (idempotency guard)
    an[Exception] should be thrownBy
      Rollups.searchClientsDailyEtl(spark, "20170101", inBase, outBase)
    // explicit overwrite succeeds
    Rollups.searchClientsDailyEtl(spark, "20170101", inBase, outBase,
      saveMode = "overwrite")
    spark.read.parquet(out).count() shouldBe 1
  }
}
