package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  it should "join bucketed tables without any shuffle exchange" in {
    val facts = (1L to 1000L).map(i => (i % 100, i, i * 2.0))
      .toDF("key", "id", "amount")
    val dims = (0L until 100L).map(i => (i, s"dim-$i")).toDF("key", "name")

    Bucketing.writeBucketed(facts, "graft_test_facts", "key", 8)
    Bucketing.writeBucketed(dims, "graft_test_dims", "key", 8)

    val joined = spark.table("graft_test_facts")
      .join(spark.table("graft_test_dims"), "key")
      .groupBy("key").agg(sum("amount").as("total"))
    // disable broadcast so the join strategy itself is under test
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val again = spark.table("graft_test_facts")
        .join(spark.table("graft_test_dims"), "key")
        .groupBy("key").agg(sum("amount").as("total"))
      again.count() shouldBe 100
      // positive control: the SAME join over unbucketed frames must
      // shuffle — proves hasShuffle sees through the AQE wrapper rather
      // than passing vacuously on AdaptiveSparkPlanExec.
      val unbucketed = facts.join(dims, "key")
        .groupBy("key").agg(sum("amount").as("total"))
      Bucketing.hasShuffle(unbucketed) shouldBe true
      // both sides bucketed on the join key → no Exchange anywhere:
      // the join AND the groupBy reuse the bucket partitioning
      Bucketing.hasShuffle(again) shouldBe false
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_test_facts")
      spark.sql("DROP TABLE IF EXISTS graft_test_dims")
    }
  }
}
