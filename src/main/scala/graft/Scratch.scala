package graft

import org.apache.spark.sql.functions._

/** Throwaway measurement harness for optimization experiments (not a
  * gate; deleted or repurposed freely between rounds).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = graft.core.Graft.localSession(32, "graft-scratch")
    import org.apache.spark.storage.StorageLevel
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val li = graft.core.Graft.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey")
    val ord = graft.core.Graft.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey")
    val e0 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("src"), col("l_partkey").as("dst"))
    time("join+distinct noop (uncached)") { noop(e0.distinct()) }
    time("join+distinct noop again") { noop(e0.distinct()) }
    val e = e0.distinct().persist(StorageLevel.MEMORY_AND_DISK)
    time("fill cache (count)") { e.count() }
    time("cached scan count") { e.count() }
    time("cached scan noop") { noop(e) }
    time("explode+agg from cache") {
      noop(e.select(explode(array(
        struct(col("src").as("node"), lit(1L).as("c")),
        struct(col("dst").as("node"), lit(0L).as("c")))).as("x"))
        .select(col("x.node").as("node"), col("x.c").as("c"))
        .groupBy("node").agg(sum("c").as("outdeg")))
    }
    time("explode+agg from cache rep2") {
      noop(e.select(explode(array(
        struct(col("src").as("node"), lit(1L).as("c")),
        struct(col("dst").as("node"), lit(0L).as("c")))).as("x"))
        .select(col("x.node").as("node"), col("x.c").as("c"))
        .groupBy("node").agg(sum("c").as("outdeg")))
    }
    time("union-style node degree (2 scans)") {
      noop(e.select(col("src").as("node")).union(
        e.select(col("dst").as("node")))
        .groupBy("node").agg(count(lit(1))))
    }
    val ranks = e.select(col("src").as("node")).distinct()
      .withColumn("r", lit(1000000L)).persist(StorageLevel.MEMORY_AND_DISK)
    ranks.count()
    time("join bcast ranks + agg (q48 shape)") {
      noop(e.join(broadcast(ranks), e("src") === ranks("node"))
        .select(col("dst").as("node"), col("r").as("contrib"))
        .groupBy("node").agg(sum("contrib").as("inflow")))
    }
    time("join bcast ranks + agg rep2") {
      noop(e.join(broadcast(ranks), e("src") === ranks("node"))
        .select(col("dst").as("node"), col("r").as("contrib"))
        .groupBy("node").agg(sum("contrib").as("inflow")))
    }
    // same but from a NON-cached recompute
    time("join bcast + agg from uncached e") {
      noop(e0.distinct().join(broadcast(ranks), col("src") === ranks("node"))
        .select(col("dst").as("node"), col("r").as("contrib"))
        .groupBy("node").agg(sum("contrib").as("inflow")))
    }
    spark.stop()
  }
}
