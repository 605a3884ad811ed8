package graft

import org.apache.spark.sql.functions._

/** Throwaway measurement harness for optimization experiments (not a
  * gate; deleted or repurposed freely between rounds).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = graft.core.Graft.localSession(32, "graft-scratch")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[scratch] $tag%-46s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
    import graft.dedup.NearDup
    for (i <- 1 to 3) {
      time(s"shingleSets only #$i") {
        noop(NearDup.shingleSets(docs, "doc_id", "text", 3))
      }
      time(s"minhash signatures #$i") {
        noop(NearDup.minhashSignatures(docs, "doc_id", "text", 3, 8))
      }
      time(s"simhash signatures #$i") {
        noop(NearDup.simhash(docs, "doc_id", "text", 3))
      }
      time(s"simhash full pairs #$i") {
        noop(NearDup.simhashNearDuplicates(docs, "doc_id", "text", 3))
      }
    }
    spark.stop()
  }
}
