package graft

/** Throwaway measurement harness for optimization experiments (not a
  * gate; deleted or repurposed freely between rounds).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = graft.core.Graft.localSession(32, "graft-scratch")
    def cal(): Double = {
      val t0 = System.nanoTime()
      spark.range(1L << 24).selectExpr("sum(xxhash64(id) % 1024)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    def cal3(tag: String): Unit =
      println(f"[scratch] cal $tag%-12s ${cal()}%.3f ${cal()}%.3f ${cal()}%.3f")
    val gates = SparkEntry.gateQueries
      .filterNot(q => Bench.NonHeadline.contains(q.name))
      .filterNot(q => Bench.isStreaming(q.name))
    cal3("fresh")
    gates.slice(0, 40).foreach { q =>
      try q.fn(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(_) => () }
      spark.catalog.clearCache()
    }
    cal3("after40")
    gates.slice(40, 80).foreach { q =>
      try q.fn(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(_) => () }
      spark.catalog.clearCache()
    }
    cal3("after80")
    gates.slice(80, 120).foreach { q =>
      try q.fn(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(_) => () }
      spark.catalog.clearCache()
    }
    cal3("after120")
    spark.stop()
  }
}
