package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev tool: per-stage wall/CPU profile of named gate queries — the
  * guide-§1 empirical loop without a Spark UI. For each gate: one
  * untimed warmup, then one timed run with a listener recording every
  * stage's duration, task count, shuffle bytes and peak task time, so
  * the stage that owns the gate's wall time is identifiable from the
  * console.
  *
  *   runMain graft.GateProfile <gates,comma,separated> [sfDir] [cpus]
  */
object GateProfile {

  private case class StageRec(id: Int, name: String, tasks: Int,
      wallMs: Long, execRunMs: Long, shufReadMb: Double,
      shufWriteMb: Double, inputMb: Double)

  private class Rec extends SparkListener {
    val stages = mutable.ArrayBuffer.empty[StageRec]
    val jobs = mutable.ArrayBuffer.empty[(Int, Long)]
    private val jobStart = mutable.Map.empty[Int, Long]
    override def onJobStart(j: SparkListenerJobStart): Unit =
      jobStart(j.jobId) = j.time
    override def onJobEnd(j: SparkListenerJobEnd): Unit =
      jobs += ((j.jobId, j.time - jobStart.getOrElse(j.jobId, j.time)))
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val i = s.stageInfo
      val m = i.taskMetrics
      val wall = (for {a <- i.completionTime; b <- i.submissionTime}
        yield a - b).getOrElse(-1L)
      stages += StageRec(i.stageId,
        i.name.linesIterator.take(1).mkString.take(90), i.numTasks, wall,
        if (m == null) 0L else m.executorRunTime,
        if (m == null) 0 else m.shuffleReadMetrics.totalBytesRead / 1048576.0,
        if (m == null) 0 else m.shuffleWriteMetrics.bytesWritten / 1048576.0,
        if (m == null) 0 else m.inputMetrics.bytesRead / 1048576.0)
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GateProfile <gates> [sfDir] [cpus]")
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val spark = graft.core.Graft.localSession(cpus, "graft-profile")
    spark.range(1000).selectExpr("sum(id)").collect()
    val byName = SparkEntry.gateQueries.map(q => q.name -> q).toMap
    names.foreach { n =>
      val q = byName.getOrElse(n, sys.error(s"unknown gate: $n"))
      // warmup (JIT, codegen cache, parquet footers)
      q.fn(spark, sfDir).count()
      spark.catalog.clearCache()
      val rec = new Rec
      spark.sparkContext.addSparkListener(rec)
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBusAccess.waitUntilEmpty(
        spark.sparkContext)
      spark.sparkContext.removeSparkListener(rec)
      spark.catalog.clearCache()
      println(f"\n===== $n%s wall=$wall%.3f s  jobs=${rec.jobs.size}%d " +
        f"stages=${rec.stages.size}%d =====")
      println(f"${"stage"}%6s ${"wall"}%7s ${"cpu"}%7s ${"tasks"}%5s " +
        f"${"shR"}%7s ${"shW"}%7s ${"in"}%7s  name")
      rec.stages.sortBy(-_.wallMs).foreach { s =>
        println(f"${s.id}%6d ${s.wallMs / 1000.0}%7.3f " +
          f"${s.execRunMs / 1000.0}%7.3f ${s.tasks}%5d " +
          f"${s.shufReadMb}%7.2f ${s.shufWriteMb}%7.2f ${s.inputMb}%7.2f" +
          f"  ${s.name}%s")
      }
      val stageSum = rec.stages.map(_.wallMs).sum / 1000.0
      println(f"stage wall sum=$stageSum%.3f s (gaps = driver/plan time: " +
        f"${wall - stageSum}%.3f s)")
    }
    spark.stop()
  }
}
