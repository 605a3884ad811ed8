package graft

/** Dev tool: dump `.explain("formatted")` for named gate queries into
  * per-gate files — the round's plan-evidence artifacts
  * (plans/<round>/<gate>_<suffix>.txt). Usage:
  *
  *   runMain graft.PlanDump <outDir> <suffix> <gate1,gate2,...> [sfDir]
  *
  * Unlike PlanAudit (stdout, fixed list), this writes one file per gate
  * so before/after plan diffs are reviewable per change.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PlanDump <outDir> <suffix> <gates,comma,separated> [sfDir]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    java.nio.file.Files.createDirectories(outDir)
    val spark = graft.core.Graft.localSession(8, "graft-plandump")
    val missing = names -- SparkEntry.gateQueries.map(_.name).toSet
    require(missing.isEmpty, s"unknown gates: ${missing.mkString(",")}")
    SparkEntry.gateQueries.filter(q => names.contains(q.name)).foreach { q =>
      val plan =
        try q.fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case scala.util.control.NonFatal(e) =>
          s"PLAN FAILED: ${e.getClass.getName}: ${e.getMessage}"
        }
      java.nio.file.Files.write(
        outDir.resolve(s"${q.name}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote ${q.name}_$suffix.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
