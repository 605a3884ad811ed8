package graft

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback

/** Dev tool (the r16 systematic form of the r14/r15 find-and-compile
  * pattern): walk every batch gate's optimized plan and report the
  * Catalyst expressions that implement `CodegenFallback` — the
  * interpreted-eval nodes that break whole-stage codegen spans. The
  * hier-rank, PQ-kernel, shingling, int8, and k-means compilations each
  * started as exactly one such site found by hand; this main makes the
  * sweep repeatable so surviving fallback sites are a reviewed LIST
  * (with compile/don't-compile verdicts in PLANS.md), not anecdotes.
  *
  * Occurrence counts are per plan-tree node — a fallback inside a
  * per-row map stage matters; one inside a model-sized literal fold
  * (executed once on the driver) usually doesn't. The verdicts, not the
  * counts, carry that judgment.
  */
object FallbackAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.Graft.localSession(8, "graft-fallback-audit")
    spark.sparkContext.setLogLevel("ERROR")
    val batch = SparkEntry.gateQueries.filterNot(_.name.contains("_stream"))
    val rows = batch.flatMap { q =>
      try {
        val df = q.fn(spark, sfDir)
        val hits = scala.collection.mutable.LinkedHashMap[String, Int]()
        df.queryExecution.optimizedPlan.foreach { node =>
          node.expressions.foreach(_.foreach {
            case e: CodegenFallback =>
              val key = e.getClass.getSimpleName
              hits(key) = hits.getOrElse(key, 0) + 1
            case _ =>
          })
        }
        if (hits.nonEmpty) Some(q.name -> hits.toSeq) else None
      } catch {
        case scala.util.control.NonFatal(e) =>
          Some(q.name -> Seq(s"ERROR:${e.getClass.getSimpleName}" -> 1))
      } finally {
        // q.fn is not side-effect free for every gate (t59/t60 run their
        // EM training loop at DataFrame-construction time and persist
        // frames); clear per gate — the bench harness's discipline — so
        // the sweep doesn't accumulate cache across ~200 gates.
        spark.catalog.clearCache()
      }
    }
    rows.foreach { case (name, hs) =>
      println(s"$name: " +
        hs.map { case (k, c) => s"$k x$c" }.mkString(", "))
    }
    println(s"-- ${rows.size} of ${batch.size} batch gates carry " +
      "CodegenFallback expressions")
    spark.stop()
  }
}
