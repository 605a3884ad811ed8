package graft.cli

import org.apache.spark.sql.SparkSession
import graft.jobs._

/** Single CLI entry point dispatching the job family — the engine's
  * equivalent of the reference's `mozetl <command>` click group
  * (mozetl/cli.py:23-50). Local paths stand in for the reference's
  * s3 bucket/prefix pairs; each command is
  *
  *   sbt "runMain graft.cli.Main <command> key=value ..."
  *
  * Commands: clients_daily, experiments_daily, search_aggregates,
  * search_clients_daily, addon_aggregates, sync_bookmark_validation,
  * landfill_sampler, taar_lite, taar_lite_guidranking, taar_locale.
  */
object Main {

  private def opts(args: Array[String]): Map[String, String] =
    args.drop(1).flatMap { a =>
      a.split("=", 2) match {
        case Array(k, v) => Some(k.stripPrefix("--") -> v)
        case _ => None
      }
    }.toMap

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.cli.Main <command> key=value ...")
    val command = args(0)
    val o = opts(args)
    def required(k: String): String =
      o.getOrElse(k, sys.error(s"$command requires --$k=<value>"))

    val spark = graft.core.Graft.localSession(
      o.getOrElse("cores", "4").toInt, appName = s"graft-$command")
    graft.core.GraftExtensions.register(spark)
    try run(spark, command, o, required)
    finally spark.stop()
  }

  private def run(spark: SparkSession, command: String,
      o: Map[String, String], required: String => String): Unit = {
    def input = spark.read.parquet(required("input"))
    def write(df: org.apache.spark.sql.DataFrame, path: String,
        coalesceTo: Int = 0): Unit = {
      val out = if (coalesceTo > 0) df.coalesce(coalesceTo) else df
      out.write.mode(o.getOrElse("save-mode", "overwrite")).parquet(path)
      println(s"[graft] $command wrote $path")
    }

    command match {
      case "clients_daily" =>
        val (windowed, startDate) =
          clientsdaily.Rollup.extractSubmissionWindowForActivityDay(
            input, required("date"), o.getOrElse("lag-days", "10").toInt)
        val sampled = o.get("sample-id") match {
          case Some(sid) => windowed.where(s"sample_id = '$sid'")
          case None => windowed
        }
        val results = clientsdaily.Rollup.toProfileDayAggregates(
          clientsdaily.Rollup.extractSearchCounts(sampled))
        write(results,
          s"${required("output")}/activity_date_s3=$startDate",
          clientsdaily.Rollup.partitionCountForWriting(
            o.contains("sample-id")))

      case "experiments_daily" =>
        val (windowed, startDate) =
          clientsdaily.Rollup.extractSubmissionWindowForActivityDay(
            experiments.ExperimentsDaily.loadFilter(input),
            required("date"), o.getOrElse("lag-days", "10").toInt)
        write(experiments.ExperimentsDaily.toExperimentProfileDayAggregates(
          clientsdaily.Rollup.extractSearchCounts(windowed)),
          s"${required("output")}/activity_date_s3=$startDate")

      case "search_aggregates" =>
        search.Rollups.searchAggregatesEtl(spark, required("date"),
          required("input"), required("output"),
          o.getOrElse("save-mode", search.Rollups.DefaultSaveMode))

      case "search_clients_daily" =>
        search.Rollups.searchClientsDailyEtl(spark, required("date"),
          required("input"), required("output"),
          o.getOrElse("save-mode", search.Rollups.DefaultSaveMode))

      case "addon_aggregates" =>
        val day = input.where(s"submission_date_s3 = '${required("date")}'")
        write(addons.AddonAggregates.run(day),
          s"${required("output")}/submission_date_s3=${required("date")}")

      case "sync_bookmark_validation" =>
        input.where(s"submission_date_s3 = '${required("date")}'")
          .createOrReplaceTempView("sync_summary")
        val (problems, aggs) = sync.BookmarkValidation.transform(spark)
        write(problems, s"${required("output")}/bmk_validation_problems", 1)
        write(aggs, s"${required("output")}/bmk_total_per_day", 1)

      case "landfill_sampler" =>
        landfill.Sampler.transform(input,
          o.getOrElse("n-documents", "1000").toInt)
          .write.mode(o.getOrElse("save-mode", "overwrite"))
          .partitionBy("namespace", "doc_type", "doc_version")
          .json(required("output"))
        println(s"[graft] landfill_sampler wrote ${required("output")}")

      case "taar_lite" =>
        input.createOrReplaceTempView("clients_daily")
        val wl = required("whitelist").split(",").toSeq
        write(taar.LiteGuidGuid.transform(
          taar.LiteGuidGuid.extractTelemetry(spark, wl)),
          required("output"))

      case "taar_lite_guidranking" =>
        input.createOrReplaceTempView("clients_daily")
        write(taar.LiteGuidRanking.extractTelemetry(spark), required("output"))

      case "taar_locale" =>
        input.createOrReplaceTempView("clients_daily")
        val wl = required("whitelist").split(",").toSeq
        val dict = taar.Locale.generateDictionary(spark, wl,
          required("start-date"), o.getOrElse("num-addons", "10").toInt,
          seed = o.getOrElse("seed", "42").toLong)
        val json = dict.map { case (loc, addons) =>
          s""""$loc": [${addons.map { case (a, w) => s"""["$a", $w]""" }
            .mkString(", ")}]"""
        }.mkString("{", ", ", "}")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(required("output")), json)
        println(s"[graft] taar_locale wrote ${required("output")}")

      case other =>
        sys.error(s"unknown command: $other (see Main scaladoc)")
    }
  }
}
