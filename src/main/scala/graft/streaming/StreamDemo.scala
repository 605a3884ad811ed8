package graft.streaming

import org.apache.spark.sql.functions._

/** Executable streaming example: runs the event-time windowed aggregation
  * as a real streaming query over a bounded file source built from the
  * driver testdata (events re-written as json then streamed), and shows
  * the same transform applied to the batch frame — one definition, both
  * execution modes.
  *
  * Run: sbt "runMain graft.streaming.StreamDemo [sfDir]"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.Graft.localSession(8, "graft-stream-demo")

    val batch = graft.queries.GateQuery.table(spark, sfDir, "events")

    // batch execution of the streaming transform
    val batchOut = EventStreams.windowedEventCounts(batch, "1 day", "1 hour")
    println(s"[stream-demo] batch windows rows=${batchOut.count()}")

    // real streaming execution over a file source
    val stage = java.nio.file.Files.createTempDirectory("graft-stream").toString
    batch.write.mode("overwrite").json(stage)
    val stream = spark.readStream.schema(batch.schema).json(stage)
    val q = EventStreams.windowedEventCounts(stream, "1 day", "1 hour")
      .writeStream.format("memory").queryName("stream_windows")
      .outputMode("complete").start()
    q.processAllAvailable()
    val streamed = spark.table("stream_windows")
    println(s"[stream-demo] stream windows rows=${streamed.count()}")

    // the two modes must agree
    val b = batchOut.select("window_start", "event_type", "cnt")
      .collect().map(_.toSeq).toSet
    val s = streamed.select("window_start", "event_type", "cnt")
      .collect().map(_.toSeq).toSet
    println(s"[stream-demo] batch==stream: ${b == s}")
    q.stop()
    spark.stop()
  }
}
