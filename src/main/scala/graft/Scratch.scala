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
    import graft.text.NbClassifier
    def joinPath(): Unit =
      noop(NbClassifier.trainScore(docs, "doc_id", "lang", "text", 1024))
    def compiledPath(): Unit = {
      val m = NbClassifier.train(docs, "lang", "text", 1024)
      val c = NbClassifier.compile(m, 1024)
      noop(NbClassifier.scoreCompiled(docs, "doc_id", "text", c))
    }
    for (i <- 1 to 3) {
      time(s"nb join-scored #$i") { joinPath() }
      time(s"nb compiled-scored #$i") { compiledPath() }
    }
    spark.stop()
  }
}
