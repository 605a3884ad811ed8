package graft.pipeline

import graft.SparkSpec
import graft.text.ChunkDedup
import org.apache.spark.sql.catalyst.expressions.LambdaFunction

/** Guard against the indexing-HOF re-evaluation trap
  * (TextFunctions.scala:40-45): if CollapseProject ever re-inlines the
  * tokenization into a slice/element_at lambda, the split expression
  * lands INSIDE a LambdaFunction and re-runs per element — O(len²) per
  * document. These asserts pin the optimized plans of the two operators
  * that slice a materialized token array inside transform()
  * (ChunkDedup.dedupChunks, QualityRules.dupNgramCoverage): tokenization
  * must stay in its own projection, never inside a lambda body. The check
  * runs over a PARQUET source on purpose — over a LocalRelation the
  * optimizer constant-folds the whole stage and the plan shows nothing.
  */
class TokenMaterializationSpec extends SparkSpec {
  import spark.implicits._

  private def splitInsideLambda(
      df: org.apache.spark.sql.DataFrame): Int = {
    var n = 0
    df.queryExecution.optimizedPlan.foreach { p =>
      p.expressions.foreach { root =>
        root.foreach {
          case lf: LambdaFunction =>
            n += lf.function.collect {
              case e if e.prettyName == "split" => e }.size
          case _ =>
        }
      }
    }
    n
  }

  behavior of "token materialization"

  it should "never tokenize inside a chunk/gram lambda (O(len^2) trap)" in {
    val words = (0 until 4000).map(i => s"w${i % 613}").mkString(" ")
    val dir = s"${sys.props("java.io.tmpdir")}/scratch_longdocs"
    (1L to 50L).map(i => (i, words + s" unique$i")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)

    val chunked = ChunkDedup.dedupChunks(docs, "doc_id", "text", 50)
    splitInsideLambda(chunked) shouldBe 0
    chunked.count() should be > 0L // and it actually runs on long docs

    val grams = graft.text.QualityRules.dupNgramCoverage(docs, "doc_id", "text")
    splitInsideLambda(grams) shouldBe 0
    grams.count() should be > 0L

    val spans = graft.text.SpanDedup.dedupSpans(docs, "doc_id", "text", 50)
    splitInsideLambda(spans) shouldBe 0
    spans.count() should be > 0L
  }
}
