package graft.pipeline

import graft.SparkSpec
import graft.multimodal.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

class MultimodalSpec extends SparkSpec {

  private def assets(rows: (Long, Array[Byte], String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, b, t) =>
        Row(id, b, t, null)
      }, 2),
      Multimodal.mediaSchema)

  private val png = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
  private val wav = Array.tabulate[Byte](5000)(i => ((i * 7) % 251).toByte)

  it should "decode metadata deterministically over binary columns" in {
    val out = Multimodal.decodeMeta(assets(
      (1L, png, "image/png"), (2L, wav, "audio/wav"), (3L, null, "image/png")))
    out.count() shouldBe 3
    val r1 = out.filter(col("asset_id") === 1).collect().head
    r1.getAs[Long]("n_bytes") shouldBe 1000L
    r1.getAs[Int]("width") should be >= 16
    // null media → zero dims, not a crash
    val r3 = out.filter(col("asset_id") === 3).collect().head
    r3.getAs[Int]("width") shouldBe 0
    r3.getAs[Long]("n_bytes") shouldBe 0L
    // determinism across runs
    val again = Multimodal.decodeMeta(assets((1L, png, "image/png")))
      .collect().head
    again.getAs[Int]("width") shouldBe r1.getAs[Int]("width")
  }

  it should "extract normalized byte-histogram features in batches" in {
    val out = Multimodal.extractFeatures(assets((1L, png, "image/png")))
    val feats = out.collect().head.getSeq[Float](1)
    feats.length shouldBe 16
    feats.sum shouldBe 1.0f +- 1e-4f
  }

  it should "compute resize boxes bounded by the target" in {
    val out = Multimodal.resize(assets((1L, png, "image/png"),
      (2L, wav, "audio/wav")), maxW = 32, maxH = 32)
    out.collect().foreach { r =>
      r.getAs[Int]("out_width") should be <= 32
      r.getAs[Int]("out_height") should be <= 32
    }
  }

  it should "explode sampled frame indices" in {
    val out = Multimodal.sampleFrames(assets((1L, wav, "video/mp4")),
      everyN = 2)
    val idx = out.collect().map(_.getAs[Int]("frame_idx")).toSeq
    idx shouldBe idx.sorted
    idx.foreach(_ % 2 shouldBe 0)
  }
}
