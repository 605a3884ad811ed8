package graft.operators

import graft.SparkSpec

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  it should "fold the recurrence in series order regardless of row order" in {
    // rows deliberately shuffled: the sort inside the fold pins the order
    val df = Seq(("k", 3L, 30.0), ("k", 1L, 10.0), ("k", 2L, 20.0))
      .toDF("k", "o", "v")
    val got = Ewma.latest(df, "k", "o", "v", alpha = 0.5)
      .as[(String, Long, Double)].collect().head
    got._2 shouldBe 3L
    // s1=10, s2=.5*20+.5*10=15, s3=.5*30+.5*15=22.5
    got._3 shouldBe 22.5
  }

  it should "return the single value for a one-point series" in {
    val df = Seq(("k", 1L, 42.0)).toDF("k", "o", "v")
    Ewma.latest(df, "k", "o", "v", alpha = 0.3)
      .as[(String, Long, Double)].collect().head._3 shouldBe 42.0
  }

  it should "skip null observations instead of poisoning the fold" in {
    val df = Seq(("k", 1L, Some(10.0)), ("k", 2L, None), ("k", 3L, Some(20.0)))
      .toDF("k", "o", "v")
    val got = Ewma.latest(df, "k", "o", "v", alpha = 0.5)
      .as[(String, Long, Double)].collect().head
    got._2 shouldBe 2L // two folded points
    got._3 shouldBe 15.0
  }

  it should "reject out-of-range alpha" in {
    val df = Seq(("k", 1L, 1.0)).toDF("k", "o", "v")
    an[IllegalArgumentException] should be thrownBy
      Ewma.latest(df, "k", "o", "v", alpha = 0.0)
  }

  "latestChunked" should "be BIT-identical to latest across chunk sizes" in {
    // deterministic pseudo-random series over several keys, lengths chosen
    // to hit exact-multiple, remainder, and sub-chunk cases
    val rows = for {
      (k, len) <- Seq(("a", 13), ("b", 6), ("c", 1), ("d", 12))
      i <- 1 to len
    } yield (k, i.toLong, ((i * 2654435761L + k.hashCode) % 1000) / 7.0)
    val df = rows.toDF("k", "o", "v").repartition(7)
    val direct = Ewma.latest(df, "k", "o", "v", alpha = 0.3)
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    for (cs <- Seq(2, 3, 6, 100)) {
      val chunked = Ewma.latestChunked(df, "k", "o", "v",
        alpha = 0.3, chunkSize = cs)
        .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
      withClue(s"chunkSize=$cs: ") { chunked shouldBe direct }
    }
  }

  it should "skip nulls and handle empty input like latest" in {
    val df = Seq(("k", 1L, Some(10.0)), ("k", 2L, None), ("k", 3L, Some(20.0)))
      .toDF("k", "o", "v")
    val got = Ewma.latestChunked(df, "k", "o", "v", alpha = 0.5, chunkSize = 2)
      .as[(String, Long, Double)].collect().head
    got._2 shouldBe 2L
    got._3 shouldBe 15.0
    val empty = Seq.empty[(String, Long, Double)].toDF("k", "o", "v")
    Ewma.latestChunked(empty, "k", "o", "v", alpha = 0.5).count() shouldBe 0L
  }
}
