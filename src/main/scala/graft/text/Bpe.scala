package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Byte-pair frequency mining — the first step of BPE tokenizer
  * induction (Sennrich et al. 2016, arXiv:1508.07909): count adjacent
  * symbol pairs inside words across the corpus; the most frequent pair
  * is the next merge. Full BPE training iterates merge-and-recount —
  * inherently sequential — but the PAIR TABLE is the distributed
  * heavy lift (one pass over every character of the corpus), and its
  * top ranks are what tokenizer-vocabulary audits (X100 coverage, t03
  * token counting) consume: "which merges WOULD this corpus learn
  * first", per corpus, per source, per snapshot.
  *
  * Word-internal pairs only (the standard word-boundary convention):
  * tokens lowercase-split first, then each length-≥2 token contributes
  * its adjacent character pairs. The top-k cut is pinned deterministic
  * by (count DESC, pair ASC) — the X100 boundary-tie convention.
  *
  * Scale: one tokenize + character-pair Generate pass (map-side), one
  * grouped count (map-side combined — the shuffle carries (pair,
  * count) cells, bounded by the character-bigram alphabet, not the
  * corpus), one WindowGroupLimit-style top-k over the tiny pair table.
  */
object Bpe {

  /** Top-k adjacent character pairs: (rank, pair, cnt), rank 1 = the
    * pair BPE would merge first. Pairs below `minCount` are dropped
    * before ranking.
    */
  def topPairs(df: DataFrame, textCol: String, k: Int,
      minCount: Long = 1L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = df
      .select(explode(tokens(lower(col(textCol)))).as("tok"))
      .filter(length(col("tok")) >= 2)
    val pairs = toks
      .select(explode(expr(
        "transform(sequence(1, length(tok) - 1), " +
          "i -> substring(tok, i, 2))")).as("pair"))
    val counts = pairs.groupBy("pair")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    counts
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("pair").asc)).cast("long"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("pair"), col("cnt"))
  }

  /** Budgeted BPE merge LOOP — the actual tokenizer-induction operator
    * (topPairs mines only round 1): `merges` rounds of count adjacent
    * symbol pairs → pick the winner (cnt DESC, "a b" ASC — the X100
    * boundary-tie convention on the space-joined pair, identical in any
    * engine because symbols are whitespace-free) → apply the merge to
    * every token. Returns the merge table (round, sym_a, sym_b, cnt),
    * fewer rows if the corpus runs out of pairs.
    *
    * The corpus rides between rounds as ONE space-joined symbol string
    * per token (lossless: symbols never contain whitespace). Each round
    * is one pair-explode + grouped count (map-side combined — the
    * shuffle carries (pair, count) cells bounded by the live pair
    * vocabulary, not the corpus) and a 1-row winner hop to the driver
    * (the k-means model-bounded convention). The merge applies as an
    * aggregate() fold — codegen'd, no UDF: on (last symbol = a, next =
    * b) append b WITHOUT a separator, which reproduces BPE's greedy
    * left-to-right non-overlapping pass because a freshly merged symbol
    * a||b can never equal a again; the boundary check is exact (either
    * the accumulator IS a, or it ends with ' '||a — symbols cannot
    * contain the space). Round state is persisted and rolled forward
    * with the PageRank cache lifecycle.
    */
  def mergeLoop(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    val spark = df.sparkSession
    import org.apache.spark.storage.StorageLevel
    val results =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var cur = df
      .select(explode(tokens(lower(col(textCol)))).as("tok"))
      .filter(length(col("tok")) >= 2)
      .select(expr("array_join(split(tok, ''), ' ')").as("sym"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // The winner collect consumes ALL of `cur`, so it doubles as the
    // round's materialization point — no extra eager count pass per round;
    // the previous round's cache is released only after the collect has
    // filled the current one.
    var prev: Option[org.apache.spark.sql.DataFrame] = None
    var done = false
    for (r <- 1 to merges if !done) {
      val top = cur.select(split(col("sym"), " ").as("a"))
        .filter(size(col("a")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(a) - 1), " +
            "i -> struct(element_at(a, i) AS sa, " +
            "element_at(a, i + 1) AS sb))")).as("p"))
        .groupBy(col("p.sa").as("sa"), col("p.sb").as("sb"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc,
          concat_ws(" ", col("sa"), col("sb")).asc)
        .limit(1).collect()
      prev.foreach(_.unpersist(false))
      prev = None
      if (top.isEmpty) done = true
      else {
        val (a, b, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        results += ((r.toLong, a, b, cnt))
        // Fold only the tokens that CONTAIN the winning pair as adjacent
        // symbols — space-padding makes the containment test exact on
        // symbol boundaries, and it is precisely the fold's merge
        // condition, so untouched tokens pass through by identity
        // (most of the corpus, increasingly so in later rounds).
        val hasPair =
          concat(lit(" "), col("sym"), lit(" ")).contains(s" $a $b ")
        val next = cur.select(
            when(hasPair, aggregate(split(col("sym"), " "), lit(""),
              (acc, s) =>
                when(s === lit(b) &&
                    (acc === lit(a) || acc.endsWith(lit(" " + a))),
                  concat(acc, s))
                  .when(acc === lit(""), s)
                  .otherwise(concat(acc, lit(" "), s))))
              .otherwise(col("sym"))
              .as("sym"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        prev = Some(cur)
        cur = next
      }
    }
    prev.foreach(_.unpersist(false))
    cur.unpersist(false)
    import spark.implicits._
    results.toSeq.toDF("round", "sym_a", "sym_b", "cnt").orderBy("round")
  }
}
