package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Line-level deduplication — the C4/Dolma curation steps that operate
  * BELOW document granularity: crawled pages repeat their own lines
  * (cookie banners rendered twice) and repeat each other's lines (nav
  * bars, footers) without the documents ever being near-duplicates, so
  * document-level dedup (`dedup/NearDup`) never sees them. C4 drops
  * lines repeated across the corpus; Dolma dedups paragraphs keep-first.
  * The span family (`ChunkDedup`/`SpanDedup`) slices by token windows;
  * this one slices by the newline structure the author gave the text.
  *
  * Scale, per operator:
  *  - `dedupLinesWithinDoc` is MAP-ONLY: the line array, the keep-first
  *    filter, and the re-join are projections — zero exchanges,
  *    embarrassingly parallel. The keep-first scan is O(lines²) per doc
  *    (array_position per line) — bounded, because lines-per-doc is a
  *    page property, not a corpus property.
  *  - `dropBoilerplateLines` never shuffles document text for COUNTING:
  *    lines hash map-side (the engine-portable PolyHash, so an oracle
  *    replays identical arithmetic, collisions included), the
  *    distinct-doc count shuffles 16-byte (hash, doc) pairs, and the
  *    heavy set — small by nature, it is the boilerplate — broadcasts
  *    back as a LEFT ANTI. The one full-text exchange is the
  *    reassembly groupBy, inherent to any rewrite that reorders
  *    surviving lines back into documents.
  */
object LineDedup {

  /** Keep the FIRST occurrence of every distinct line within each
    * document (Dolma-style paragraph dedup, newline-delimited).
    * Output: (idCol, text — surviving lines joined by \n, n_lines,
    * n_kept). Line identity is exact (empty lines included: a run of
    * blanks collapses to one).
    */
  def dedupLinesWithinDoc(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // materialize the array once: HOFs get no CSE, and an inline
    // split() would re-split the document once per line (the
    // shingleSets trap, NearDup.scala:33-38)
    val lines = col("__lines")
    val kept = filter(lines, (l, i) => array_position(lines, l) === i + 1)
    df.select(col(idCol), split(col(textCol), "\n").as("__lines"))
      .select(
        col(idCol),
        concat_ws("\n", kept).as("text"),
        size(lines).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept"))
  }

  /** Drop every line that appears in at least `minDocs` DISTINCT
    * documents (C4's boilerplate rule). Blank lines (whitespace-only)
    * never participate — they are structure, not content. Documents
    * whose every line was boilerplate disappear from the output.
    * Output: (idCol, text — surviving lines joined by \n, in original
    * order).
    */
  def dropBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int): DataFrame = {
    require(minDocs >= 2, "minDocs must be >= 2")
    val exploded = df
      .select(col(idCol), posexplode(split(col(textCol), "\n"))
        .as(Seq("pos", "line")))
      .withColumn("h", TextFunctions.polyHash(col("line")))
    val heavy = exploded
      .filter(trim(col("line")) =!= "")
      .select(col("h"), col(idCol))
      .distinct()
      .groupBy("h")
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("h")
    exploded
      .join(broadcast(heavy), Seq("h"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line"))).as("text"))
  }
}
