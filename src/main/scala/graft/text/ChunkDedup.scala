package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Sub-document (chunk-level) corpus deduplication — the C4 move
  * (Raffel et al. 2020, arXiv:1910.10683 §2.2: drop every repeated
  * three-sentence span, keeping its first occurrence), adapted to
  * fixed-size token chunks so it applies to corpora without sentence
  * structure. Repeated boilerplate (headers, footers, license blocks)
  * disappears from every document but the first one that carried it;
  * documents made entirely of already-seen chunks vanish outright.
  *
  * Scale shape: two exchanges. (1) chunks hash-partition on their 64-bit
  * polynomial fingerprint (the d08 fingerprint-first discipline: the
  * keep/drop decision shuffles 8-byte keys, chunk text rides along only
  * because the rebuild needs it); first-occurrence is a row_number over
  * (fingerprint) ordered by (doc, position) — deterministic, no driver
  * state. (2) kept chunks regroup by document to rebuild the text in
  * position order. No global sort, no self-join, no driver loop; both
  * shuffles scale linearly with corpus size.
  *
  * Everything (fingerprint, ordering, rebuild) is exact integer/string
  * arithmetic — the t13 oracle replays it bitwise in DuckDB.
  */
object ChunkDedup {

  /** Splits each document into consecutive `chunkTokens`-token chunks,
    * drops every chunk whose fingerprint was already seen earlier in the
    * corpus (earlier = smaller (doc id, chunk position)), and rebuilds the
    * surviving text. Documents with no surviving chunk are removed.
    *
    * Output: (idCol, n_chunks, n_kept, text_dedup), one row per surviving
    * document.
    *
    * Equality is on the chunk fingerprint (polynomial rolling hash mod
    * 1e9+7) — the same fingerprint-as-identity contract as
    * [[graft.dedup.NearDup.exactDedup]] at d08.
    */
  def dedupChunks(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 50): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    val reserved = Set("chunk", "chunk_idx", "n_chunks", "n_kept",
      "text_dedup", "__toks", "__rn")
    require(!reserved.contains(idCol),
      s"idCol '$idCol' collides with a dedup output column")
    val chunks = df
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      // zero-token docs carry no chunks (and sequence(0, -1) would DESCEND)
      .filter(size(col("__toks")) > 0)
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0),
            floor((size(col("__toks")) + chunkTokens - 1)
              / chunkTokens).cast("int") - 1),
          i => array_join(
            slice(col("__toks"), i * chunkTokens + 1, lit(chunkTokens)),
            " "))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk")
    val firstSeen = Window
      .partitionBy(TextFunctions.polyHash(col("chunk")))
      .orderBy(col(idCol), col("chunk_idx"))
    chunks
      .withColumn("__rn", row_number().over(firstSeen))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("__rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("__rn") === 1,
            struct(col("chunk_idx"), col("chunk"))))),
          s => s.getField("chunk")), " ").as("text_dedup"))
      .filter(col("n_kept") > 0)
  }
}
