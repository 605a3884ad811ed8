package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the training-data pipeline, built entirely from
  * codegen'd Catalyst expressions (split / higher-order functions) — no
  * Scala or Python UDFs, so every operator stays inside WholeStageCodegen
  * and scales linearly with executor count.
  *
  * All hashes are plain 64-bit modular arithmetic (not JVM hashCode), so
  * the same numbers are computable in any engine — that is what lets the
  * DuckDB oracles replay MinHash/SimHash byte-for-byte.
  */
object TextFunctions {

  /** Modulus for polynomial rolling hashes (large prime < 2^30, so
    * a*h + b stays well inside a long for multipliers < 2^20).
    */
  val HashMod: Long = 1000000007L

  /** MinHash permutation constants (a*h + b) % HashMod — fixed so results
    * are deterministic across runs, engines and cluster sizes.
    */
  val MinHashA: Seq[Long] =
    Seq(737197L, 990407L, 141761L, 618053L, 787433L, 358823L, 519577L, 862847L)
  val MinHashB: Seq[Long] =
    Seq(94007L, 517093L, 332989L, 611953L, 27961L, 440411L, 763901L, 120889L)

  /** Whitespace tokenization (ANY whitespace run — newlines and tabs
    * included, not just literal spaces: real corpora are line-wrapped),
    * empty tokens dropped.
    *
    * Since r16 this is the compiled `expressions.WhitespaceTokens` —
    * one native byte scan per row instead of regex `split` + an
    * interpreted `ArrayFilter` (the CodegenFallback the r16 audit found
    * on ~40 batch gates' corpus-scale paths, this being the first map
    * stage of nearly every text operator). Values are bit-identical;
    * WhitespaceTokensSpec pins equality against the exact HOF form.
    */
  def tokens(text: Column): Column =
    graft.core.Graft.column(graft.functions.expressions.WhitespaceTokens(
      graft.core.Graft.expression(text)))

  /** Ingestion-side whitespace normalization: maps the ONE character on
    * which Java-regex `\s` (the engine's tokenizer contract) and
    * RE2-lineage `\s` (DuckDB/Go/Rust oracles and downstream consumers)
    * disagree — U+000B vertical tab — to a plain space. Running raw
    * crawl text through this at ingestion makes every downstream
    * tokenization engine-agnostic, so the documented `WhitespaceTokens`
    * divergence (its scaladoc's determinism note) can never bite a
    * corpus; the gate corpora contain no \x0B, so gates are unaffected
    * either way. Codegen'd `translate` — no UDF, no regex.
    */
  def normalizeWhitespace(text: Column): Column =
    translate(text, "\u000B", " ")

  /** Word n-gram shingles (joined by single spaces); inputs shorter than
    * n tokens fall back to their token list so they still dedup.
    *
    * Since r15 this is the compiled `expressions.Shingles` — one native
    * call per row, no interpreted HOF stages, no intermediate arrays
    * (see that file for the history: the zip_with-over-shifted-slices
    * form this replaces was itself the fix for an O(len²)
    * indexing-lambda formulation, a measured 20× at 5k docs; the
    * compiled form removes the remaining (n−1) interpreted passes).
    * Values are bit-identical.
    */
  def shinglesFromTokens(toks: Column, n: Int = 3): Column =
    graft.core.Graft.column(graft.functions.expressions.Shingles(
      graft.core.Graft.expression(toks), n, sliding = false,
      distinct = false))

  /** ALL sliding n-token windows (start positions 0..len−n), joined by
    * single spaces — the span-dedup primitive (see text.SpanDedup). Unlike
    * [[shinglesFromTokens]] there is no short-input fallback: inputs with
    * fewer than n tokens yield an EMPTY array (a span shorter than the
    * span length is not a span). Compiled (`expressions.Shingles`,
    * sliding mode) since r15; values bit-identical to the zip_with form.
    */
  def slidingFromTokens(toks: Column, n: Int): Column =
    graft.core.Graft.column(graft.functions.expressions.Shingles(
      graft.core.Graft.expression(toks), n, sliding = true,
      distinct = false))

  /** Convenience single-expression form — fine for small frames, but
    * prefer projecting tokens + shinglesFromTokens on large corpora (see
    * note above).
    */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromTokens(tokens(text), n)

  /** Distinct shingle set — the unit of Jaccard similarity. */
  def shingleSet(text: Column, n: Int = 3): Column =
    array_distinct(shingles(text, n))

  /** Distinct shingle set from materialized tokens (the scale path) —
    * compiled shingling + first-occurrence dedup in the same call.
    */
  def shingleSetFromTokens(toks: Column, n: Int = 3): Column =
    graft.core.Graft.column(graft.functions.expressions.Shingles(
      graft.core.Graft.expression(toks), n, sliding = false,
      distinct = true))

  /** Polynomial rolling hash of a string: fold over code points of
    * (h*31 + cp) % HashMod. Deterministic, engine-portable. Backed by a
    * native codegen'd Catalyst expression (see expressions.PolyHash);
    * the equivalent higher-order-function form allocates per character
    * and was the profile's hottest scalar.
    */
  def polyHash(s: Column): Column =
    graft.core.Graft.column(graft.functions.expressions.PolyHash(
      graft.core.Graft.expression(s)))

  /** i-th MinHash permutation applied to a pre-hashed token value. */
  def permute(h: Column, i: Int): Column =
    (h * MinHashA(i) + MinHashB(i)) % HashMod

  /** Jaccard similarity of two pre-distinct arrays, computed with exact
    * integer set sizes and a single double division (bit-stable).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(a) + size(b) - inter
    // two empty sets → null, not an ANSI DIVIDE_BY_ZERO (Spark 4 default)
    when(union > 0, inter.cast("double") / union)
  }

  /** Number of set bits in a long (for SimHash Hamming distance) —
    * expression-level popcount via bit_count.
    */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("int")

  /** Heavy-hitter sketch aggregate (mergeable Misra-Gries, m counters):
    * array<struct<item, est, err>> sorted by est desc. The bounded-state
    * alternative to an exact explode+count top-k when item cardinality is
    * unbounded — see expressions.FreqSketch for the guarantees.
    */
  def freqSketch(items: Column, m: Int): Column =
    graft.core.Graft.column(
      graft.functions.expressions.FreqSketch(
        graft.core.Graft.expression(items), m).toAggregateExpression())

  /** Bottom-k/KMV sketch aggregate: struct<sample array<string>,
    * est_distinct bigint> — a deterministic uniform sample of the
    * group's distinct items (bottom-k of the polyhash permutation) plus
    * a distinct-count estimate, exact below k. Bounded mergeable state —
    * see expressions.KmvSketch.
    */
  def kmvSample(items: Column, k: Int): Column =
    graft.core.Graft.column(
      graft.functions.expressions.KmvSketch(
        graft.core.Graft.expression(items), k).toAggregateExpression())

  /** Bloom-filter aggregate over a bigint fingerprint column: a binary
    * bitset with no false negatives — the broadcastable runtime filter
    * behind [[graft.dedup.NearDup.incrementalDedupBloom]]. numBits must
    * be a power of two in [64, 2^30]; ~10 bits/key + 5-7 hashes gives
    * <1% false positives. See expressions.BloomAgg.
    */
  def bloomFilter(fp: Column, numBits: Int, numHashes: Int): Column =
    graft.core.Graft.column(
      graft.functions.expressions.BloomAgg(
        graft.core.Graft.expression(fp), numBits, numHashes)
        .toAggregateExpression())

  /** Membership probe against a [[bloomFilter]] bitset (codegen'd):
    * false = definitely absent, true = present or false positive.
    */
  def bloomContains(bloom: Column, fp: Column): Column =
    graft.core.Graft.column(
      graft.functions.expressions.BloomContains(
        graft.core.Graft.expression(bloom),
        graft.core.Graft.expression(fp)))

  /** Mergeable quantile-sketch aggregate over an int/bigint column:
    * struct<n_total, n_entries, exact, values array<bigint>> with
    * values(i) the ⌈fractionsᵢ·n⌉-th smallest. Exact order statistics
    * while distinct values stay below capacity (`exact` flag reports
    * the regime); bounded merge-reduce state above. See
    * expressions.QuantileSketch.
    */
  def quantileSketch(v: Column, capacity: Int, fractions: Seq[Double])
      : Column =
    graft.core.Graft.column(
      graft.functions.expressions.QuantileSketch(
        graft.core.Graft.expression(v), capacity, fractions)
        .toAggregateExpression())
}
