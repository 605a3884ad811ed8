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

  /** Whitespace tokenization, empty tokens dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  /** Word n-gram shingles (joined by single spaces); documents shorter than
    * n tokens fall back to their token list so they still dedup.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ",
          (0 until n).map(k => element_at(toks, i + k)): _*)))
      .otherwise(toks)
  }

  /** Distinct shingle set — the unit of Jaccard similarity. */
  def shingleSet(text: Column, n: Int = 3): Column =
    array_distinct(shingles(text, n))

  /** Polynomial rolling hash of a string: fold over characters of
    * (h*31 + codepoint) % HashMod. Deterministic, engine-portable.
    */
  def polyHash(s: Column): Column =
    aggregate(split(s, ""), lit(0L),
      (h, c) => (h * 31L + ascii(c)) % HashMod)

  /** i-th MinHash permutation applied to a pre-hashed token value. */
  def permute(h: Column, i: Int): Column =
    (h * MinHashA(i) + MinHashB(i)) % HashMod

  /** Jaccard similarity of two pre-distinct arrays, computed with exact
    * integer set sizes and a single double division (bit-stable).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  /** Number of set bits in a long (for SimHash Hamming distance) —
    * expression-level popcount via bit_count.
    */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("int")
}
