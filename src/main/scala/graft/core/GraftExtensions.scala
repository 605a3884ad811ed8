package graft.core

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.expressions.{DotProduct, PolyHash}

/** SparkSessionExtensions entry point: registers the engine's native SQL
  * functions so `spark.sql("SELECT graft_polyhash(x) ...")` works on any
  * cluster launched with
  * `--conf spark.sql.extensions=graft.core.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // optimizer rules: inert unless their conf is set (RangeJoinRewrite
    // fires only with spark.graft.rangeJoin.bucketWidth)
    ext.injectOptimizerRule(session => graft.plans.RangeJoinRewrite(session))
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  /** A foldable int argument (e.g. the shingle width) — SQL-side model
    * parameters must be literals, not data columns.
    */
  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal")
    e.eval(null) match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$what must be an int literal, got $other")
    }
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      ("graft_polyhash",
        info("graft_polyhash",
          "graft_polyhash(str) - engine-portable polynomial rolling hash " +
            "((h*31+cp) % 1000000007 over code points)"),
        (args: Seq[Expression]) => {
          require(args.length == 1, "graft_polyhash takes one argument")
          PolyHash(args.head)
        }),
      ("graft_dot",
        info("graft_dot",
          "graft_dot(a, b) - left-to-right dot product of two " +
            "array<float|double> columns (deterministic summation order)"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "graft_dot takes two arguments")
          DotProduct(args(0), args(1))
        }),
      ("graft_shingles",
        info("graft_shingles",
          "graft_shingles(toks, n) - word n-gram shingles of a token " +
            "array (space-joined sliding windows; inputs shorter than n " +
            "fall back to the token list) - the compiled dedup primitive"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "graft_shingles takes two arguments")
          graft.functions.expressions.Shingles(args.head,
            litInt(args(1), "graft_shingles n"), sliding = false,
            distinct = false)
        }),
      ("graft_shingle_set",
        info("graft_shingle_set",
          "graft_shingle_set(toks, n) - distinct word n-gram shingles " +
            "(first occurrence kept) - the Jaccard/MinHash unit set"),
        (args: Seq[Expression]) => {
          require(args.length == 2,
            "graft_shingle_set takes two arguments")
          graft.functions.expressions.Shingles(args.head,
            litInt(args(1), "graft_shingle_set n"), sliding = false,
            distinct = true)
        }),
      // compositions of built-in catalyst expressions (no custom eval):
      // expose the engine's set-similarity primitives to plain SQL users.
      // Built as raw Expression trees — the Column→Expression bridge
      // yields unresolved ColumnNode wrappers that an injected function
      // builder cannot return (Unevaluable at codegen).
      ("graft_jaccard",
        info("graft_jaccard",
          "graft_jaccard(a, b) - exact Jaccard similarity of two array " +
            "columns treated as sets (null when both are empty)"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "graft_jaccard takes two arguments")
          import org.apache.spark.sql.catalyst.expressions._
          import org.apache.spark.sql.types.{DoubleType, IntegerType}
          // ArrayDistinct both sides: ArrayIntersect dedups its output, so
          // raw sizes would over-count duplicate elements and under-report
          // the similarity of multiset inputs ("treated as sets" must hold
          // for ANY input, unlike the internal pre-distinct fast path)
          val (da, db) = (ArrayDistinct(args(0)), ArrayDistinct(args(1)))
          val inter = Size(ArrayIntersect(da, db))
          val union = Subtract(Add(Size(da), Size(db)), inter)
          // mirror TextFunctions.jaccard: empty∪empty → null, not an ANSI
          // DIVIDE_BY_ZERO
          CaseWhen(Seq((GreaterThan(union, Literal(0, IntegerType)),
            Divide(Cast(inter, DoubleType), Cast(union, DoubleType)))))
        }),
      ("graft_freq",
        info("graft_freq",
          "graft_freq(item, m) - mergeable Misra-Gries heavy-hitter " +
            "sketch aggregate: array<struct<item, est, err>>, est desc; " +
            "est <= true <= est + err, items above N/(m+1) guaranteed"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "graft_freq takes two arguments")
          graft.functions.expressions.FreqSketch(args(0), args(1))
        }),
      ("graft_sample",
        info("graft_sample",
          "graft_sample(item, k) - mergeable bottom-k/KMV sketch " +
            "aggregate: struct<sample array<string> (polyhash order), " +
            "est_distinct bigint>; deterministic uniform distinct-sample " +
            "+ distinct-count estimate, exact below k"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "graft_sample takes two arguments")
          graft.functions.expressions.KmvSketch(args(0), args(1))
        }),
      ("graft_bloom",
        info("graft_bloom",
          "graft_bloom(fp, bits, hashes) - mergeable Bloom-filter " +
            "aggregate over a bigint fingerprint column: binary bitset, " +
            "no false negatives; bits a power of two in [64, 2^30]"),
        (args: Seq[Expression]) => {
          require(args.length == 3, "graft_bloom takes three arguments")
          graft.functions.expressions.BloomAgg(args(0), args(1), args(2))
        }),
      ("graft_bloom_contains",
        info("graft_bloom_contains",
          "graft_bloom_contains(bloom, fp) - probe a graft_bloom bitset: " +
            "false = definitely absent, true = present or false positive"),
        (args: Seq[Expression]) => {
          require(args.length == 2,
            "graft_bloom_contains takes two arguments")
          graft.functions.expressions.BloomContains(args(0), args(1))
        }),
      ("graft_quantiles",
        info("graft_quantiles",
          "graft_quantiles(v, capacity, fractions) - mergeable quantile " +
            "sketch aggregate over an int/bigint column: struct<n_total, " +
            "n_entries, exact, values array<bigint>>; exact order " +
            "statistics below capacity distinct values, bounded-state " +
            "merge-reduce above"),
        (args: Seq[Expression]) => {
          require(args.length == 3, "graft_quantiles takes three arguments")
          graft.functions.expressions.QuantileSketch(args(0), args(1),
            args(2))
        }),
      ("graft_hamming",
        info("graft_hamming",
          "graft_hamming(a, b) - hamming distance between two integral " +
            "bit-signature columns (popcount of xor)"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "graft_hamming takes two arguments")
          import org.apache.spark.sql.catalyst.expressions._
          Cast(BitwiseCount(BitwiseXor(args(0), args(1))),
            org.apache.spark.sql.types.IntegerType)
        }))

  /** Register the same functions on an already-running session (local
    * tooling / tests — builder-time extensions only apply to new
    * sessions).
    */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), i, builder)
    }
}
