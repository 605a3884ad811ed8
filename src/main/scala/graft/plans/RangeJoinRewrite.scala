package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Catalyst optimizer rule: rewrite point-in-interval theta-joins into the
  * bucketed equi-join shape of `operators.RangeJoin` — rung (c) of the
  * custom-operator ladder (`Rule[LogicalPlan]` via SparkSessionExtensions),
  * used here because no DataFrame-level composition can fix a join the
  * USER already wrote as `p.x >= r.lo AND p.x < r.hi`.
  *
  * Without the rule Spark plans that join as a BroadcastNestedLoopJoin —
  * O(|points| × |ranges|) comparisons and a hard broadcast-limit wall once
  * the ranges side grows. The rewrite buckets both sides on
  * `floor(value / width)` (ranges fan out to every bucket they overlap via
  * `explode(sequence(...))`), joins on the bucket key, and keeps the exact
  * predicate as a post-join re-check, so results are identical for ANY
  * width (RangeJoinRewriteSpec asserts equivalence and the plan change).
  *
  * Scope guards:
  *  - fires only on INNER joins whose condition contains a
  *    `point >= lo AND point < hi` conjunct pair (any flip of the
  *    comparisons) with `point` computed from one side and `lo`/`hi` from
  *    the other, all numeric;
  *  - composite conditions (`l.key = r.key AND l.t BETWEEN lo AND hi`)
  *    rewrite too: the bucket equality is ADDED next to the user's equi
  *    conjuncts, so Spark hash-joins on (key, bucket) — for a skewed key
  *    with wide ranges this splits the key's scan across buckets instead
  *    of funnelling it through one hash partition and post-filtering.
  *    Idempotency comes from the rule's own bucket-column marker
  *    (`BucketPrefix`): its output contains a __graft_bucket_* equality,
  *    so it never re-fires;
  *  - only active when `spark.graft.rangeJoin.bucketWidth` is set — width
  *    is data-dependent (≈ median range length), so it is an explicit
  *    opt-in, not a guess.
  */
case class RangeJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  import RangeJoinRewrite.{BucketPrefix, WidthConf}

  /** Parsed defensively: the rule is injected into EVERY session via
    * GraftExtensions, so a malformed width value must disable the rewrite
    * (with a warning), not throw from inside the optimizer and fail every
    * subsequent query in the session.
    */
  // warn once per rule instance (= per session), not once per optimizer
  // invocation — apply() runs for every query and fixed-point iteration
  @transient private var warnedBadWidth = false

  private def configuredWidth: Option[Double] =
    spark.conf.getOption(WidthConf).flatMap { v =>
      val parsed = scala.util.Try(v.toDouble).toOption.filter(_ > 0)
      if (parsed.isEmpty && !warnedBadWidth) {
        warnedBadWidth = true
        logWarning(s"$WidthConf='$v' is not a positive number; " +
          "range-join rewrite disabled")
      }
      parsed
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    configuredWidth match {
      case None => plan
      case Some(w) =>
        plan.transformUp {
          case j @ Join(left, right, Inner, Some(cond), _) =>
            rewrite(j, left, right, cond, w).getOrElse(j)
        }
    }

  /** `point >= lo` in either written order. */
  private def lowerBound(e: Expression): Option[(Expression, Expression)] =
    e match {
      case GreaterThanOrEqual(p, lo) => Some((p, lo))
      case LessThanOrEqual(lo, p)    => Some((p, lo))
      case _                         => None
    }

  /** `point < hi` in either written order. */
  private def upperBound(e: Expression): Option[(Expression, Expression)] =
    e match {
      case LessThan(p, hi)    => Some((p, hi))
      case GreaterThan(hi, p) => Some((p, hi))
      case _                  => None
    }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, w: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (!conjuncts.forall(_.deterministic)) return None
    def spansSides(a: Expression, b: Expression): Boolean = {
      val (ar, br) = (a.references, b.references)
      ar.nonEmpty && br.nonEmpty &&
        ((ar.subsetOf(left.outputSet) && br.subsetOf(right.outputSet)) ||
          (ar.subsetOf(right.outputSet) && br.subsetOf(left.outputSet)))
    }
    // Idempotency guard: the rule's own output contains an equality on a
    // __graft_bucket_* attribute, so it never re-fires on a join it already
    // rewrote. (Until round 7 this was a blanket bail on ANY equi-conjunct;
    // now the common production shape `l.key = r.key AND l.t BETWEEN lo AND
    // hi` also rewrites — Spark hash-joins on (key, bucket) together, which
    // splits a skewed key's wide-range scan across buckets instead of
    // funnelling it through one hash-join partition and filtering.)
    val alreadyBucketed = conjuncts.exists {
      case EqualTo(a: AttributeReference, _)
          if a.name.startsWith(BucketPrefix) => true
      case EqualTo(_, b: AttributeReference)
          if b.name.startsWith(BucketPrefix) => true
      case _ => false
    }
    if (alreadyBucketed) return None

    // Escape hatch for the composite shape: the width conf is SESSION-
    // global while range extents are per-join — a width tuned for one
    // narrow-range query would make another query's wide ranges fan out
    // to (hi-lo)/width buckets per row. Pure-range joins always rewrite
    // (the alternative is a nested-loop join); equi+range joins already
    // have a working hash-join plan, so a mixed workload can keep them
    // untouched by setting the composite conf to false.
    val hasUserEqui = conjuncts.exists {
      case EqualTo(a, b)       => spansSides(a, b)
      case EqualNullSafe(a, b) => spansSides(a, b)
      case _                   => false
    }
    // accept every common falsy spelling — a user who thinks they engaged
    // the escape hatch must not silently still get the rewrite
    val compositeDisabled = spark.conf
      .getOption(RangeJoinRewrite.CompositeConf)
      .exists(v => Set("false", "0", "no", "off")(v.trim.toLowerCase))
    if (hasUserEqui && compositeDisabled) return None

    def fromOneSide(e: Expression): Boolean =
      e.references.nonEmpty &&
        (e.references.subsetOf(left.outputSet) ||
          e.references.subsetOf(right.outputSet))
    def numeric(e: Expression): Boolean =
      e.dataType.isInstanceOf[NumericType]

    val candidate = (for {
      lb <- conjuncts.iterator.flatMap(lowerBound(_))
      (p, lo) = lb
      if fromOneSide(p) && fromOneSide(lo) && spansSides(p, lo)
      if numeric(p) && numeric(lo)
      ub <- conjuncts.iterator.flatMap(upperBound(_))
      (p2, hi) = ub
      if p.semanticEquals(p2) && numeric(hi)
      if fromOneSide(hi) && spansSides(p, hi)
    } yield (p, lo, hi)).nextOption()

    candidate.map { case (point, lo, hi) =>
      val pointOnLeft = point.references.subsetOf(left.outputSet)
      val (pPlan, rPlan) = if (pointOnLeft) (left, right) else (right, left)
      val wLit = Literal(w, DoubleType)
      def bucketOf(e: Expression): Expression =
        Floor(Divide(Cast(e, DoubleType), wLit)) // Floor(double) : LongType
      val pAlias = Alias(bucketOf(point), s"${BucketPrefix}p")()
      val pProj = Project(pPlan.output :+ pAlias, pPlan)
      // a range [lo, hi) overlaps buckets floor(lo/w)..floor(hi/w); the
      // exact re-check removes the one spurious candidate when hi sits on
      // a bucket edge. Null lo/hi → null sequence → Generate emits no row,
      // matching the theta-join's null-comparison semantics.
      // Sequence is TimeZoneAwareExpression: without an explicit
      // timeZoneId it reports unresolved and plan validation rejects the
      // rewrite (integral sequences never use it, but resolution demands it)
      val gen = Explode(Sequence(bucketOf(lo), bucketOf(hi), None,
        Some(conf.sessionLocalTimeZone)))
      val bAttr = AttributeReference(s"${BucketPrefix}r", LongType,
        nullable = gen.elementSchema.head.nullable)()
      val rGen = Generate(gen, Nil, outer = false, None, Seq(bAttr), rPlan)
      val (nl, nr) = if (pointOnLeft) (pProj, rGen) else (rGen, pProj)
      val joined = Join(nl, nr, Inner,
        Some(And(EqualTo(pAlias.toAttribute, bAttr), cond)), j.hint)
      Project(j.output, joined)
    }
  }
}

object RangeJoinRewrite {

  /** Bucket width (domain units). Unset → the rule is inert. */
  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  /** Prefix of the rule's generated bucket columns — also the idempotency
    * marker (a join whose condition already equates a column with this
    * prefix was produced by this rule).
    */
  val BucketPrefix = "__graft_bucket_"

  /** Set to "false" to keep equi+range (composite) joins on their plain
    * hash-join plan while still rewriting pure range joins — for sessions
    * whose global bucket width doesn't fit every query's range extents.
    */
  val CompositeConf = "spark.graft.rangeJoin.rewriteComposite"

  /** Install on an already-running session (builder-time
    * `spark.sql.extensions` only applies to new sessions).
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[RangeJoinRewrite]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite(spark)
}
