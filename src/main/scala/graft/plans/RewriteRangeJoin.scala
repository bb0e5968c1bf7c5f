package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule: an INNER join whose only link between the sides is a
  * point-in-interval predicate — `p >= lo AND p < hi` (any mix of
  * strict/inclusive bounds) — plans as a nested-loop join:
  * |facts| × |intervals| comparisons, the accidental quadratic every
  * range-lookup query hits at scale. This rule rewrites it into the
  * bucketed EQUI-join [[graft.operators.RangeJoin.bucketedRangeJoin]]
  * builds by hand: the interval side explodes to the width-`w` buckets
  * it overlaps, the point side computes its single bucket, the join
  * gains `bucket = bucket` (which hash-partitions or broadcasts like
  * any equi-join), and the ORIGINAL predicate stays as the exact
  * residual. Same rows, linear plan — the `RANGE_JOIN`-hint capability
  * some engines ship, re-expressed as a ~100-line logical rewrite.
  *
  * OPT-IN: fires only when `spark.graft.rangeJoin.bucketWidth` is set
  * to a positive long — bucket width is a physical-tuning choice
  * (dimension blowup = interval span / width) the engine cannot derive
  * without value statistics, so like the engines' hints it is explicit.
  *
  * Scope guards (each keeps the rewrite provably answer-preserving):
  *  - INNER join only; the bound attributes must be bare columns, the
  *    point on one side and both bounds on the other (either
  *    orientation);
  *  - all three columns INTEGRAL (bucket arithmetic is then exact:
  *    `floor-div` built from `(x - pmod(x, w)) div w`, correct for
  *    negatives where a plain `div` truncates the wrong way; no
  *    float rounding can ever mis-bucket a row);
  *  - nulls drop identically: a null point/bound nulls the bucket (or
  *    the sequence, emitting no buckets), and the same row is dropped
  *    by the original condition in the un-rewritten plan;
  *  - the upper bucket backs off by one when `hi` sits on a boundary
  *    AND the bound is exclusive, so `sequence` never inverts and no
  *    bucket is fabricated;
  *  - already-rewritten joins are recognized by the helper-column
  *    marker and skipped (the optimizer batch runs to fixed point).
  */
object RewriteRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.rangeJoin.bucketWidth"

  private val MarkerP = "__graft_range_bucket_p"
  private val MarkerI = "__graft_range_bucket_i"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = try conf.getConfString(ConfKey, "0").toLong
    catch { case _: NumberFormatException => 0L }
    if (width <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !cond.references.exists(a =>
            a.name == MarkerP || a.name == MarkerI) =>
        rewrite(j, left, right, cond, hint, width).getOrElse(j)
    }
  }

  /** `p >= lo` / `lo <= p` / `p > lo` / `lo < p` → (p, lo). */
  private def asLower(e: Expression): Option[(AttributeReference, AttributeReference)] =
    e match {
      case GreaterThanOrEqual(p: AttributeReference, lo: AttributeReference) => Some((p, lo))
      case LessThanOrEqual(lo: AttributeReference, p: AttributeReference) => Some((p, lo))
      case GreaterThan(p: AttributeReference, lo: AttributeReference) => Some((p, lo))
      case LessThan(lo: AttributeReference, p: AttributeReference) => Some((p, lo))
      case _ => None
    }

  /** `p < hi` / `hi > p` (exclusive=true) or `p <= hi` / `hi >= p` →
    * (p, hi, exclusive). */
  private def asUpper(e: Expression): Option[(AttributeReference, AttributeReference, Boolean)] =
    e match {
      case LessThan(p: AttributeReference, hi: AttributeReference) => Some((p, hi, true))
      case GreaterThan(hi: AttributeReference, p: AttributeReference) => Some((p, hi, true))
      case LessThanOrEqual(p: AttributeReference, hi: AttributeReference) => Some((p, hi, false))
      case GreaterThanOrEqual(hi: AttributeReference, p: AttributeReference) => Some((p, hi, false))
      case _ => None
    }

  private def integral(a: Attribute): Boolean = a.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Exact floor division to bucket ids: `(x - pmod(x, w)) div w` on
    * LONG — pmod is non-negative, so the division is exact floor for
    * negative values too (plain `div` truncates toward zero). */
  private def bucketOf(x: Expression, w: Literal): Expression = {
    val xl = Cast(x, LongType)
    IntegralDivide(Subtract(xl, Pmod(xl, w)), w)
  }

  private def rewrite(
      j: Join, left: LogicalPlan, right: LogicalPlan, cond: Expression,
      hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint,
      width: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val lowers = conjuncts.flatMap(asLower)
    val uppers = conjuncts.flatMap(asUpper)
    // first (p, lo, hi) triple where p sits alone on one side and both
    // bounds on the other, all integral
    val triple = (for {
      (p1, lo) <- lowers
      (p2, hi, hiExclusive) <- uppers
      if p1.semanticEquals(p2) && integral(p1) && integral(lo) && integral(hi)
      sides <- sideOf(p1, lo, hi, left, right)
    } yield (p1, lo, hi, hiExclusive, sides)).headOption

    triple.map { case (p, lo, hi, hiExclusive, pointSideIsLeft) =>
      val w = Literal(width, LongType)
      // point side: one helper column, its bucket
      val pAlias = Alias(bucketOf(p, w), MarkerP)()
      def widen(plan: LogicalPlan): LogicalPlan =
        Project(plan.output :+ pAlias, plan)
      // interval side: explode to every bucket the interval overlaps;
      // exclusive hi on a boundary backs the last bucket off by one
      val bLo = bucketOf(lo, w)
      val bHiRaw = bucketOf(hi, w)
      val bHi =
        if (hiExclusive)
          If(EqualTo(Pmod(Cast(hi, LongType), w), Literal(0L, LongType)),
            Subtract(bHiRaw, Literal(1L, LongType)), bHiRaw)
        else bHiRaw
      val bAttr = AttributeReference(MarkerI, LongType, nullable = false)()
      // Sequence is TimeZoneAwareExpression — resolution requires a zone
      // even for integral sequences
      val seq = new Sequence(bLo, bHi, None, Some(conf.sessionLocalTimeZone))
      def explode(plan: LogicalPlan): LogicalPlan =
        Generate(Explode(seq), Nil, outer = false, None, Seq(bAttr), plan)
      val (newLeft, newRight) =
        if (pointSideIsLeft) (widen(left), explode(right))
        else (explode(left), widen(right))
      val newCond = And(EqualTo(pAlias.toAttribute, bAttr), cond)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }

  /** Some(true) if `p` resolves from the left and both bounds from the
    * right; Some(false) for the mirror; None otherwise. */
  private def sideOf(
      p: Attribute, lo: Attribute, hi: Attribute,
      left: LogicalPlan, right: LogicalPlan): Option[Boolean] = {
    val pl = left.outputSet.contains(p)
    val pr = right.outputSet.contains(p)
    val boundsLeft = left.outputSet.contains(lo) && left.outputSet.contains(hi)
    val boundsRight = right.outputSet.contains(lo) && right.outputSet.contains(hi)
    if (pl && boundsRight) Some(true)
    else if (pr && boundsLeft) Some(false)
    else None
  }
}
