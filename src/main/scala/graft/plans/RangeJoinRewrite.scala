package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join,
  LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rescue for the NAIVE range-join spelling.
  *
  * `points JOIN intervals ON p BETWEEN lo AND hi` has no equi-key, so
  * Spark plans a BroadcastNestedLoopJoin — |points| × |intervals|
  * comparisons, the scale-killer [[graft.operators.RangeJoin]] exists to
  * avoid. The API tier fixes the spelling; this rule fixes the USER: a
  * SQL-migrating workload that arrives with the naive predicate gets the
  * same bucketed equi-join transparently — each interval is exploded to
  * the bucket ids it covers (`explode(sequence(floor(lo/w),
  * floor(hi/w)))`), the point side joins on its single bucket id, and
  * the ORIGINAL predicate stays as the residual filter, so semantics are
  * exact at any positive width (strict or closed bounds alike; the
  * bucketed candidate set is a superset either way).
  *
  * Opt-in by conf: the rule fires only when [[RangeJoinRewrite.WidthConf]]
  * is set. Width selection is the one thing an optimizer rule CANNOT do
  * well — [[graft.operators.RangeJoin.adaptiveWidth]] derives it from a
  * percentile scan over the interval side, and running jobs inside an
  * optimizer rule is not acceptable — so the width travels as explicit
  * session state, and an unset conf means "leave the plan alone" rather
  * than "guess and risk a sequence-length blowup on mile-wide intervals".
  *
  * Scope guards (each bails to the untouched plan): inner join only; no
  * existing cross-side equi conjunct (Spark already hash-joins those);
  * exactly one lower and one upper bound over the same numeric,
  * deterministic point expression with both bounds from the other side.
  * The rewritten join carries a cross-side equi conjunct, so the rule is
  * idempotent under the fixed-point optimizer batch by construction.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Bucket width (double, > 0) for the rewrite; unset → rule is off. */
  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  private case class Bound(point: Expression, bound: Expression,
      pointOnLeft: Boolean, isLower: Boolean)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthConf, "")
    if (width.isEmpty) plan
    else {
      val w = width.toDouble
      require(w > 0, s"$WidthConf must be positive, got $width")
      plan.transformUp {
        case j @ Join(_, _, Inner, Some(_), _) => rewrite(j, w).getOrElse(j)
      }
    }
  }

  private def rewrite(j: Join, w: Double): Option[LogicalPlan] = {
    val cond = j.condition.get
    val conjuncts = splitConjunctivePredicates(cond)
    def side(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(j.left.outputSet)) Some(true)
      else if (e.references.subsetOf(j.right.outputSet)) Some(false)
      else None
    def crossSide(a: Expression, b: Expression): Boolean =
      (side(a), side(b)) match {
        case (Some(x), Some(y)) => x != y
        case _                  => false
      }
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b)       => crossSide(a, b)
      case EqualNullSafe(a, b) => crossSide(a, b)
      case _                   => false
    }
    if (hasEqui) return None

    // each comparison conjunct yields up to one reading per operand-as-
    // point; `p >= lo` and `lo <= p` normalize to the same Bound
    def mk(p: Expression, b: Expression, lower: Boolean): Seq[Bound] =
      (side(p), side(b)) match {
        case (Some(ps), Some(bs)) if ps != bs &&
            p.dataType.isInstanceOf[NumericType] &&
            b.dataType.isInstanceOf[NumericType] &&
            p.deterministic && b.deterministic =>
          Seq(Bound(p, b, ps, lower))
        case _ => Nil
      }
    val bounds = conjuncts.flatMap {
      case GreaterThanOrEqual(a, b) => mk(a, b, lower = true) ++ mk(b, a, lower = false)
      case GreaterThan(a, b)        => mk(a, b, lower = true) ++ mk(b, a, lower = false)
      case LessThanOrEqual(a, b)    => mk(a, b, lower = false) ++ mk(b, a, lower = true)
      case LessThan(a, b)           => mk(a, b, lower = false) ++ mk(b, a, lower = true)
      case _                        => Nil
    }
    val pair = (for {
      l <- bounds if l.isLower
      u <- bounds if !u.isLower
      if l.pointOnLeft == u.pointOnLeft && l.point.semanticEquals(u.point)
    } yield (l, u)).headOption

    pair.map { case (lo, hi) =>
      def bucketOf(e: Expression): Expression =
        Floor(Divide(Cast(e, DoubleType), Literal(w)))
      val intervalPlan = if (lo.pointOnLeft) j.right else j.left
      // inverted intervals match nothing under BETWEEN, but sequence()
      // would infer a DESCENDING step for them — filter them out first
      val ivFiltered = Filter(LessThanOrEqual(lo.bound, hi.bound), intervalPlan)
      // Sequence is TimeZoneAwareExpression: without an explicit zone it
      // reports unresolved and fails the optimizer's plan validation
      // (irrelevant to LONG buckets, but required for resolution)
      val gen = Explode(new Sequence(
        bucketOf(lo.bound), bucketOf(hi.bound), None,
        Some(conf.sessionLocalTimeZone)))
      val attr = AttributeReference("_graft_range_bucket", LongType,
        nullable = gen.elementSchema.head.nullable)()
      val generate =
        Generate(gen, Nil, outer = false, None, Seq(attr), ivFiltered)
      val newCond = And(EqualTo(bucketOf(lo.point), attr), cond)
      if (lo.pointOnLeft) Join(j.left, generate, Inner, Some(newCond), j.hint)
      else Join(generate, j.right, Inner, Some(newCond), j.hint)
    }
  }
}
