package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan,
  LessThanOrEqual, Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.functions.BoundedLevenshteinExpr

/** Optimizer rewrite: thresholded comparisons against Spark's FULL-matrix
  * 2-arg `levenshtein(a, b)` become the banded/bit-parallel
  * `bounded_levenshtein` kernel, which prunes on the length gap and caps
  * work at O(k·n/64) instead of O(m·n) — the fuzzy-join residual
  * predicate is exactly where this shape appears, evaluated once per
  * candidate pair. Users write the natural predicate; the rule supplies
  * the kernel `Dedup.editDistancePairs` already calls explicitly.
  *
  * Soundness (`bounded_levenshtein(a, b, k)` = distance if ≤ k else −1,
  * NULL iff either input is NULL — contract-identical to Spark's 3-arg
  * form):
  *
  *   lev(a,b) <= k  ⟺  bounded(a,b,k) >= 0
  *   lev(a,b) >  k  ⟺  bounded(a,b,k) = −1
  *   lev(a,b) <  k  ⟺  bounded(a,b,k−1) >= 0   (k ≥ 1 only)
  *
  * NULL propagates identically on both sides of each equivalence, so the
  * rewrite is value-exact in Project context too, not just under Filter.
  * Only the 2-arg builtin with a foldable non-negative IntegerType bound
  * rewrites; everything else (casts around the call, dynamic thresholds,
  * the already-bounded 3-arg form) is left alone.
  */
object BoundedLevenshteinRewrite extends Rule[LogicalPlan] {

  private object Lev2 {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Levenshtein(a, b, None) => Some((a, b))
      case _ => None
    }
  }

  private object FoldableNonNegInt {
    def unapply(e: Expression): Option[Int] = e match {
      case e if e.foldable && e.dataType == IntegerType =>
        Option(e.eval()).map(_.asInstanceOf[Int]).filter(_ >= 0)
      case _ => None
    }
  }

  private def withinK(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(BoundedLevenshteinExpr(a, b, k), Literal(0L))

  private def beyondK(a: Expression, b: Expression, k: Int): Expression =
    EqualTo(BoundedLevenshteinExpr(a, b, k), Literal(-1L))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Lev2(a, b), FoldableNonNegInt(k)) => withinK(a, b, k)
      case GreaterThanOrEqual(FoldableNonNegInt(k), Lev2(a, b)) => withinK(a, b, k)
      case GreaterThan(Lev2(a, b), FoldableNonNegInt(k)) => beyondK(a, b, k)
      case LessThan(FoldableNonNegInt(k), Lev2(a, b)) => beyondK(a, b, k)
      case LessThan(Lev2(a, b), FoldableNonNegInt(k)) if k >= 1 => withinK(a, b, k - 1)
      case GreaterThan(FoldableNonNegInt(k), Lev2(a, b)) if k >= 1 => withinK(a, b, k - 1)
    }
}
