package graft.ext

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: bound levenshtein comparisons.
  *
  * `levenshtein(a, b) <= k` (k a non-negative int literal) computes the
  * FULL O(|a|·|b|) dynamic program per row and then throws away every
  * distance above k. The bounded form short-circuits the DP once the
  * running distance exceeds k — O(k·min(|a|,|b|)) — and returns -1 above
  * the bound, so the comparison rewrites exactly:
  *
  *   levenshtein(a, b) <= k   ⇒   lev_within(a, b, k) >= 0
  *   levenshtein(a, b) <  k   ⇒   lev_within(a, b, k-1) >= 0
  *   levenshtein(a, b) =  k   ⇒   lev_within(a, b, k) = k
  *
  * (`>= 0` and not `<= k`: the bounded form's non-negative results are
  * exact distances, and -1 is its only out-of-band value.)
  *
  * The target is graft's native `lev_within` (EditDistanceWithin), not
  * Spark's own 3-arg `levenshtein`: both implement the identical
  * value contract, but the native form's prefix/suffix strip and
  * two-pointer k ≤ 1 path is ~20× cheaper per call on ASCII keys
  * (measured on the sf1 autojoin's 11 M candidate pairs), and in a
  * similarity self-join the per-pair distance IS the query cost — so
  * this rewrite is the difference between a feasible and an infeasible
  * blocked sim-join at corpus scale. It applies to any user query that
  * spells the predicate the natural way. An explicitly user-written
  * 3-arg `levenshtein(a, b, k)` is left untouched (it is the
  * independent ground-truth path ExtensionsSpec compares against).
  */
object BoundedLevenshteinRule extends Rule[LogicalPlan] {

  private def boundedGe0(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(graft.functions.EditDistanceWithin(a, b, Literal(k)), Literal(0))

  private def intBound(e: Expression): Option[Int] = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) if v >= 0 => Some(v)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // levenshtein(a,b) <= k  /  k >= levenshtein(a,b)
    case LessThanOrEqual(Levenshtein(a, b, None), rhs) if intBound(rhs).isDefined =>
      boundedGe0(a, b, intBound(rhs).get)
    case GreaterThanOrEqual(lhs, Levenshtein(a, b, None)) if intBound(lhs).isDefined =>
      boundedGe0(a, b, intBound(lhs).get)
    // levenshtein(a,b) < k  /  k > levenshtein(a,b)   (k >= 1)
    case LessThan(Levenshtein(a, b, None), rhs) if intBound(rhs).exists(_ >= 1) =>
      boundedGe0(a, b, intBound(rhs).get - 1)
    case GreaterThan(lhs, Levenshtein(a, b, None)) if intBound(lhs).exists(_ >= 1) =>
      boundedGe0(a, b, intBound(lhs).get - 1)
    // levenshtein(a,b) = k — bounded at k, exact match required
    case EqualTo(Levenshtein(a, b, None), rhs) if intBound(rhs).isDefined =>
      EqualTo(graft.functions.EditDistanceWithin(a, b, Literal(intBound(rhs).get)), rhs)
    case EqualTo(lhs, Levenshtein(a, b, None)) if intBound(lhs).isDefined =>
      EqualTo(lhs, graft.functions.EditDistanceWithin(a, b, Literal(intBound(lhs).get)))
    // bare levenshtein(a,b) in any other context (projections, ratio
    // arithmetic, non-literal comparisons): swap in the value-identical
    // native twin — prefix/suffix strip + byte DP on ASCII (the
    // transform is top-down, so comparison contexts above have already
    // been rewritten to the bounded form and never reach this case)
    case Levenshtein(a, b, None) => graft.functions.EditDistanceExact(a, b)
  }
}
