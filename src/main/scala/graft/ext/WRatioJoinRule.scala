package graft.ext

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import graft.functions.WRatio

/** Optimizer rule: thresholded WRatio θ-joins above the partial-leg
  * ceiling gain a SOUND length-scale equi-key, automatically.
  *
  * `A join B on wratio(a, b) >= t` has no equi-key, so Spark plans a
  * nested-loop join. The r8 analysis (JaroWinklerJoinRule's scaladoc)
  * deferred this leg because the partial-ratio windows admit no length
  * or content bound in general — a 3-char query can score 90 against a
  * 3000-char name. The key observation unlocking the rewrite WITHOUT
  * the once-proposed explicit length-cap conjunct: WRatio's own
  * dispatch DAMPS the partial legs.
  *
  *   - partial legs only exist on the lenRatio ≥ 1.5 branch, scaled by
  *     0.9 (or 0.6 beyond 8×) — their ceiling is exactly 90.0;
  *   - the full-ratio leg at score ≥ t bounds lev(a,b) ≤
  *     (1 − t/100)·max(|a|,|b|), hence min ≥ (t/100)·max — which for
  *     t > 90 forces lenRatio ≤ 100/t < 1.11 < 1.5, so the partial
  *     branch can't even be the dispatch taken by a full-leg winner;
  *   - the token-sort leg is a 0.95-damped full ratio of the
  *     token-SORTED strings, and splitting on a single space and
  *     rejoining with single spaces is LENGTH-PRESERVING (k separators
  *     stay k separators, empty tokens included), so |ts(x)| = |x| and
  *     score ≥ t bounds min ≥ (t/95)·max — stronger than the full
  *     leg's bound.
  *
  * Therefore for t > 90 every qualifying pair satisfies
  * min(|a|,|b|) ≥ α·max(|a|,|b|) with α = t/100, and the shared
  * geometric length-bucket machinery ([[LengthScaleRewrite]], the same
  * construction as the Jaro-Winkler rewrite) applies: explode one side
  * into its 5 candidate buckets, equi-join on the bucket, keep
  * `wratio(a,b) >= t` as the exact verify. Never worse than the nested
  * loop (verify unchanged, fanout 5); on length-diverse corpora every
  * cross-length-scale pair is pruned before the O(Δlen·min²) score
  * evaluates.
  *
  * At t ≤ 90 a partial leg CAN qualify with unbounded length ratio, so
  * the rule correctly declines — that regime would need the length-cap
  * conjunct (`wratio(a,b) >= t AND length(a) <= L` bounds the window
  * count) documented as this rule's extension path. Fires only on the
  * native [[WRatio]] node (`call_function("wratio", …)` / SQL
  * `wratio(x, y)`); the composed Column form in graft.api.Search is an
  * anonymous expression tree no rule can recognize. Disable with
  * `spark.graft.wratiojoin.enabled=false`.
  */
object WRatioJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.wratiojoin.enabled", "true").toBoolean

  /** Scores are 0-100; the partial-leg ceiling is exactly 90.0, so
    * soundness requires STRICTLY above it. */
  private val MinThreshold = 90.0

  private case class Trigger(a: Expression, b: Expression, t: Double, pred: Expression)
  private def trigger(e: Expression): Option[Trigger] = e match {
    case p @ GreaterThanOrEqual(WRatio(a, b), Literal(t: Double, DoubleType)) =>
      Some(Trigger(a, b, t, p))
    case p @ GreaterThan(WRatio(a, b), Literal(t: Double, DoubleType)) =>
      Some(Trigger(a, b, t, p))
    case p @ LessThanOrEqual(Literal(t: Double, DoubleType), WRatio(a, b)) =>
      Some(Trigger(a, b, t, p))
    case p @ LessThan(Literal(t: Double, DoubleType), WRatio(a, b)) =>
      Some(Trigger(a, b, t, p))
    case _ => None
  }

  private def sideEqui(c: Expression, left: LogicalPlan, right: LogicalPlan): Boolean = {
    def split(l: Expression, r: Expression): Boolean =
      l.references.nonEmpty && r.references.nonEmpty &&
        ((canEvaluate(l, left) && canEvaluate(r, right)) ||
          (canEvaluate(l, right) && canEvaluate(r, left)))
    c match {
      case EqualTo(l, r)       => split(l, r)
      case EqualNullSafe(l, r) => split(l, r)
      case _                   => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case j @ Join(left, right, jt, Some(cond), _) if jt == Inner || jt == Cross =>
        val conjuncts = splitConjunctivePredicates(cond)
        val rewrite =
          if (conjuncts.exists(sideEqui(_, left, right))) None
          else conjuncts.iterator.flatMap { c =>
            trigger(c).flatMap { t =>
              val oriented =
                if (canEvaluate(t.a, left) && canEvaluate(t.b, right)) Some((t.a, t.b))
                else if (canEvaluate(t.b, left) && canEvaluate(t.a, right)) Some((t.b, t.a))
                else None
              // t must stay strictly below 100: at t = 100 α = 1 and
              // the bucket base degenerates (LengthScaleRewrite's
              // MinLogAlpha also guards the near-100 regime).
              oriented.collect {
                case (a, b) if t.t > MinThreshold && t.t < 100.0 &&
                    a.deterministic && b.deterministic &&
                    a.dataType == StringType && b.dataType == StringType =>
                  (a, b, t.t, c)
              }
            }
          }.nextOption()
        rewrite match {
          case None => j
          case Some((a, b, t, pred)) =>
            LengthScaleRewrite.rewrite(j, left, right, a, b, t / 100.0,
              pred, conjuncts, "__graft_wrbk").getOrElse(j)
        }
    }
  }
}
