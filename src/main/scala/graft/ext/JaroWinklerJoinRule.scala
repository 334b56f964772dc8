package graft.ext

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._
import graft.functions.JaroWinkler

/** Optimizer rule: thresholded Jaro-Winkler θ-joins gain a SOUND
  * length-bucket equi-key, automatically.
  *
  * `A join B on jaro_winkler(a, b) >= t` has no equi-key, so Spark plans
  * a nested-loop join. Unlike edit distance, Jaro-Winkler admits NO
  * content-signature blocking that is both sound and skew-proof:
  *  - the Winkler prefix boost is OPTIONAL (a high-scoring pair may
  *    share no prefix at all — "xbcdefghij…" vs "abcdefghij…" scores
  *    above 0.95 at length 20), so prefix blocks are unsound;
  *  - Jaro matches chars across a ±(max/2 − 1) window in ANY order, so
  *    no contiguous segment survives verbatim (PassJoin-style segment
  *    signatures are unsound) and matched chars need not form a common
  *    subsequence (no reduction to bounded indel/levenshtein — the
  *    machinery of [[LevenshteinJoinRule]] does not transfer);
  *  - the remaining sound content filter (multiset-overlap prefix
  *    filtering à la PPJoin on rarity-ordered characters) keys on
  *    SINGLE characters: over real-world small alphabets each key
  *    captures a constant fraction of the corpus, which is exactly the
  *    hot-key degeneration a rewrite must avoid.
  *
  * What IS sound, cheap, and never worse: a LENGTH filter. With the
  * textbook constants (boost 0.1·p·(1−jaro), p ≤ 4 — so
  * jw ≤ 0.6·jaro + 0.4):
  *
  *   jw(a,b) ≥ t  ⟹  jaro ≥ j := (t − 0.4) / 0.6
  *                ⟹  m/|a| ≥ 3j − 2  and  m/|b| ≥ 3j − 2  (other Jaro
  *                    terms are ≤ 1), with m ≤ min(|a|,|b|)
  *                ⟹  min(|a|,|b|) ≥ α·max(|a|,|b|),  α := 3j − 2.
  *
  * Bucketing lengths geometrically with base 1/α, a qualifying pair's
  * buckets differ by at most 1 (exact arithmetic; ±2 is carried for
  * floating-point slop at bucket boundaries). The rewrite explodes one
  * side into its 5 candidate buckets (constant fanout, each bucket
  * value distinct — multiplicity exactly 1) and equi-joins on the
  * bucket, keeping the original predicate as the exact verify:
  *
  *   explode A: (bucket(|a|) + d, d ∈ −2..2)
  *   equi-join on bucket = bucket(|b|); verify jaro_winkler(a,b) ≥ t.
  *
  * On length-DIVERSE corpora (the reference's person/work labels run
  * 1..200+ chars) this prunes every cross-length-scale pair and turns
  * the nested loop into a shuffled hash join; on a fixed-length corpus
  * (synthetic ids) every row lands in one bucket and the join
  * gracefully degenerates to the scan it replaced — never worse than
  * the nested loop, because the verify predicate is unchanged and the
  * fanout is 5.
  *
  * Fires when t ≥ `spark.graft.jwjoin.minThreshold` (default 0.9 —
  * below it α < 1/2 and the buckets are too coarse to pay for the
  * explode) and the join has no other equi-conjunct. Disable with
  * `spark.graft.jwjoin.enabled=false`.
  *
  * The third fuzzy leg, WRatio, has its own rewrite since r9: the
  * native [[graft.functions.WRatio]] node makes the θ-predicate
  * matchable, and its dispatch's partial-leg damping makes the same
  * length-scale bucket sound for t > 90 — see [[WRatioJoinRule]].
  */
object JaroWinklerJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.jwjoin.enabled", "true").toBoolean
  private def minT: Double =
    SQLConf.get.getConfString("spark.graft.jwjoin.minThreshold", "0.9").toDouble

  private case class Trigger(a: Expression, b: Expression, t: Double, pred: Expression)
  private def trigger(e: Expression): Option[Trigger] = e match {
    case p @ GreaterThanOrEqual(JaroWinkler(a, b), Literal(t: Double, DoubleType)) =>
      Some(Trigger(a, b, t, p))
    case p @ GreaterThan(JaroWinkler(a, b), Literal(t: Double, DoubleType)) =>
      Some(Trigger(a, b, t, p))
    case p @ LessThanOrEqual(Literal(t: Double, DoubleType), JaroWinkler(a, b)) =>
      Some(Trigger(a, b, t, p))
    case p @ LessThan(Literal(t: Double, DoubleType), JaroWinkler(a, b)) =>
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
              // t must stay strictly below 1.0: at t = 1.0 α = 1,
              // ln(1/α) = 0, and the bucket expression degenerates to
              // x/0 — one shared Infinity bucket for every row, i.e.
              // the whole corpus on a single shuffle key. An exact-
              // match join (jw ≥ 1.0) is better served by the plain
              // nested loop (or an equality the user should spell).
              oriented.collect {
                case (a, b) if t.t >= minT && t.t < 1.0 &&
                    a.deterministic && b.deterministic &&
                    a.dataType == StringType && b.dataType == StringType =>
                  (a, b, t.t, c)
              }
            }
          }.nextOption()
        rewrite match {
          case None => j
          case Some((a, b, t, pred)) =>
            val jmin = (t - 0.4) / 0.6
            val alpha = 3.0 * jmin - 2.0
            // Shared exploded-bucket machinery (LongType buckets,
            // degenerate-α fallback — see LengthScaleRewrite).
            LengthScaleRewrite.rewrite(j, left, right, a, b, alpha,
              pred, conjuncts, "__graft_jwbk").getOrElse(j)
        }
    }
  }
}
