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
  * The third fuzzy leg, WRatio, is a composed Column expression (three
  * scored legs over levenshtein and substrings), not a single Catalyst
  * node — no θ-predicate to pattern-match. Its ratio legs DO bound the
  * indel distance, but only through the per-row max length
  * (d ≤ (1−r)·(|a|+|b|)), and the signature machinery needs a literal
  * k: a constant-k trigger exists only under an explicit length-cap
  * conjunct, which is the documented extension path if a WRatio θ-join
  * ever becomes a real workload.
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

  /** floor(ln(max(len,1)) / ln(1/α)) as LongType. Long, not Int: for
    * thresholds within ~5e-10 of 1.0, α → 1 and ln(1/α) → 0⁺, so the
    * quotient can exceed Int range — a 32-bit cast would wrap (non-ANSI)
    * or error (ANSI), and wrapped buckets straddling the Int boundary
    * silently break the |Δbucket| ≤ 2 contract. No realistic
    * length/threshold pair escapes Long range (Spark's double→long cast
    * saturates rather than wraps even if one did), and [[MinLogAlpha]]
    * rejects the degenerate-α regime before it gets here. */
  private def bucket(s: Expression, alpha: Double): Expression =
    Cast(Floor(Divide(
      Log(Cast(Greatest(Seq(Length(s), Literal(1))), DoubleType)),
      Literal(math.log(1.0 / alpha)))), LongType)

  /** Smallest usable ln(1/α): below this every length lands in one
    * astronomically-numbered bucket (the whole corpus on one shuffle
    * key) — fall back to the unrewritten join instead. Corresponds to
    * thresholds within ~2e-8 of 1.0; t = 0.999 gives ln(1/α) ≈ 5e-3,
    * three orders above the floor. */
  private val MinLogAlpha = 1e-6

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
            if (alpha <= 0.0 || math.log(1.0 / alpha) < MinLogAlpha) j
            else {
              val residual = conjuncts.filterNot(_ eq pred)
              // Explode the left side into its 5 candidate buckets.
              val bk = AttributeReference("__graft_jwbk", LongType,
                nullable = false)()
              val cands = (-2 to 2).map(d =>
                Add(bucket(a, alpha), Literal(d.toLong)))
              val leftG = Generate(Explode(CreateArray(cands)),
                Nil, outer = false, None, Seq(bk), left)
              val newCond = (Seq(
                EqualTo(bk, bucket(b, alpha)), pred) ++ residual).reduce(And)
              Project(j.output, Join(leftG, right, Inner, Some(newCond), JoinHint.NONE))
            }
        }
    }
  }
}
