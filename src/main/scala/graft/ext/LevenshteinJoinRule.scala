package graft.ext

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: thresholded edit-distance θ-joins become segment-signature
  * equi-joins (banded prefilter + exact verify), automatically.
  *
  * `A join B on levenshtein(a, b) <= k` has no equi-key, so Spark plans a
  * nested-loop join — |A|·|B| bounded-DP evaluations, infeasible at corpus
  * scale. The hand-built escape is a blocked sim-join
  * (`graft.api.Search.blockedSimJoin`, cf. the reference's full scan at
  * fuzzy_search.py:54-60); this rule derives that shape for ANY user query
  * that spells the predicate the natural way, using a blocking key that is
  * SOUND for edit distance (substring blocks are not: an edit can change
  * any chosen block).
  *
  * Pigeonhole (PassJoin, Li et al., VLDB 2011): split `a` into k+1
  * contiguous segments; ≤ k edits can touch at most k of them, so some
  * segment survives VERBATIM in `b`, shifted by at most k positions (a
  * shift is one insertion/deletion before the segment). Therefore
  *
  *   explode A:  (len(a), i, segment_i(a))                 — k+1 rows
  *   explode B:  (lcand, i, substr(b, start_i(lcand)+δ, len_i(lcand)))
  *               for lcand ∈ len(b)±k, i ∈ 0..k, δ ∈ -k..k — (k+1)(2k+1)² rows
  *   equi-join on the triple, verify levenshtein(a, b, k) >= 0
  *
  * never loses a qualifying pair, and the join is hash-partitionable on the
  * segment string — the shape that survives 1000 executors. Output
  * multiplicity is exact: a pair may match on several (i, δ) coordinates,
  * so a row-local conjunct keeps only the lexicographically smallest
  * matching coordinate (unrolled — k is a literal), making each qualifying
  * (a-row, b-row) pair appear exactly once with NO dedup aggregate and no
  * reliance on row ids.
  *
  * Fires only when the join has no other equi-conjunct (else Spark already
  * hash-joins and the explode would only add cost) and k ≤
  * `spark.graft.levjoin.maxThreshold` (default 2 — right-side fanout is
  * (k+1)(2k+1)², i.e. 18× at k=1, 75× at k=2). Disable with
  * `spark.graft.levjoin.enabled=false`.
  *
  * Note: at k=2 the 75-struct explode exceeds janino's method-size limit,
  * so that one Generate stage falls back to interpreted eval (Spark logs a
  * WARN and continues) — still far cheaper than the nested-loop DP it
  * replaces; k=1 stays fully codegen'd.
  */
object LevenshteinJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.levjoin.enabled", "true").toBoolean
  private def maxK: Int =
    SQLConf.get.getConfString("spark.graft.levjoin.maxThreshold", "2").toInt

  /** floor((i*len)/(k+1)) on non-negative operands, as IntegerType. */
  private def segStart(len: Expression, i: Int, k: Int): Expression =
    Cast(new IntegralDivide(
      Multiply(Cast(len, LongType), Literal(i.toLong)), Literal((k + 1).toLong)),
      IntegerType)

  private def segLen(len: Expression, i: Int, k: Int): Expression =
    Subtract(segStart(len, i + 1, k), segStart(len, i, k))

  /** segment_i of `s` split into k+1 even chunks by its own length. */
  private def segment(s: Expression, len: Expression, i: Int, k: Int): Expression =
    Substring(s, Add(segStart(len, i, k), Literal(1)), segLen(len, i, k))

  /** substring of `b` at segment i's position (for source length lcand)
    * shifted by d; null when the shifted start falls before the string
    * (null never equi-matches and COALESCEs to no-match in verify). */
  private def shifted(b: Expression, lcand: Expression, i: Int, d: Int, k: Int): Expression = {
    val pos = Add(segStart(lcand, i, k), Literal(d + 1))
    If(GreaterThanOrEqual(pos, Literal(1)),
      Substring(b, pos, segLen(lcand, i, k)),
      Literal(null, StringType))
  }

  /** The predicate forms BoundedLevenshteinRule normalizes to (it runs in
    * the same fixed-point batch, so the unbounded spellings are already
    * rewritten by the time this rule matches). */
  private case class Trigger(a: Expression, b: Expression, k: Int, pred: Expression)
  private def trigger(e: Expression): Option[Trigger] = e match {
    case p @ GreaterThanOrEqual(
        Levenshtein(a, b, Some(Literal(k: Int, IntegerType))), Literal(0, IntegerType)) =>
      Some(Trigger(a, b, k, p))
    case p @ LessThanOrEqual(
        Literal(0, IntegerType), Levenshtein(a, b, Some(Literal(k: Int, IntegerType)))) =>
      Some(Trigger(a, b, k, p))
    case p @ EqualTo(
        Levenshtein(a, b, Some(Literal(k: Int, IntegerType))), Literal(m: Int, IntegerType))
        if m >= 0 && m <= k =>
      Some(Trigger(a, b, k, p))
    case p @ EqualTo(
        Literal(m: Int, IntegerType), Levenshtein(a, b, Some(Literal(k: Int, IntegerType))))
        if m >= 0 && m <= k =>
      Some(Trigger(a, b, k, p))
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
              // orient so `a` evaluates on the left plan, `b` on the right
              // (edit distance is symmetric, so swapping is free)
              val oriented =
                if (canEvaluate(t.a, left) && canEvaluate(t.b, right)) Some((t.a, t.b))
                else if (canEvaluate(t.b, left) && canEvaluate(t.a, right)) Some((t.b, t.a))
                else None
              oriented.collect {
                case (a, b) if t.k <= maxK && a.deterministic && b.deterministic &&
                    a.dataType == StringType && b.dataType == StringType =>
                  (a, b, t.k, c)
              }
            }
          }.nextOption()
        rewrite match {
          case None => j
          case Some((a, b, k, pred)) =>
            val residual = conjuncts.filterNot(_ eq pred)
            val lenA = Length(a)
            val lenB = Length(b)

            // left explode: one (i, segment) row per segment
            val lStructs = (0 to k).map { i =>
              CreateNamedStruct(Seq(
                Literal("i"), Literal(i),
                Literal("seg"), segment(a, lenA, i, k)))
            }
            val lGen = Explode(CreateArray(lStructs))
            val lField = lGen.elementSchema.head
            val lAttr = AttributeReference("__graft_lseg", lField.dataType, lField.nullable)()
            val leftG = Generate(lGen, Nil, outer = false, None, Seq(lAttr), left)

            // right explode: every (source-length, i, shift) candidate
            val rStructs = for {
              c <- -k to k; i <- 0 to k; d <- -k to k
            } yield {
              val lcand = Add(lenB, Literal(c))
              CreateNamedStruct(Seq(
                Literal("lcand"), lcand,
                Literal("i"), Literal(i),
                Literal("delta"), Literal(d),
                Literal("sub"), shifted(b, lcand, i, d, k)))
            }
            val rGen = Explode(CreateArray(rStructs))
            val rField = rGen.elementSchema.head
            val rAttr = AttributeReference("__graft_rseg", rField.dataType, rField.nullable)()
            val rightG = Generate(rGen, Nil, outer = false, None, Seq(rAttr), right)

            def lf(i: Int, n: String) = GetStructField(lAttr, i, Some(n))
            def rf(i: Int, n: String) = GetStructField(rAttr, i, Some(n))
            val keys = Seq(
              EqualTo(lf(0, "i"), rf(1, "i")),
              EqualTo(lf(1, "seg"), rf(3, "sub")),
              EqualTo(lenA, rf(0, "lcand")))

            // exact-once multiplicity: keep only the lexicographically
            // smallest matching (i, δ) coordinate for this pair — for every
            // smaller coordinate, require its (row-local) match to fail.
            val iRow = rf(1, "i")
            val dRow = rf(2, "delta")
            val minMatch = (for { i0 <- 0 to k; d0 <- -k to k } yield {
              val lexLt = Or(LessThan(Literal(i0), iRow),
                And(EqualTo(Literal(i0), iRow), LessThan(Literal(d0), dRow)))
              val matches = Coalesce(Seq(
                EqualTo(shifted(b, lenA, i0, d0, k), segment(a, lenA, i0, k)),
                Literal(false)))
              Or(Not(lexLt), Not(matches))
            }).toSeq

            val newCond = (keys ++ Seq(pred) ++ minMatch ++ residual).reduce(And)
            Project(j.output, Join(leftG, rightG, Inner, Some(newCond), JoinHint.NONE))
        }
    }
  }
}
