package graft.ext

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: thresholded edit-distance θ-joins become signature
  * equi-joins (banded prefilter + exact verify), automatically.
  *
  * `A join B on levenshtein(a, b) <= k` has no equi-key, so Spark plans a
  * nested-loop join — |A|·|B| bounded-DP evaluations, infeasible at corpus
  * scale. The hand-built escape is a blocked sim-join
  * (`graft.api.Search.blockedSimJoin`, cf. the reference's full scan at
  * fuzzy_search.py:54-60); this rule derives that shape for ANY user query
  * that spells the predicate the natural way, using a blocking key that is
  * SOUND for edit distance (substring blocks are not: an edit can change
  * any chosen block). Two signature schemes, picked by
  * `spark.graft.levjoin.strategy` (auto | deletion | segment):
  *
  * **Deletion neighborhood** (k = 1; FastSS, Bocek et al. 2007, after
  * Mor & Fraenkel 1982): sigs(s) = {s} ∪ {s minus char i : i a run
  * start}. Two strings at distance ≤ 1 share a signature (substitution at
  * p: delete p from both; indel: the shorter string IS a deletion
  * signature of the longer), and restricting to run starts enumerates
  * each DISTINCT one-deletion neighbor exactly once, which makes the
  * shared distinct signature UNIQUE for every pair at distance exactly 1
  * (equal pairs share everything and are pinned to the identity×identity
  * coordinate by a row-local conjunct). So
  *
  *   explode both sides: (pos ∈ {-1} ∪ run-starts, sig)   — ≤ len+1 rows
  *   equi-join on sig; keep (pos_a = pos_b = -1) iff a = b;
  *   verify levenshtein(a, b, 1) >= 0
  *
  * emits each qualifying pair exactly once with no dedup aggregate. The
  * key is a near-unique string, so the join stays selective even when the
  * whole corpus shares a long literal prefix (ids, URLs, "customer#…") —
  * the distribution where positional segments collapse to one hot key and
  * the equi-join degenerates to the |A|·|B| scan it was meant to replace
  * (caught by the sf1 scale checkpoint). Cost: ~runs(s)+1 explode rows of
  * ~len bytes each, i.e. O(len²) shuffle bytes per row — the right trade
  * for short join keys; for long strings force `segment`.
  *
  * **Positional segments** (k ≥ 2; PassJoin, Li et al., VLDB 2011): split
  * `a` into k+1 contiguous segments; ≤ k edits leave some segment
  * surviving VERBATIM in `b`, shifted by at most k positions. Therefore
  *
  *   explode A:  (len(a), i, segment_i(a))                 — k+1 rows
  *   explode B:  (lcand, i, substr(b, start_i(lcand)+δ, len_i(lcand)))
  *               for lcand ∈ len(b)±k, i ∈ 0..k, δ ∈ -k..k — (k+1)(2k+1)² rows
  *   equi-join on the triple, verify levenshtein(a, b, k) >= 0
  *
  * with exact output multiplicity: a pair may match on several (i, δ)
  * coordinates, so a row-local conjunct keeps only the lexicographically
  * smallest matching coordinate (unrolled — k is a literal). Explode
  * fanout is constant and each signature is ~len/(k+1) bytes — O(len)
  * shuffle bytes per row — but positional segments inherit the corpus's
  * entropy: a shared prefix puts every row in one bucket.
  *
  * Fires only when the join has no other equi-conjunct (else Spark already
  * hash-joins and the explode would only add cost) and k ≤
  * `spark.graft.levjoin.maxThreshold` (default 2). Disable with
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
  /** auto → deletion for k=1 (skew-proof), segment for k≥2. */
  private def strategy: String =
    SQLConf.get.getConfString("spark.graft.levjoin.strategy", "auto")

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

  /** The predicate forms BoundedLevenshteinRule normalizes to — the
    * native `lev_within` node — plus the explicitly user-spelled 3-arg
    * `levenshtein` (left untouched by that rule but an equally valid
    * trigger). Runs in the same fixed-point batch, so the unbounded
    * spellings are already rewritten by the time this rule matches.
    * `upperBound` records whether the predicate accepts EVERY distance
    * ≤ k (the `>= 0` forms) — only then may the deletion rewrite's
    * positional fast guard bypass the verify DP; the `= m` forms pin an
    * exact distance that construction alone can't certify. */
  private case class Trigger(a: Expression, b: Expression, k: Int,
      pred: Expression, upperBound: Boolean)
  private def bounded(e: Expression): Option[(Expression, Expression, Int)] = e match {
    case Levenshtein(a, b, Some(Literal(k: Int, IntegerType))) => Some((a, b, k))
    case graft.functions.EditDistanceWithin(a, b, Literal(k: Int, IntegerType)) =>
      Some((a, b, k))
    case _ => None
  }
  private def trigger(e: Expression): Option[Trigger] = e match {
    case p @ GreaterThanOrEqual(l, Literal(0, IntegerType)) if bounded(l).isDefined =>
      val (a, b, k) = bounded(l).get
      Some(Trigger(a, b, k, p, upperBound = true))
    case p @ LessThanOrEqual(Literal(0, IntegerType), r) if bounded(r).isDefined =>
      val (a, b, k) = bounded(r).get
      Some(Trigger(a, b, k, p, upperBound = true))
    case p @ EqualTo(l, Literal(m: Int, IntegerType)) if bounded(l).exists(t => m >= 0 && m <= t._3) =>
      val (a, b, k) = bounded(l).get
      Some(Trigger(a, b, k, p, upperBound = false))
    case p @ EqualTo(Literal(m: Int, IntegerType), r) if bounded(r).exists(t => m >= 0 && m <= t._3) =>
      val (a, b, k) = bounded(r).get
      Some(Trigger(a, b, k, p, upperBound = false))
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
                  (a, b, t.k, c, t.upperBound)
              }
            }
          }.nextOption()
        rewrite match {
          case None => j
          case Some((a, b, k, pred, upperBound)) =>
            val residual = conjuncts.filterNot(_ eq pred)
            val useDeletion = strategy match {
              case "deletion" => k == 1
              case "segment"  => false
              case _          => k == 1 // auto
            }
            if (useDeletion)
              deletionRewrite(j, left, right, a, b, pred, upperBound, residual)
            else
              segmentRewrite(j, left, right, a, b, k, pred, residual)
        }
    }
  }

  /** One side of the deletion-neighborhood join: explode `s` into
    * (pos, sig) rows — pos = -1 carries the identity signature (sig = s),
    * pos = i ≥ 0 the string minus its i-th char, generated only at run
    * starts (i = 0 or s[i] ≠ s[i-1]) so each distinct neighbor appears
    * exactly once. A null `s` explodes to no rows (inner-join semantics).
    */
  private def deletionSide(plan: LogicalPlan, s: Expression, tag: String)
      : (LogicalPlan, Attribute, Attribute) = {
    val pos = AttributeReference(s"__graft_${tag}pos", IntegerType, nullable = false)()
    // timeZoneId must be pre-filled: the analyzer's ResolveTimeZone has
    // already run, and an unresolved TimeZoneAwareExpression fails the
    // optimizer's plan-validation (integer sequences never consult it).
    val gen = Generate(
      Explode(Sequence(Literal(-1), Subtract(Length(s), Literal(1)), None,
        Some(SQLConf.get.sessionLocalTimeZone))),
      Nil, outer = false, None, Seq(pos), plan)
    val runStart = Or(LessThanOrEqual(pos, Literal(0)),
      Not(EqualTo(Substring(s, Add(pos, Literal(1)), Literal(1)),
        Substring(s, pos, Literal(1)))))
    val sig = If(EqualTo(pos, Literal(-1)), s,
      Concat(Seq(Substring(s, Literal(1), pos),
        Substring(s, Add(pos, Literal(2)), Length(s)))))
    val sigAl = Alias(sig, s"__graft_${tag}sig")()
    val proj = Project(plan.output ++ Seq(pos, sigAl), Filter(runStart, gen))
    (proj, pos, sigAl.toAttribute)
  }

  private def deletionRewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      a: Expression, b: Expression, pred: Expression, upperBound: Boolean,
      residual: Seq[Expression]): LogicalPlan = {
    val (leftD, lpos, lsig) = deletionSide(left, a, "l")
    val (rightD, rpos, rsig) = deletionSide(right, b, "r")
    // Equal pairs share every signature; pin them to the identity
    // coordinate. Distance-1 pairs share exactly ONE distinct signature
    // (substitution at p: all matching deletion coordinates produce the
    // same string delete(a,p) = delete(b,p); indel: the one run-start
    // deletion of the longer side), so no further dedup is needed; the
    // verify predicate rejects distance ≥ 2 signature collisions.
    val eqPin = Or(Not(EqualTo(a, b)),
      And(EqualTo(lpos, Literal(-1)), EqualTo(rpos, Literal(-1))))
    // Positional fast guard (upper-bound predicates only): the matched
    // coordinate can certify distance ≤ 1 WITHOUT the DP —
    //   lpos = rpos = -1:  sig equality is a = b, distance 0;
    //   exactly one side -1:  identity = one-deletion of the other,
    //     distance exactly 1 (lengths differ by 1);
    //   lpos = rpos = p ≥ 0:  delete(a,p) = delete(b,p) means a and b
    //     agree everywhere except possibly position p — distance ≤ 1.
    // Only cross-position deletion collisions (lpos ≠ rpos, both ≥ 0,
    // distance ≤ 2 but possibly 2) still pay the bounded DP. On the sf1
    // autojoin that skips the verify for all 3.3 M true matches and runs
    // it only on the 7.7 M cross-position candidates. An exact-distance
    // predicate (lev = m) can't use the ≤-certificate, so it keeps the
    // full verify.
    val verify =
      if (upperBound)
        Or(Or(EqualTo(lpos, rpos),
          Or(EqualTo(lpos, Literal(-1)), EqualTo(rpos, Literal(-1)))), pred)
      else pred
    // Leading 64-bit hash equi-key: implied by sig equality (so the
    // candidate set and multiplicity argument are untouched — this is
    // NOT hash-only joining), but it puts a long first in the join key,
    // so the exchange partitions and the sort-merge compares resolve on
    // 8 bytes instead of walking two ~len-byte strings that share the
    // corpus's literal prefix.
    val sigHash = EqualTo(XxHash64(Seq(lsig), 42L), XxHash64(Seq(rsig), 42L))
    val newCond =
      (Seq(sigHash, EqualTo(lsig, rsig), verify, eqPin) ++ residual).reduce(And)
    Project(j.output, Join(leftD, rightD, Inner, Some(newCond), JoinHint.NONE))
  }

  private def segmentRewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      a: Expression, b: Expression, k: Int, pred: Expression,
      residual: Seq[Expression]): LogicalPlan = {
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
