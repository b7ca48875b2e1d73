package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: the DECLARATIVE Hamming near-dup join, made scalable.
  *
  * A user writes the textbook form —
  * {{{
  *   a.crossJoin(b).filter(bit_count(a("fp") ^ b("fp")) <= k && ...)
  * }}}
  * — and as written it plans as a cartesian/BNLJ: O(|a|·|b|) comparisons,
  * the shape every PlanSpec sweep in this repo forbids. The pigeonhole
  * principle gives the standard escape (Manku et al., WWW'07): split the
  * fingerprint into k+1 disjoint bit bands — any pair within Hamming k
  * agrees EXACTLY on at least one band — and join band-equal candidates
  * only. [[graft.operators.Dedup.hammingNearDupPairs]] hand-builds that
  * plan; this rule derives it FROM THE NAIVE FORM, so the declarative
  * query gets the banded physical shape without the author knowing the
  * trick.
  *
  * Rewrite: `σ_cond(A ×ᵢₙₙₑᵣ B)` where cond contains the conjunct
  * `bit_count(fpA ⊕ fpB) ≤ k` becomes
  * {{{
  *   UNION_{i=0..k}  A ⋈ B  ON  band_i(fpA) = band_i(fpB)
  *                          AND ∀j<i band_j(fpA) ≠ band_j(fpB)
  *                          AND cond
  * }}}
  * Each qualifying pair lands in EXACTLY one branch (its first agreeing
  * band), so multiplicity is preserved bit-for-bit — no dedup stage, the
  * rewrite is output-identical for ANY projected columns, and NULL
  * fingerprints drop in every branch exactly as the naive filter drops
  * them. Each branch's band equality is an equi-key, so the planner picks
  * shuffled hash joins: O((k+1)·band-collisions) instead of O(n²).
  *
  * Guards: fires only where the join would otherwise be all-pairs (no
  * existing equi-conjunct between the sides — also what makes the rule
  * idempotent, since rewritten branches carry band equalities), only for
  * int/long fingerprints of the same type, only for literal k in
  * [0, maxHamming=8] (k+1 branches — beyond that the union fan-out
  * outgrows its benefit and the caller should band explicitly), and only
  * for deterministic conditions.
  */
object HammingJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Branch-count bound: k ≤ 8 ⇒ ≤ 9 equi-join branches. */
  val MaxHamming = 8

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, Join(l, r, Inner | Cross, None, hint)) =>
      tryRewrite(l, r, cond, hint).getOrElse(f)
    // PushDownPredicates may fold the filter into the join condition before
    // this rule sees it (both orders occur inside the fixed-point batch);
    // Cross+cond ≡ Inner+cond, so one rewrite covers both.
    case j @ Join(l, r, Inner | Cross, Some(cond), hint) =>
      tryRewrite(l, r, cond, hint).getOrElse(j)
  }

  private def tryRewrite(
      l: LogicalPlan, r: LogicalPlan, cond: Expression,
      hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint)
      : Option[LogicalPlan] = {
    if (!cond.deterministic) return None
    val conjuncts = splitConjunctivePredicates(cond)
    // already equi-joinable between the sides? then the planner hash-joins
    // as-is and the rewrite would only add branches (also: idempotence).
    val hasEquiKey = conjuncts.exists {
      case EqualTo(a, b) => splitsSides(a, b, l, r).isDefined
      case EqualNullSafe(a, b) => splitsSides(a, b, l, r).isDefined
      case _ => false
    }
    if (hasEquiKey) return None
    conjuncts.iterator.flatMap(hammingBound(_, l, r)).nextOption()
      .map { case (fpL, fpR, k, bits) =>
        val widths = bandWidths(bits, k + 1)
        val offsets = widths.scanLeft(0)(_ + _).init
        def band(e: Expression, w: Int, off: Int): Expression = {
          val asLong =
            if (e.dataType == LongType) e
            else Cast(e, LongType)
          val masked =
            if (bits == 64) asLong
            else BitwiseAnd(asLong, Literal((1L << bits) - 1))
          val shifted = ShiftRightUnsigned(masked, Literal(off))
          if (w == 64) shifted
          else BitwiseAnd(shifted, Literal((1L << w) - 1))
        }
        val bandEqs = widths.zip(offsets).map { case (w, off) =>
          EqualTo(band(fpL, w, off), band(fpR, w, off))
        }
        val branches = bandEqs.zipWithIndex.map { case (eq, i) =>
          val firstAgree = bandEqs.take(i)
            .foldLeft(eq: Expression)((acc, prev) => And(acc, Not(prev)))
          Join(l, r, Inner, Some(And(firstAgree, cond)), hint)
        }
        if (branches.length == 1) branches.head else Union(branches)
      }
  }

  /** Matches `bit_count(a ⊕ b) ≤ k` / `< k+1` with a/b on opposite sides;
    * returns (leftSideFp, rightSideFp, k, bits). */
  private def hammingBound(e: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[(Expression, Expression, Int, Int)] = {
    val bound = e match {
      case LessThanOrEqual(bc: BitwiseCount, Literal(k: Int, IntegerType)) =>
        Some((bc, k))
      case LessThanOrEqual(bc: BitwiseCount, Literal(k: Long, LongType)) if k <= Int.MaxValue =>
        Some((bc, k.toInt))
      case LessThan(bc: BitwiseCount, Literal(k: Int, IntegerType)) if k >= 1 =>
        Some((bc, k - 1))
      case LessThan(bc: BitwiseCount, Literal(k: Long, LongType)) if k >= 1 && k <= Int.MaxValue =>
        Some((bc, k.toInt - 1))
      case _ => None
    }
    bound.flatMap { case (bc, k) =>
      bc.child match {
        case BitwiseXor(a, b) if a.dataType == b.dataType &&
            (a.dataType == LongType || a.dataType == IntegerType) =>
          val bits = if (a.dataType == LongType) 64 else 32
          if (k < 0 || k > MaxHamming || k >= bits) None
          else splitsSides(a, b, l, r).map { case (fpL, fpR) => (fpL, fpR, k, bits) }
        case _ => None
      }
    }
  }

  /** Orients (a, b) so the first result references only `l` and the second
    * only `r`; None when either straddles both sides. */
  private def splitsSides(a: Expression, b: Expression,
      l: LogicalPlan, r: LogicalPlan): Option[(Expression, Expression)] =
    if (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet))
      Some((a, b))
    else if (b.references.subsetOf(l.outputSet) && a.references.subsetOf(r.outputSet))
      Some((b, a))
    else None

  private def bandWidths(bits: Int, bands: Int): Seq[Int] = {
    val base = bits / bands
    val rem = bits % bands
    Seq.tabulate(bands)(i => if (i < rem) base + 1 else base)
  }
}
