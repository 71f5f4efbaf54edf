package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Max}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftOuter, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Catalyst optimizer rule: recognize a naively-written interval join
  *
  *   a.join(b, keyEq && a.Start < b.End && b.Start < a.End)
  *
  * — which Spark would otherwise plan as a per-key nested loop (quadratic
  * on hot keys) — and rewrite it into the binned range join: explode both
  * sides into fixed-width bins (Generate nodes), equi-join on the bin,
  * keep the original predicates, and dedupe shuffle-free with the
  * greatest-start-bin trick (same plan RangeJoin.pairs builds by hand,
  * SURVEY.md §4.3). Users opt in per session:
  *
  *   spark.experimental.extraOptimizations ++= Seq(IntervalJoinRewrite)
  *
  * (or globally via GraftExtensions / spark.sql.extensions).
  *
  * Covers Inner, LeftSemi and LeftAnti joins. Inner preserves the join's
  * output exactly (a Project restores the original attribute list).
  * Semi/anti can't explode the probe side naively — a left row spanning
  * B bins would come back up to B times — so the rewrite tags each left
  * row with a rid (monotonically_increasing_id, the same row-identity
  * contract RangeJoin.exists uses), runs the binned join, and collapses
  * on the rid: semi = Aggregate over the binned INNER pairs; anti =
  * binned LEFT OUTER + max(matched)=false filter. Both keep duplicate
  * left rows at their original multiplicity (distinct rids) and emit
  * each surviving row exactly once. Fires only on joins whose range
  * bounds are integral attributes; idempotent (skips joins already
  * carrying a graft bin attribute).
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Bin width: tunable per session without recompiling —
    * `SET spark.graft.binSize=1024` (e.g. to the value
    * `RangeJoin.autoBinSize` reports for the workload's tables). */
  private def binSize: Long =
    conf.getConfString("spark.graft.binSize", "256").toLong
  private val BIN_PREFIX = "_graft_bin_"

  private def floorDiv(x: Expression, b: Long): Expression =
    Cast(Floor(Divide(Cast(x, DoubleType), Literal(b.toDouble))), LongType)

  private def isIntegralAttr(e: Expression, side: LogicalPlan): Boolean = e match {
    case a: AttributeReference =>
      side.outputSet.contains(a) &&
        (a.dataType == LongType || a.dataType.isInstanceOf[org.apache.spark.sql.types.IntegerType])
    case _ => false
  }

  /** The two cross-side range bounds (lStart < rEnd, rStart < lEnd), if
    * this condition is an interval-overlap join with an equi key. */
  private def intervalShape(cond: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[(Seq[Expression], Expression, Expression, Expression, Expression)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val lts = conjuncts.collect {
      case LessThan(a, b)    => (a, b)
      case GreaterThan(a, b) => (b, a)
    }
    val p1 = lts.find { case (a, b) => isIntegralAttr(a, l) && isIntegralAttr(b, r) }
    val p2 = lts.find { case (a, b) => isIntegralAttr(a, r) && isIntegralAttr(b, l) }
    val hasEqui = conjuncts.exists {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        (l.outputSet.contains(a) && r.outputSet.contains(b)) ||
          (l.outputSet.contains(b) && r.outputSet.contains(a))
      case _ => false
    }
    (p1, p2) match {
      case (Some((lStart, rEnd)), Some((rStart, lEnd))) if hasEqui =>
        Some((conjuncts, lStart, lEnd, rStart, rEnd))
      case _ => None
    }
  }

  // The stop bound is clamped to >= the start bound so degenerate rows
  // (End <= Start, or coincidental '<' predicates over unrelated columns)
  // explode into exactly one bin instead of raising 'Illegal sequence
  // boundaries'. Exactness survives the clamp: for any pair satisfying
  // (lStart < rEnd && rStart < lEnd) the dedup bin
  // floor(max(lStart, rStart)/binSize) lies within both sides' clamped
  // bin ranges, and all original predicates are retained, so no pair is
  // gained or lost.
  private def seqExpr(s: Expression, e: Expression): Explode = {
    val lo = floorDiv(s, binSize)
    val hi = floorDiv(Subtract(Cast(e, LongType), Literal(1L)), binSize)
    Explode(new Sequence(lo, Greatest(Seq(lo, hi)),
      Some(Literal(1L))).withTimeZone(conf.sessionLocalTimeZone))
  }

  /** Binned join condition: original predicates + bin equality + the
    * pair-dedup predicate (each matching pair meets in exactly one bin). */
  private def binnedCond(conjuncts: Seq[Expression], binL: Attribute,
                         binR: Attribute, lStart: Expression,
                         rStart: Expression): Expression =
    (conjuncts :+ EqualTo(binL, binR) :+ EqualTo(binL,
      floorDiv(Greatest(Seq(Cast(lStart, LongType), Cast(rStart, LongType))),
        binSize))).reduce(And)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), hint)
        if !cond.references.exists(_.name.startsWith(BIN_PREFIX)) =>
      intervalShape(cond, l, r) match {
        case Some((conjuncts, lStart, lEnd, rStart, rEnd)) =>
          val binL = AttributeReference(BIN_PREFIX + "l", LongType, nullable = false)()
          val binR = AttributeReference(BIN_PREFIX + "r", LongType, nullable = false)()
          val lGen = Generate(seqExpr(lStart, lEnd), Nil, outer = false, None, Seq(binL), l)
          val rGen = Generate(seqExpr(rStart, rEnd), Nil, outer = false, None, Seq(binR), r)
          val newCond = binnedCond(conjuncts, binL, binR, lStart, rStart)
          Project(j.output, Join(lGen, rGen, Inner, Some(newCond), hint))
        case None => j
      }

    case j @ Join(l, r, jt @ (LeftSemi | LeftAnti), Some(cond), _)
        if !cond.references.exists(_.name.startsWith(BIN_PREFIX)) =>
      intervalShape(cond, l, r) match {
        case Some((conjuncts, lStart, lEnd, rStart, rEnd)) =>
          val ridAlias = Alias(MonotonicallyIncreasingID(), "_graft_rid")()
          val lRid = Project(l.output :+ ridAlias, l)
          val rid = ridAlias.toAttribute
          val binL = AttributeReference(BIN_PREFIX + "l", LongType, nullable = false)()
          val binR = AttributeReference(BIN_PREFIX + "r", LongType, nullable = false)()
          val lGen = Generate(seqExpr(lStart, lEnd), Nil, outer = false, None, Seq(binL), lRid)
          val rGen = Generate(seqExpr(rStart, rEnd), Nil, outer = false, None, Seq(binR), r)
          val newCond = binnedCond(conjuncts, binL, binR, lStart, rStart)
          if (jt == LeftSemi) {
            // each matching (leftRow, rightRow) pair survives the dedup
            // predicate exactly once; collapsing on the rid yields each
            // matched left row exactly once, duplicates preserved
            val pairs = Join(lGen, rGen, Inner, Some(newCond), JoinHint.NONE)
            Project(j.output, Aggregate(rid +: l.output, l.output, pairs))
          } else {
            // anti: keep every left bin-copy (LeftOuter), flag per-copy
            // matches, collapse per rid, keep rows where no copy matched
            val outerJ = Join(lGen, rGen, LeftOuter, Some(newCond), JoinHint.NONE)
            val flag = Alias(AggregateExpression(
              Max(IsNotNull(binR)), Complete, isDistinct = false), "_graft_matched")()
            val agg = Aggregate(rid +: l.output, l.output :+ flag, outerJ)
            val matched = flag.toAttribute
            Project(j.output, Filter(Not(matched), agg))
          }
        case None => j
      }
  }
}
