package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
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
  * The rewrite preserves the join's output exactly (a Project restores
  * the original attribute list). Fires only on Inner joins whose range
  * bounds are integral attributes; idempotent (skips joins already
  * carrying a graft bin attribute).
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val binSize: Long = 256
  private val BIN_PREFIX = "_graft_bin_"

  private def floorDiv(x: Expression, b: Long): Expression =
    Cast(Floor(Divide(Cast(x, DoubleType), Literal(b.toDouble))), LongType)

  private def isIntegralAttr(e: Expression, side: LogicalPlan): Boolean = e match {
    case a: AttributeReference =>
      side.outputSet.contains(a) &&
        (a.dataType == LongType || a.dataType.isInstanceOf[org.apache.spark.sql.types.IntegerType])
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), hint)
        if !cond.references.exists(_.name.startsWith(BIN_PREFIX)) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // normalize every strict comparison to LessThan(a, b)
      val lts = conjuncts.collect {
        case LessThan(a, b)    => (a, b)
        case GreaterThan(a, b) => (b, a)
      }
      // lStart < rEnd  and  rStart < lEnd
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
          val binL = AttributeReference(BIN_PREFIX + "l", LongType, nullable = false)()
          val binR = AttributeReference(BIN_PREFIX + "r", LongType, nullable = false)()
          // The stop bound is clamped to >= the start bound so degenerate
          // rows (End <= Start, or coincidental '<' predicates over
          // unrelated columns) explode into exactly one bin instead of
          // raising 'Illegal sequence boundaries'. Exactness survives the
          // clamp: for any pair satisfying (lStart < rEnd && rStart < lEnd)
          // the dedup bin floor(max(lStart, rStart)/binSize) lies within
          // both sides' clamped bin ranges, and all original predicates
          // are retained, so no pair is gained or lost.
          def seqExpr(s: Expression, e: Expression) = {
            val lo = floorDiv(s, binSize)
            val hi = floorDiv(Subtract(Cast(e, LongType), Literal(1L)), binSize)
            Explode(new Sequence(lo, Greatest(Seq(lo, hi)),
              Some(Literal(1L))).withTimeZone(conf.sessionLocalTimeZone))
          }
          val lGen = Generate(seqExpr(lStart, lEnd), Nil, outer = false, None, Seq(binL), l)
          val rGen = Generate(seqExpr(rStart, rEnd), Nil, outer = false, None, Seq(binR), r)
          val dedup = EqualTo(binL,
            floorDiv(Greatest(Seq(Cast(lStart, LongType), Cast(rStart, LongType))), binSize))
          val newCond = (conjuncts :+ EqualTo(binL, binR) :+ dedup).reduce(And)
          Project(j.output, Join(lGen, rGen, Inner, Some(newCond), hint))
        case _ => j
      }
  }
}
