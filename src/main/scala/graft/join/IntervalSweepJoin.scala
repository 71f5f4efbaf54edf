package graft.join

import graft.core.Cols
import graft.plans.{IntervalSweepJoinExec, IntervalSweepJoinNode}
import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, GreaterThan, LessThan, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Sort-merge interval join (SURVEY.md §4.3 option (c) — the alternative
  * physical strategy to the binned join for the long-interval / deep-
  * overlap regime), as a DataFrame-level entry point over the custom
  * Catalyst operator [[graft.plans.IntervalSweepJoinExec]].
  *
  * Both sides hash-cluster on the group keys and sort by start once
  * (planner-inserted exchanges); a single forward plane-sweep per
  * partition maintains the active interval set of each side and emits
  * every overlapping pair exactly once. Cost: one shuffle + sort per
  * side and O(pairs) emission; memory: the maximum concurrent overlap
  * depth (active sets), not the partition size. Compared to the binned
  * join it never explodes rows (no fan-out for long intervals) and
  * needs no bin-width tuning; the binned join wins when intervals are
  * short (fan-out ~1 hash joins beat a sort). Both produce identical
  * pair sets (property-tested) — [[graft.plans.IntervalJoinRewrite]]
  * picks per workload from sampled statistics.
  *
  * Mirrors the reference's ruranges sort-sweep kernel semantics
  * (reference methods/overlap.py:20-47): `slack` extends the LEFT side
  * for matching only. Key equality is SQL equi-join semantics (NULL
  * keys match nothing), identical to RangeJoin.pairs.
  */
object IntervalSweepJoin {
  import Cols.{Start, End}

  def pairs(left: DataFrame, right: DataFrame, keys: Seq[String],
            slack: Long = 0, suffix: String = "_b"): DataFrame = {
    val r0 = RangeJoin.suffixRight(left, right, suffix)
    val rKeys = keys.map(_ + suffix)
    val rs = Start + suffix
    val re = End + suffix

    val lPlan = left.queryExecution.analyzed
    val rPlan = r0.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"missing column $n"))
    val lKeyAttrs = keys.map(attr(lPlan, _))
    val rKeyAttrs = rKeys.map(attr(rPlan, _))
    val (ls, le) = (attr(lPlan, Start), attr(lPlan, End))
    val (rsA, reA) = (attr(rPlan, rs), attr(rPlan, re))

    // full join condition, re-checked per candidate pair by the exec:
    // keys equal AND (slack-extended) overlap
    val overlap: Seq[Expression] = Seq(
      LessThan(Subtract64(ls, slack), reA),
      GreaterThan(Add64(le, slack), rsA))
    val cond = (lKeyAttrs.zip(rKeyAttrs).map { case (a, b) => EqualTo(a, b) }
      ++ overlap).reduce[Expression](And)

    val node = IntervalSweepJoinNode(lPlan, rPlan, lKeyAttrs, rKeyAttrs,
      ls, le, rsA, reA, slack, cond)
    val spark = left.sparkSession
    IntervalSweepJoinExec.ensureStrategy(spark)
    GraftColumnBridge.ofRows(spark, node).drop(rKeys: _*)
  }

  // long-typed slack arithmetic helpers (keep the condition integral)
  private def Add64(e: Expression, k: Long): Expression =
    if (k == 0) e
    else org.apache.spark.sql.catalyst.expressions.Add(
      org.apache.spark.sql.catalyst.expressions.Cast(e,
        org.apache.spark.sql.types.LongType), Literal(k))
  private def Subtract64(e: Expression, k: Long): Expression =
    if (k == 0) e
    else org.apache.spark.sql.catalyst.expressions.Subtract(
      org.apache.spark.sql.catalyst.expressions.Cast(e,
        org.apache.spark.sql.types.LongType), Literal(k))
}
