package graft.join

import graft.core.Cols
import graft.plans.{IntervalSweepJoinExec, IntervalSweepJoinNode}
import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Cast, Divide, EqualTo, Expression, Floor, Greatest, GreaterThan, LessThan, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DoubleType, LongType}

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
  * SKEW / FEW KEYS at scale: clustering only by key gives one task per
  * key — a hot chromosome serializes. `megaBin` SALTS the sweep: both
  * sides explode into span-scale coordinate bins (fan-out ~1 when the
  * bin is >> the interval length), the bin rides the cluster keys so
  * every (key, bin) sweeps in parallel, and the greatest-start-bin
  * dedup predicate keeps each pair exactly once — the same two
  * exchanges, parallelism span/megaBin per key instead of 1.
  * Mega-binning applies to the INNER pair join only (a semi/anti left
  * row would be decided per bin copy, not per row).
  *
  * Mirrors the reference's ruranges sort-sweep kernel semantics
  * (reference methods/overlap.py:20-47): `slack` extends the LEFT side
  * for matching only. Key equality is SQL equi-join semantics (NULL
  * keys match nothing), identical to RangeJoin.pairs.
  */
object IntervalSweepJoin {
  import Cols.{Start, End}

  private val MbCol = "_gx_mb"

  def pairs(left: DataFrame, right: DataFrame, keys0: Seq[String],
            slack: Long = 0, suffix: String = "_b",
            megaBin: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, explode, floor, greatest, sequence}
    val (l1, r1, keys) = megaBin match {
      case Some(b) =>
        def fdiv(c: org.apache.spark.sql.Column) =
          floor(c.cast("double") / b).cast("long") // exact: |coords| < 2^52
        def binsOf(s: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) = {
          val lo = fdiv(s)
          sequence(lo, greatest(lo, fdiv(e - 1))) // clamp degenerate rows to 1 bin
        }
        (left.withColumn(MbCol, explode(binsOf(col(Start) - slack, col(End) + slack))),
          right.withColumn(MbCol, explode(binsOf(col(Start), col(End)))),
          keys0 :+ MbCol)
      case None => (left, right, keys0)
    }
    val r0 = RangeJoin.suffixRight(l1, r1, suffix)
    val rKeys = keys.map(_ + suffix)
    val rs = Start + suffix
    val re = End + suffix

    val lPlan = l1.queryExecution.analyzed
    val rPlan = r0.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"missing column $n"))
    val lKeyAttrs = keys.map(attr(lPlan, _))
    val rKeyAttrs = rKeys.map(attr(rPlan, _))
    val (ls, le) = (attr(lPlan, Start), attr(lPlan, End))
    val (rsA, reA) = (attr(rPlan, rs), attr(rPlan, re))

    // full join condition, re-checked per candidate pair by the exec:
    // keys (+ mega-bin) equal AND (slack-extended) overlap AND, when
    // mega-binned, the pair-dedup bin (each pair meets in exactly one
    // bin: floor(max(lStart - slack, rStart) / megaBin))
    val overlap: Seq[Expression] = Seq(
      LessThan(Subtract64(ls, slack), reA),
      GreaterThan(Add64(le, slack), rsA))
    val dedup: Seq[Expression] = megaBin.toSeq.map { b =>
      EqualTo(attr(lPlan, MbCol),
        Cast(Floor(Divide(
          Cast(Greatest(Seq(Subtract64(ls, slack), Cast(rsA, LongType))), DoubleType),
          Literal(b.toDouble))), LongType))
    }
    val cond = (lKeyAttrs.zip(rKeyAttrs).map { case (a, b) => EqualTo(a, b) }
      ++ overlap ++ dedup).reduce[Expression](And)

    val node = IntervalSweepJoinNode(lPlan, rPlan, lKeyAttrs, rKeyAttrs,
      ls, le, rsA, reA, slack, cond)
    val spark = left.sparkSession
    IntervalSweepJoinExec.ensureStrategy(spark)
    val res = GraftColumnBridge.ofRows(spark, node).drop(rKeys: _*)
    if (megaBin.isDefined) res.drop(MbCol) else res
  }

  /** Existence-only sweep: left_semi / left_anti through the operator's
    * native modes — each left row emitted at most once by row identity
    * (matched rows on first match / never-matched rows at eviction), so
    * there is no explode, no rid machinery and no re-join. The right
    * side is projected to (keys, Start, End) before the exchange. No
    * mega-binning (a left row must be decided per row, not per bin
    * copy) — per-key parallelism only, like the reference kernel. */
  def exists(left: DataFrame, right: DataFrame, keys: Seq[String],
             slack: Long = 0, anti: Boolean = false): DataFrame = {
    val suffix = "_b"
    val rMin = right.select((keys :+ Start :+ End).map(
      org.apache.spark.sql.functions.col): _*)
    val r0 = RangeJoin.suffixRight(left, rMin, suffix)
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
    val overlap: Seq[Expression] = Seq(
      LessThan(Subtract64(ls, slack), reA),
      GreaterThan(Add64(le, slack), rsA))
    val cond = (lKeyAttrs.zip(rKeyAttrs).map { case (a, b) => EqualTo(a, b) }
      ++ overlap).reduce[Expression](And)
    val jt = if (anti) org.apache.spark.sql.catalyst.plans.LeftAnti
             else org.apache.spark.sql.catalyst.plans.LeftSemi
    val node = IntervalSweepJoinNode(lPlan, rPlan, lKeyAttrs, rKeyAttrs,
      ls, le, rsA, reA, slack, cond, jt)
    val spark = left.sparkSession
    IntervalSweepJoinExec.ensureStrategy(spark)
    GraftColumnBridge.ofRows(spark, node)
  }

  // long-typed slack arithmetic helpers (keep the condition integral)
  private def Subtract64(e: Expression, k: Long): Expression = {
    val el = Cast(e, LongType)
    if (k == 0) el
    else org.apache.spark.sql.catalyst.expressions.Subtract(el, Literal(k))
  }
  private def Add64(e: Expression, k: Long): Expression =
    if (k == 0) e
    else org.apache.spark.sql.catalyst.expressions.Add(
      Cast(e, LongType), Literal(k))
}
