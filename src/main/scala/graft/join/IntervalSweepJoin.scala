package graft.join

import graft.core.Cols
import graft.plans.{IntervalSweepJoinExec, IntervalSweepJoinNode, SweepMode}
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, Cast, Divide, EqualTo, Expression, Floor, Greatest, GreaterThan, LessThan, Literal}
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
  * Beyond pairs, the operator folds three derived outputs into the same
  * sweep ([[SweepMode]]): per-left-row FIRST/LAST match (reference
  * `join_overlaps(multiple=...)`, core/pyranges_main.py:1147-1401) and
  * per-left-row match COUNT (`count_overlaps`, :769-876) — none of
  * which materialize the pair set, so their cost is O(|L| + |R| +
  * candidate visits), not O(pairs emitted).
  *
  * SKEW / FEW KEYS at scale: clustering only by key gives one task per
  * key — a hot chromosome serializes. `megaBin` SALTS the sweep: both
  * sides explode into span-scale coordinate bins (fan-out ~1 when the
  * bin is >> the interval length), the bin rides the cluster keys so
  * every (key, bin) sweeps in parallel, and the greatest-start-bin
  * dedup predicate keeps each pair exactly once — the same two
  * exchanges, parallelism span/megaBin per key instead of 1.
  * Mega-binning applies to the pair join AND (with a per-row-id rollup
  * of the per-bin-copy partials — a ~|L|-row aggregation, never the
  * pair set) to pick/count; semi/anti stay per-key (a left row would
  * be decided per bin copy, not per row, and has no rollup identity).
  *
  * Mirrors the reference's ruranges sort-sweep kernel semantics
  * (reference methods/overlap.py:20-47): `slack` extends the LEFT side
  * for matching only. Key equality is SQL equi-join semantics (NULL
  * keys match nothing), identical to RangeJoin.pairs.
  */
object IntervalSweepJoin {
  import Cols.{End, RowId, Start}

  private val MbCol = "_gx_mb"

  /** Mega-bin explode of both sides (fan-out ~1: bin >> interval), or
    * passthrough. Returns (left', right', cluster keys). */
  private def salted(left: DataFrame, right: DataFrame, keys0: Seq[String],
                     slack: Long, megaBin: Option[Long])
      : (DataFrame, DataFrame, Seq[String]) = {
    import org.apache.spark.sql.functions.{col, explode, floor, greatest, sequence}
    megaBin match {
      case Some(b) =>
        def fdiv(c: Column) =
          floor(c.cast("double") / b).cast("long") // exact: |coords| < 2^52
        def binsOf(s: Column, e: Column) = {
          val lo = fdiv(s)
          sequence(lo, greatest(lo, fdiv(e - 1))) // clamp degenerate rows to 1 bin
        }
        (left.withColumn(MbCol, explode(binsOf(col(Start) - slack, col(End) + slack))),
          right.withColumn(MbCol, explode(binsOf(col(Start), col(End)))),
          keys0 :+ MbCol)
      case None => (left, right, keys0)
    }
  }

  private def attr(p: LogicalPlan, n: String): Attribute =
    p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"missing column $n"))

  /** Shared node assembly: analyzed children, key/bound attributes, the
    * full re-checked condition (keys [+ mega-bin] equal AND slack-
    * extended overlap AND, when mega-binned, the greatest-start-bin
    * pair-dedup). */
  private def buildNode(l1: DataFrame, r0: DataFrame, keys: Seq[String],
                        rKeys: Seq[String], slack: Long, suffix: String,
                        megaBin: Option[Long], mode: String,
                        countAttr: Option[Attribute] = None,
                        withTies: Boolean = false): IntervalSweepJoinNode = {
    val rs = Start + suffix
    val re = End + suffix
    val lPlan = l1.queryExecution.analyzed
    val rPlan = r0.queryExecution.analyzed
    val lKeyAttrs = keys.map(attr(lPlan, _))
    val rKeyAttrs = rKeys.map(attr(rPlan, _))
    val (ls, le) = (attr(lPlan, Start), attr(lPlan, End))
    val (rsA, reA) = (attr(rPlan, rs), attr(rPlan, re))
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
    // pick tie-break: the non-coordinate right columns ascending, in
    // schema order — the same ordering tail the aggregation path's
    // min_by struct uses (BinaryOps.pickOne)
    val ties: Seq[Expression] =
      if (withTies)
        rPlan.output.filterNot(a =>
          a.name == rs || a.name == re || rKeys.contains(a.name))
      else Nil
    IntervalSweepJoinNode(lPlan, rPlan, lKeyAttrs, rKeyAttrs,
      ls, le, rsA, reA, slack, cond, mode = mode, countAttr = countAttr,
      pickTies = ties)
  }

  def pairs(left: DataFrame, right: DataFrame, keys0: Seq[String],
            slack: Long = 0, suffix: String = "_b",
            megaBin: Option[Long] = None): DataFrame = {
    val (l1, r1, keys) = salted(left, right, keys0, slack, megaBin)
    val r0 = RangeJoin.suffixRight(l1, r1, suffix)
    val rKeys = keys.map(_ + suffix)
    val node = buildNode(l1, r0, keys, rKeys, slack, suffix, megaBin, SweepMode.Pairs)
    val spark = left.sparkSession
    IntervalSweepJoinExec.ensureStrategy(spark)
    val res = GraftColumnBridge.ofRows(spark, node).drop(rKeys: _*)
    if (megaBin.isDefined) res.drop(MbCol) else res
  }

  /** Per-left-row first/last match through the operator's native pick
    * mode: one output row per matched left row, chosen by smallest
    * (first) / largest (last) (rightStart, rightEnd), ties broken
    * ascending on the remaining right columns — the pair set is never
    * materialized. Salted (megaBin): each (key, bin) sweep emits its
    * local winner per left bin copy, then one ~|L|-row min_by rollup on
    * `rowIdCol` (which the left side must carry uniquely) picks the
    * global winner; unmatched copies emit nothing. */
  def pick(left: DataFrame, right: DataFrame, keys0: Seq[String],
           last: Boolean, slack: Long = 0, suffix: String = "_b",
           megaBin: Option[Long] = None,
           rowIdCol: String = RowId): DataFrame = {
    import org.apache.spark.sql.functions.{col, min_by, struct}
    val (l1, r1, keys) = salted(left, right, keys0, slack, megaBin)
    val r0 = RangeJoin.suffixRight(l1, r1, suffix)
    val rKeys = keys.map(_ + suffix)
    val mode = if (last) SweepMode.Last else SweepMode.First
    val node = buildNode(l1, r0, keys, rKeys, slack, suffix, megaBin, mode,
      withTies = true)
    val spark = left.sparkSession
    IntervalSweepJoinExec.ensureStrategy(spark)
    val raw0 = GraftColumnBridge.ofRows(spark, node).drop(rKeys: _*)
    val raw = if (megaBin.isDefined) raw0.drop(MbCol) else raw0
    megaBin match {
      case None => raw
      case Some(_) =>
        // global winner across the per-(key, bin) local winners: the
        // same (coords, right-columns) ordering, over <= fan-out rows
        // per left row instead of the pair set
        require(raw.columns.contains(rowIdCol),
          s"salted sweep pick needs a unique '$rowIdCol' on the left side")
        val rs = Start + suffix
        val re = End + suffix
        val sortKeys = Seq(rs, re)
        val rCols = raw.columns.filterNot(left.columns.contains).toSeq
        val lCols = raw.columns.filter(left.columns.contains).filterNot(_ == rowIdCol).toSeq
        val ord = struct((sortKeys ++ rCols.filterNot(sortKeys.contains)).map { c =>
          if (!last) col(c) else (if (c == re || c == rs) (-col(c)).as(c) else col(c))
        }: _*)
        val payload = struct((rCols ++ lCols).map(col): _*)
        // the global reduce keys on the FULL left row (round-18, the
        // duplicate-row_id find): two distinct left rows sharing a
        // row_id each keep their own winner — the unsalted sweep
        // decides per physical row, and the binned pickOne fix
        // mirrors this; group keys are null-safe, no rejoin either way
        val m = raw.groupBy((Seq(rowIdCol) ++ lCols).map(col): _*)
          .agg(min_by(payload, ord).as("_m"))
        val unpacked = (rCols ++ lCols).foldLeft(m)((d, c) =>
          d.withColumn(c, col(s"_m.$c"))).drop("_m")
        unpacked.select(raw.columns.map(col): _*)
    }
  }

  /** Per-left-row overlap count through the operator's native count
    * mode: EVERY left row (unmatched, null-key and null-bound rows
    * count 0), so unsalted callers need no rejoin. Salted (megaBin):
    * per-bin-copy partial counts (each pair counted in exactly one copy
    * by the dedup predicate) are summed per `rowIdCol` and left-joined
    * back to the original left — null-bound rows produce no bin copies,
    * the rejoin restores them at 0. */
  def count(left: DataFrame, right: DataFrame, keys0: Seq[String],
            slack: Long = 0, countCol: String = "NumberOverlaps",
            megaBin: Option[Long] = None,
            rowIdCol: String = RowId): DataFrame = {
    import org.apache.spark.sql.functions.{col, sum}
    val suffix = "_b"
    val rMin = right.select((keys0 :+ Start :+ End).map(col): _*)
    val (l1, r1, keys) = salted(left, rMin, keys0, slack, megaBin)
    val r0 = RangeJoin.suffixRight(l1, r1, suffix)
    val rKeys = keys.map(_ + suffix)
    val cntAttr = AttributeReference(countCol, LongType, nullable = false)()
    val node = buildNode(l1, r0, keys, rKeys, slack, suffix, megaBin,
      SweepMode.Count, countAttr = Some(cntAttr))
    val spark = left.sparkSession
    IntervalSweepJoinExec.ensureStrategy(spark)
    val raw = GraftColumnBridge.ofRows(spark, node)
    megaBin match {
      case None => raw
      case Some(_) =>
        // per-bin partials reduce by the FULL left row, not rowIdCol
        // alone (round-18, the duplicate-row_id find): two distinct
        // left rows sharing a row_id must keep separate counts — the
        // unsalted branch counts per physical row, and the binned
        // dispatch fix mirrors this. The bin copies carry every left
        // column unchanged, so the group key is exactly the left row;
        // groupBy is null-safe, the rejoin's equality is not (the
        // coordinate/key columns are non-null by the library contract).
        require(left.columns.contains(rowIdCol),
          s"salted sweep count needs '$rowIdCol' on the left side")
        val lcols = left.columns.toSeq
        val partials = raw.groupBy(lcols.map(col): _*)
          .agg(sum(col(countCol)).as(countCol))
        left.join(partials, lcols, "left")
          .na.fill(0L, Seq(countCol))
    }
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
    import org.apache.spark.sql.functions.col
    val suffix = "_b"
    val rMin = right.select((keys :+ Start :+ End).map(col): _*)
    val r0 = RangeJoin.suffixRight(left, rMin, suffix)
    val rKeys = keys.map(_ + suffix)
    val node0 = buildNode(left, r0, keys, rKeys, slack, suffix, None, SweepMode.Pairs)
    val jt = if (anti) org.apache.spark.sql.catalyst.plans.LeftAnti
             else org.apache.spark.sql.catalyst.plans.LeftSemi
    val node = node0.copy(joinType = jt)
    val spark = left.sparkSession
    IntervalSweepJoinExec.ensureStrategy(spark)
    GraftColumnBridge.ofRows(spark, node)
  }

  /** Outer pair sweep: left/right/full outer through the operator's
    * native outer modes (reference `join_overlaps(join_type=...)`,
    * methods/join.py:45-56, core/pyranges_main.py:1267-1288) —
    * unmatched rows null-pad the other side during eviction/flush, so
    * the binned composition's two extra anti-joins are never paid, and
    * (unlike binned outer) rows are never amplified by bin fan-out.
    * The suffixed right KEY columns are dropped, like [[pairs]], so
    * unmatched right rows surface with null keys — identical to the
    * binned composition's outer schema (pinned by the q14 oracle
    * family). No mega-binning: matched-ness is a per-ROW property
    * decided across all bins a row would land in, which a bin copy
    * cannot know — per-key parallelism only, like [[exists]]. Memory:
    * bounded — outer entries past sweepSpillDepth demote to the
    * stateful overflow (row spills to disk, the matched flag stays
    * resident at 8 bytes/row) — see the depth contract in
    * [[graft.plans.IntervalSweepJoinExec]].
    *
    * SCALE NOTE: on a cluster where per-key parallelism is too coarse
    * (a hot chromosome), the scale path is salted sweep PAIRS plus a
    * per-row-id unmatched rejoin (one ~|input|-row aggregation per
    * outer side) — fan-out-free pairs with full (key, bin)
    * parallelism, at the cost of the rejoin the native mode avoids.
    * Deliberately NOT auto-dispatched: it needs the row-id contract on
    * both sides, and no measured workload has hit the per-key bound
    * (the gate only routes here when binned fan-out already loses). */
  def outer(left: DataFrame, right: DataFrame, keys: Seq[String],
            joinType: String, slack: Long = 0,
            suffix: String = "_b"): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.{FullOuter, LeftOuter, RightOuter}
    val jt = joinType match {
      case "left"           => LeftOuter
      case "right"          => RightOuter
      case "outer" | "full" => FullOuter
      case other => throw new IllegalArgumentException(
        s"not an outer join type: $other")
    }
    val r0 = RangeJoin.suffixRight(left, right, suffix)
    val rKeys = keys.map(_ + suffix)
    val node0 = buildNode(left, r0, keys, rKeys, slack, suffix, None, SweepMode.Pairs)
    val node = node0.copy(joinType = jt)
    val spark = left.sparkSession
    IntervalSweepJoinExec.ensureStrategy(spark)
    GraftColumnBridge.ofRows(spark, node).drop(rKeys: _*)
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
