package graft.ops

import graft.core.Cols
import graft.join.RangeJoin
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary interval operators (the heart of the library — SURVEY.md §2.1).
  * All are pure DataFrame plans over the binned range join; `keys` is the
  * resolved group key (Chromosome [+ Strand] [+ match_by]); `left` must
  * carry a unique `row_id` column (the pandas-index replacement) for the
  * ops whose contract needs input-row identity.
  */
object BinaryOps {
  import Cols.{Start, End, RowId}

  /** overlap (reference core/pyranges_main.py:2393-2615): keep left rows
    * overlapping >= 1 right row; invert => keep non-overlapping;
    * keepDuplicates mirrors the reference's multiple=True (one output
    * row PER matching right row, left columns only). */
  def overlap(left: DataFrame, right: DataFrame, keys: Seq[String],
              slack: Long = 0, contained: Boolean = false,
              invert: Boolean = false, keepDuplicates: Boolean = false,
              binSize: Long = graft.join.RangeJoin.defaultBinSize): DataFrame = {
    if (keepDuplicates && !invert) {
      RangeJoin.pairsDispatch(left, right, keys, slack, binSize, contained = contained)
        .select(left.columns.map(col): _*)
    } else {
      // Merging right first shrinks the probe side and cannot change
      // existence (except containment, which needs original intervals).
      val probe = if (contained) right else UnaryOps.merge(right, keys)
      RangeJoin.existsDispatch(left, probe, keys, slack, binSize, contained, anti = invert)
    }
  }

  /** join_overlaps (reference core/pyranges_main.py:1147-1401): relational
    * join on interval overlap, right columns suffixed; joinType in
    * {inner, left, right, outer}; multiple in {all, first, last} picks one
    * right match per left row (first = smallest Start_b, last = largest
    * End_b); reportOverlapCol adds the overlap length. */
  def joinOverlaps(left: DataFrame, right: DataFrame, keys: Seq[String],
                   joinType: String = "inner", multiple: String = "all",
                   slack: Long = 0, suffix: String = "_b",
                   reportOverlapCol: Option[String] = None,
                   contained: Boolean = false, binSize: Long = graft.join.RangeJoin.defaultBinSize,
                   packedPick: Boolean = false): DataFrame = {
    val rs = Start + suffix
    val re = End + suffix
    // outer types in the sweep regime: the operator's native outer
    // modes null-pad unmatched rows during eviction/flush — ONE sweep
    // instead of the binned pairs + two anti-joins, and no bin fan-out
    // row amplification on the unmatched scans.
    if (multiple == "all" && joinType != "inner" &&
        RangeJoin.sweepOuterChoice(left, right, keys, contained)) {
      val p0 = graft.join.IntervalSweepJoin.outer(left, right, keys,
        joinType, slack = slack, suffix = suffix)
      return reportOverlapCol.fold(p0)(c => p0.withColumn(c,
        least(col(End), col(re)) - greatest(col(Start), col(rs))))
    }
    // first/last in the sweep regime: the operator's native pick mode
    // decides each left row DURING the sweep — the pair set (the whole
    // cost of a first-match join on dense data) is never materialized.
    // The pick path uses its OWN size gate (4 MB default, conf below):
    // the round-8 A/B on q52's natural sf0.1 shape (17 MB leaves,
    // 10.2M pairs, 3 hot keys — BASELINE.md "q52 pick crossover")
    // measured the sweep pick at 1.0-1.4 s steady / 2.0 s cold vs the
    // binned packed pick's 1.4-1.7 s / 5.4 s, with identical output
    // hashes — pair materialization dominates well below the shared
    // 32 MB gate. Short-interval many-balanced-keys shapes still stay
    // binned via the fan-out bar + saltPlan demotion inside the choice.
    val sweepPick: Option[Option[Long]] =
      if (multiple == "first" || multiple == "last") {
        val pickGate = org.apache.spark.sql.internal.SQLConf.get
          .getConfString("spark.graft.join.pickAutoThreshold",
            (4L << 20).toString).toLong
        RangeJoin.sweepAutoChoice(left, right, keys, "rangejoin/pickAuto",
          contained, thresholdOverride = Some(pickGate))
      } else None
    var p = sweepPick match {
      case Some(mb) =>
        graft.join.IntervalSweepJoin.pick(left, right, keys,
          last = multiple == "last", slack = slack, suffix = suffix, megaBin = mb)
      case None =>
        RangeJoin.pairsDispatch(left, right, keys, slack, binSize, suffix, contained)
    }
    // multiple=first/last pick one right match per left row. A window
    // over the full pair set would sort every pair; a min/max(struct)
    // aggregation gets map-side partial combine — the pair set shrinks to
    // one row per left row BEFORE the shuffle — then rejoins the (never
    // exploded) left side.
    // first = smallest (Start_b, End_b); last = LARGEST (Start_b, End_b)
    // — position order of the other side (reference intersect doctest
    // core/pyranges_main.py:5406-5415: "last" on [25,33),[28,32) picks
    // the [28,32) row, i.e. max start, not max end).
    def pickOne(minimize: Boolean): DataFrame = {
      val rCols = p.columns.filterNot(left.columns.contains).toSeq
      val sortKeys = Seq(rs, re)
      // min_by carries the full row as an OPAQUE payload and compares
      // only the (deterministic) ordering struct — sort keys first, then
      // the remaining right columns as tie-breaks. min(struct(...)) here
      // instead re-compares every payload field on ties, which measurably
      // drags on multi-million-pair sets. Left columns ride in the
      // payload (functionally determined by row_id), so no rejoin.
      val lCols = left.columns.filterNot(_ == RowId).toSeq
      val ord = struct((sortKeys ++ rCols.filterNot(sortKeys.contains)).map { c =>
        if (minimize) col(c) else (if (c == re || c == rs) (-col(c)).as(c) else col(c))
      }: _*)
      val payload = struct((rCols ++ lCols).map(col): _*)
      // group by the FULL left row, not row_id alone (round-18, the
      // countOverlaps duplicate-row_id find): two distinct left rows
      // sharing a row_id must each pick their own match — the group
      // keys are null-safe and the payload already carries every
      // column, so no rejoin is needed either way
      val m = p.groupBy((Seq(RowId) ++ lCols).map(col): _*)
        .agg(min_by(payload, ord).as("_m"))
      val unpacked = (rCols ++ lCols).foldLeft(m)((d, c) =>
        d.withColumn(c, col(s"_m.$c"))).drop("_m")
      unpacked.select(p.columns.map(col): _*)
    }
    // Packed alternative to pickOne: fold the (Start_b, End_b) ordering
    // into ONE long — (Start_b << 32) | End_b is the exact lexicographic
    // order for u32 interval coordinates with Start_b < 2^31 (any
    // genomic assembly; bigWig pins the same invariant) — so the
    // per-left-row pick becomes min_by(row_id_b, packedLong): a
    // fixed-width two-long buffer that HASH-aggregates with map-side
    // partial combine (the pair set shrinks to one row per left row
    // BEFORE the shuffle; min_by over the full-row struct payload falls
    // back to SortAggregate and map-side-sorts every pair). The winner
    // row is recovered by re-joining the (never exploded) inputs on
    // their unique row ids. Exact when (Start_b, End_b) is unique per
    // (keys) on the right side — deeper ties are broken by whichever
    // row_id the combine saw, vs pickOne's full-column tie-break — so
    // callers opt in where that holds (q52: right starts are unique).
    // ALSO requires row_id unique on the LEFT (round-18: the rejoin
    // would attach one shared winner to every row of a duplicated id,
    // where pickOne/the sweep pick decide each physical row); q52's
    // data satisfies it at every SF the pick gate routes here.
    def pickOnePacked(minimize: Boolean): DataFrame = {
      val rId = RowId + suffix
      val pack0 = shiftleft(col(rs), 32) + col(re)
      val ord = if (minimize) pack0 else -pack0
      val winners = p.select(col(RowId), col(rId), ord.as("_ord"))
        .groupBy(col(RowId)).agg(min_by(col(rId), col("_ord")).as(rId))
      val r0 = RangeJoin.suffixRight(left, right, suffix)
      winners.join(left, Seq(RowId)).join(r0, Seq(rId))
        .select(p.columns.map(col): _*)
    }
    if (sweepPick.isEmpty) multiple match {
      case "first" => p = if (packedPick) pickOnePacked(minimize = true)
                          else pickOne(minimize = true)
      case "last"  => p = if (packedPick) pickOnePacked(minimize = false)
                          else pickOne(minimize = false)
      case _       => ()
    }
    p = reportOverlapCol.fold(p)(c => p.withColumn(c,
      least(col(End), col(re)) - greatest(col(Start), col(rs))))
    def nullRight(d: DataFrame): DataFrame =
      p.columns.filterNot(d.columns.contains).foldLeft(d)((acc, c) =>
        acc.withColumn(c, lit(null).cast(p.schema(c).dataType)))
    def nullLeft(d0: DataFrame): DataFrame = {
      // unmatched right rows, projected into the pair schema
      val d = RangeJoin.suffixRight(left, d0, suffix)
      p.columns.filterNot(d.columns.contains).foldLeft(d)((acc, c) =>
        acc.withColumn(c, lit(null).cast(p.schema(c).dataType)))
    }
    joinType match {
      case "inner" => p
      case "left" =>
        val unmatched = overlap(left, right, keys, slack, contained, invert = true, binSize = binSize)
        p.unionByName(nullRight(unmatched).select(p.columns.map(col): _*))
      case "right" =>
        val unmatchedR = overlap(right, left, keys, slack, contained = false, invert = true, binSize = binSize)
        p.unionByName(nullLeft(unmatchedR).select(p.columns.map(col): _*))
      case "outer" | "full" =>
        val ul = overlap(left, right, keys, slack, contained, invert = true, binSize = binSize)
        val ur = overlap(right, left, keys, slack, contained = false, invert = true, binSize = binSize)
        p.unionByName(nullRight(ul).select(p.columns.map(col): _*))
          .unionByName(nullLeft(ur).select(p.columns.map(col): _*))
    }
  }

  /** intersect_overlaps (reference core/pyranges_main.py:5309-5436):
    * overlap join with output coordinates clipped to the overlapping
    * segment; multiple=first/last keeps one segment per left row (by
    * smallest Start_b / largest End_b). */
  def intersect(left: DataFrame, right: DataFrame, keys: Seq[String],
                slack: Long = 0, multiple: String = "all",
                binSize: Long = graft.join.RangeJoin.defaultBinSize): DataFrame = {
    val p0 = joinOverlaps(left, right, keys, joinType = "inner",
      multiple = multiple, slack = slack, binSize = binSize)
    p0.withColumn(Start, greatest(col(Start), col(Start + "_b")))
      .withColumn(End, least(col(End), col(End + "_b")))
      .drop(Start + "_b", End + "_b")
  }

  /** count_overlaps (reference core/pyranges_main.py:769-876): per left
    * row, the number of overlapping right rows (0 kept). */
  def countOverlaps(left: DataFrame, right: DataFrame, keys: Seq[String],
                    slack: Long = 0, countCol: String = "NumberOverlaps",
                    binSize: Long = graft.join.RangeJoin.defaultBinSize): DataFrame =
    // sweep regime: the operator's native count mode bumps a counter per
    // candidate instead of emitting the pair set, and (unsalted) already
    // yields every left row with its count — no rejoin at all
    RangeJoin.sweepAutoChoice(left, right, keys, "rangejoin/countAuto",
        contained = false) match {
      case Some(mb) =>
        graft.join.IntervalSweepJoin.count(left, right, keys, slack, countCol, mb)
      case None =>
        val p = RangeJoin.pairsDispatch(left, right, keys, slack, binSize)
        // row identity = the FULL left row, not row_id alone (round-18
        // correctness find): the sf0.001 lineitem data carries one
        // genuine duplicate (orderkey, linenumber, partkey, suppkey)
        // key, so two distinct left rows can share a row_id — the
        // oracle contract (GROUP BY every left column) and the sweep
        // branch (a counter per physical row) both count such rows
        // separately, while grouping by row_id alone summed both rows'
        // counts into both (q16/q35 mismatched at sf0.001; row_id is
        // unique at sf0.01/sf0.1, where this is a pure refinement).
        // groupBy is null-safe; the rejoin's equality is not, but the
        // coordinate/key columns are non-null by the library contract.
        val lcols = left.columns.toSeq
        val counts = p.groupBy(lcols.map(col): _*)
          .agg(count(lit(1)).as(countCol))
        left.join(counts, lcols, "left")
          .na.fill(0L, Seq(countCol))
    }

  /** Multi-set count_overlaps (reference core/multioverlap.py:11-143):
    * one count column per named input set. */
  def multiCountOverlaps(left: DataFrame, others: Seq[(String, DataFrame)],
                         keys: Seq[String]): DataFrame =
    others.foldLeft(left) { case (acc, (name, df)) =>
      countOverlaps(acc, df, keys, countCol = name)
    }

  /** subtract_overlaps (reference core/pyranges_main.py:3522-3643): remove
    * from each left interval the parts covered by right (one row may split
    * into many; rows fully covered disappear; rows with no overlap pass
    * through). Plan: merge right per key; pair-join; per left row the
    * merged overlaps are disjoint and sorted, so the surviving pieces are
    * the gaps — window over row_id, no collect. */
  def subtract(left: DataFrame, right: DataFrame, keys: Seq[String],
               binSize: Long = graft.join.RangeJoin.defaultBinSize): DataFrame = {
    // the merged right feeds BOTH the pair join and the anti join below;
    // without a pin the merge subtree (a full shuffle + window sweep
    // over the right side) is inlined — and recomputed — in each join
    // (round-17, guide §2.4: two consumers, one materialization). At
    // 100 TB that is a whole extra pass over the right side.
    // persist(MEMORY_AND_DISK), not localCheckpoint (round-17 ADVICE /
    // VERDICT r17 item #9): the pin is LAZY (constructing the frame runs
    // no job, so plan-only audits stay plan-only), keeps LINEAGE (a lost
    // executor recomputes its blocks instead of failing the query — a
    // localCheckpoint block is unreplicated and unrecoverable), keeps
    // the merge subtree visible to plan audits (InMemoryRelation carries
    // it), and is reclaimable (clearCache()/ContextCleaner; checkpoint
    // blocks pinned executor storage for the session). Both consumer
    // joins resolve to the same InMemoryRelation, so the merge still
    // runs once.
    val merged = UnaryOps.merge(right, keys)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val p = RangeJoin.pairsDispatch(left, merged, keys, 0, binSize)
    val rs = col(Start + "_b")
    val re = col(End + "_b")
    val w = Window.partitionBy(col(RowId)).orderBy(rs)
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pieces = p
      .withColumn("_gapS", greatest(col(Start), coalesce(lag(re, 1).over(w), col(Start))))
      .withColumn("_gapE", least(col(End), rs))
      .withColumn("_runMax", max(re).over(wAll))
      .withColumn("_isLast", lead(rs, 1).over(w).isNull)
      .withColumn("_segs", array(
        struct(col("_gapS").as("s"), col("_gapE").as("e")),
        struct(when(col("_isLast"), greatest(col(Start), col("_runMax"))).as("s"),
               when(col("_isLast"), col(End)).as("e"))))
      .withColumn("_seg", explode(col("_segs")))
      .filter(col("_seg.s").isNotNull && col("_seg.s") < col("_seg.e"))
      .withColumn(Start, col("_seg.s"))
      .withColumn(End, col("_seg.e"))
      .select(left.columns.map(col): _*)
    // anti-join directly against the already-merged right — overlap()
    // would re-merge its probe side, a full extra window sweep
    val untouched = RangeJoin.existsDispatch(left, merged, keys, 0, binSize,
      contained = false, anti = true)
    pieces.unionByName(untouched.select(left.columns.map(col): _*))
  }

  /** set_intersect_overlaps (reference core/pyranges_main.py:2617-2721):
    * merge both sides per key, then intersect the merged segments. */
  def setIntersect(left: DataFrame, right: DataFrame, keys: Seq[String],
                   multiple: String = "all",
                   binSize: Long = graft.join.RangeJoin.defaultBinSize): DataFrame =
    intersect(UnaryOps.merge(left, keys).withColumn(RowId, monotonically_increasing_id()),
              UnaryOps.merge(right, keys), keys, 0, multiple, binSize)
      .drop(RowId)

  /** set_union_overlaps (reference core/pyranges_main.py:2723-2820):
    * concat + merge. */
  def setUnion(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = (keys ++ Seq(Start, End)).map(col)
    UnaryOps.merge(left.select(cols: _*).unionByName(right.select(cols: _*)), keys)
  }

  /** nearest_ranges, k=1 (reference core/pyranges_main.py:2143-2391):
    * for each left row the nearest right interval; overlap => distance 0,
    * touching => distance 1 (reference README.md:51-53). Left rows whose
    * key has no right rows are dropped (inner semantics).
    *
    * Plan: three candidate generators — overlap pairs (range join), the
    * closest right interval ending at-or-before left's Start (as-of sweep
    * over the unioned tables, one sort), and the closest right interval
    * starting at-or-after left's End (mirror sweep) — then a min(struct)
    * per row_id. Ties broken by smallest right row_id.
    */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
              suffix: String = "_b", distCol: String = "Distance",
              excludeOverlaps: Boolean = false, binSize: Long = graft.join.RangeJoin.defaultBinSize): DataFrame =
    // single sweep implementation (NearestK) with k=1: the co-partitioned
    // mapPartitions scan — salted per position-bin on large inputs — beats
    // the old per-key window sweep, which serialized each chromosome into
    // one task.
    NearestK.nearestK(left, right, keys, 1, direction = "any",
      excludeOverlaps = excludeOverlaps, suffix = suffix, distCol = distCol,
      binSize = binSize)
      .drop("nearest_rank")
}
