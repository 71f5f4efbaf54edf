package graft.ops

import graft.core.Cols
import graft.join.RangeJoin
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composite coordinate-system operators (SURVEY.md §2.1/§2.3): spliced
  * subsequence (slice_ranges), 5'/3' ends, upstream/downstream flanks,
  * and the transcript-local <-> genomic lifts. All are built from
  * group_cumsum + window/projection algebra, mirroring the reference's
  * own decomposition (reference core/pyranges_main.py:3235-3261 shows
  * count_introns = outer_ranges -> slice_ranges -> intersect_overlaps).
  */
object Composites {
  import Cols.{Start, End, Strand, Chrom, RowId}

  private def neg(useStrand: Boolean, df: DataFrame): Column =
    if (useStrand && df.columns.contains(Strand)) col(Strand) === Cols.RevStrand
    else lit(false)

  /** slice_ranges (reference core/pyranges_main.py:2999-3262): cut each
    * group's spliced transcript to [sliceStart, sliceEnd) in 5'->3'
    * transcript-relative coordinates; negative offsets count from the 3'
    * end; sliceEnd None = transcript end. One row per surviving exon
    * fragment, coordinates mapped back to genomic space. */
  def sliceRanges(df: DataFrame, keys: Seq[String], sliceStart: Long,
                  sliceEnd: Option[Long], useStrand: Boolean = true,
                  tieBreak: Seq[Column] = Nil): DataFrame =
    sliceRangesCols(df, keys, lit(sliceStart), sliceEnd.map(lit(_)),
      useStrand, tieBreak)

  /** slice_ranges with per-row (vector) offsets (reference
    * methods/slice_ranges.py:19-54 — start/end may be arrays aligned to
    * rows; pyranges_main.py:3012-3015): each row carries its own slice
    * window, expressed here as Columns. With `keys` empty, each interval
    * is sliced independently — a pure strand-aware projection, no
    * shuffle (reference ungrouped slice_ranges, where every row is its
    * own group). `end` = None means "to the 3' end". */
  def sliceRangesCols(df: DataFrame, keys: Seq[String], sliceStart: Column,
                      sliceEnd: Option[Column], useStrand: Boolean = true,
                      tieBreak: Seq[Column] = Nil): DataFrame = {
    val isNeg = neg(useStrand, df)
    def resolve(tl: Column): (Column, Column) = {
      val s0 = when(sliceStart >= 0, sliceStart)
        .otherwise(greatest(tl + sliceStart, lit(0L)))
      val e0 = sliceEnd match {
        case Some(e) => when(e >= 0, least(e, tl)).otherwise(greatest(tl + e, lit(0L)))
        case None    => tl
      }
      (s0, e0)
    }
    if (keys.isEmpty) {
      val len = col(End) - col(Start)
      val (s0, e0) = resolve(len)
      val lo = greatest(lit(0L), s0)
      val hi = least(len, e0)
      df.filter(lo < hi)
        .withColumn("_ns", when(isNeg, col(End) - hi).otherwise(col(Start) + lo))
        .withColumn("_ne", when(isNeg, col(End) - lo).otherwise(col(Start) + hi))
        .withColumn(Start, col("_ns")).withColumn(End, col("_ne"))
        .drop("_ns", "_ne")
    } else {
      val cum = UnaryOps.groupCumsum(df, keys, useStrand, "_cs", "_ce", tieBreak)
      // Total spliced length per group = sum of interval lengths. A
      // window max(_ce) over the raw key would serialize each group into
      // one task (hot transcript = one straggler) and add an exchange on
      // top of the salted cumsum; the groupBy aggregates map-side and the
      // equi-join broadcasts at runtime (AQE) whenever the per-group
      // table is small.
      val lens = df.groupBy(keys.map(col): _*)
        .agg(sum(col(End) - col(Start)).as("_tl"))
      // null-safe key equality: a null group key (e.g. transcript_id on
      // GTF gene rows) is a group like any other, and `===` would drop it
      val lensR = keys.foldLeft(lens)((d, k) => d.withColumnRenamed(k, "_lk_" + k))
      val cond = keys.map(k => col(k) <=> col("_lk_" + k)).reduce(_ && _)
      val withLen = cum.join(lensR, cond).drop(keys.map("_lk_" + _): _*)
      val (s0, e0) = resolve(col("_tl"))
      val lo = greatest(col("_cs"), s0)
      val hi = least(col("_ce"), e0)
      withLen.filter(lo < hi)
        .withColumn("_ns", when(isNeg, col(End) - (hi - col("_cs")))
          .otherwise(col(Start) + (lo - col("_cs"))))
        .withColumn("_ne", when(isNeg, col(End) - (lo - col("_cs")))
          .otherwise(col(Start) + (hi - col("_cs"))))
        .withColumn(Start, col("_ns")).withColumn(End, col("_ne"))
        .drop("_cs", "_ce", "_tl", "_ns", "_ne")
    }
  }

  /** slice_ranges(count_introns=True) (reference core/pyranges_main.py:
    * 3235-3261): slice in UNSPLICED transcript coordinates — introns
    * count toward the offsets. The reference's own decomposition,
    * reproduced 1:1: outer_ranges per transcript -> slice the single
    * span -> intersect the original exons with it (span table is tiny:
    * broadcast equi-join on the transcript key + clip). */
  def sliceRangesUnspliced(df: DataFrame, txKeys: Seq[String], sliceStart: Long,
                           sliceEnd: Option[Long],
                           useStrand: Boolean = true): DataFrame = {
    val hasStrand = df.columns.contains(Strand)
    val locKeys = Seq(Chrom) ++ (if (hasStrand) Seq(Strand) else Nil) ++ txKeys
    val outer = UnaryOps.boundaries(df, locKeys)
    val sliced = sliceRanges(outer, locKeys, sliceStart, sliceEnd, useStrand)
      .select(txKeys.map(col) :+ col(Start).as("_ss") :+ col(End).as("_se"): _*)
    df.join(broadcast(sliced), txKeys)
      .withColumn(Start, greatest(col(Start), col("_ss")))
      .withColumn(End, least(col(End), col("_se")))
      .filter(col(End) > col(Start))
      .drop("_ss", "_se")
  }

  /** five_end (reference core/pyranges_main.py:1041-1132): the 1-bp 5'
    * point of each interval (or of each transcript with groupBy keys);
    * ext expands the point symmetrically (doctest :1115-1122). */
  def fiveEnd(df: DataFrame, useStrand: Boolean = true,
              groupKeys: Option[Seq[String]] = None, ext: Long = 0): DataFrame = {
    val point = groupKeys match {
      case Some(keys) => sliceRanges(df, keys, 0, Some(1), useStrand)
      case None =>
        val isNeg = neg(useStrand, df)
        df.withColumn("_s", when(isNeg, col(End) - 1).otherwise(col(Start)))
          .withColumn(End, col("_s") + 1).withColumn(Start, col("_s")).drop("_s")
    }
    if (ext == 0) point else UnaryOps.extend(point, ext, ext, useStrand)
  }

  /** three_end (reference core/pyranges_main.py:3848-3929). */
  def threeEnd(df: DataFrame, useStrand: Boolean = true,
               groupKeys: Option[Seq[String]] = None, ext: Long = 0): DataFrame = {
    val point = groupKeys match {
      case Some(keys) => sliceRanges(df, keys, -1, None, useStrand)
      case None =>
        val isNeg = neg(useStrand, df)
        df.withColumn("_s", when(isNeg, col(Start)).otherwise(col(End) - 1))
          .withColumn(End, col("_s") + 1).withColumn(Start, col("_s")).drop("_s")
    }
    if (ext == 0) point else UnaryOps.extend(point, ext, ext, useStrand)
  }

  private def outerPerGroup(df: DataFrame, txKeys: Seq[String]): DataFrame = {
    val hasStrand = df.columns.contains(Strand)
    val locKeys = Seq(Chrom) ++ (if (hasStrand) Seq(Strand) else Nil) ++ txKeys
    UnaryOps.boundaries(df, locKeys)
  }

  /** upstream flank (reference core/pyranges_main.py:4468-4601): region
    * of `length` ending `gap` bp before the 5' end; with groupKeys, one
    * flank per transcript at its outermost 5' end (doctest :4565-4575). */
  def upstream(df: DataFrame, length: Long, gap: Long = 0,
               useStrand: Boolean = true,
               groupKeys: Option[Seq[String]] = None): DataFrame =
    groupKeys match {
      case Some(tx) => upstream(outerPerGroup(df, tx), length, gap, useStrand)
      case None =>
        val isNeg = neg(useStrand, df)
        df.withColumn("_s", when(isNeg, col(End) + gap)
            .otherwise(col(Start) - gap - length))
          .withColumn(End, col("_s") + length)
          .withColumn(Start, col("_s")).drop("_s")
    }

  /** downstream flank (reference core/pyranges_main.py:4603-4745). */
  def downstream(df: DataFrame, length: Long, gap: Long = 0,
                 useStrand: Boolean = true,
                 groupKeys: Option[Seq[String]] = None): DataFrame =
    groupKeys match {
      case Some(tx) => downstream(outerPerGroup(df, tx), length, gap, useStrand)
      case None =>
        val isNeg = neg(useStrand, df)
        df.withColumn("_s", when(isNeg, col(Start) - gap - length)
            .otherwise(col(End) + gap))
          .withColumn(End, col("_s") + length)
          .withColumn(Start, col("_s")).drop("_s")
    }

  /** map_to_global (reference core/pyranges_main.py:1481-1719): lift
    * transcript-local intervals to genomic coordinates through an exon
    * model. `local`: (txCol, Start, End, ...) in 5'->3' transcript space;
    * `exons`: (Chromosome, Start, End, Strand, txCol). One output row per
    * overlapped exon (splits across introns). Equi-join on the transcript
    * id — broadcastable when the exon model is small. */
  /** keepId keeps the transcript-id column; keepLoc keeps the local
    * coordinates as *_local columns; pepToCds multiplies local
    * coordinates by 3 first (peptide -> CDS positions, reference
    * pyranges_main.py:1489,1522-1526,1684-1707). */
  def mapToGlobal(local: DataFrame, exons: DataFrame, txCol: String,
                  tieBreak: Seq[Column] = Nil, keepId: Boolean = true,
                  keepLoc: Boolean = false, pepToCds: Boolean = false): DataFrame = {
    val local0 =
      if (pepToCds)
        local.withColumn(Start, col(Start) * 3).withColumn(End, col(End) * 3)
      else local
    mapToGlobalImpl(local0, exons, txCol, tieBreak, keepId, keepLoc)
  }

  private def mapToGlobalImpl(local: DataFrame, exons: DataFrame, txCol: String,
                              tieBreak: Seq[Column], keepId: Boolean,
                              keepLoc: Boolean): DataFrame = {
    // This is a RANGE join in transcript-cumsum space: a plain equi-join
    // on the transcript id degenerates (few distinct transcripts in one
    // model => quasi-cartesian, 220s at sf0.1). Present the exon cumsum
    // intervals [cs, ce) as the right side of the binned range join with
    // the transcript id as the key — linear and skew-resistant.
    val cum = UnaryOps.groupCumsum(exons, Seq(txCol), useStrand = true, "_cs", "_ce", tieBreak)
      .select(col(txCol), col(Chrom).as("_chr"), col(Strand).as("_str"),
        col(Start).as("_es"), col(End).as("_ee"),
        col("_cs").as(Start), col("_ce").as(End))
    val p = graft.join.RangeJoin.pairsDispatch(local, cum, Seq(txCol))
    val cs = col(Start + "_b")
    val ce = col(End + "_b")
    val lo = greatest(cs, col(Start))
    val hi = least(ce, col(End))
    val isNeg = col("_str") === Cols.RevStrand
    // Output strand is the PRODUCT of local and exon strand (reference
    // doctest core/pyranges_main.py:1580-1600: a '-' local feature on a
    // '+' transcript points '-' in genome space, and '-'x'-' = '+').
    val outStrand =
      if (local.columns.contains(Strand))
        when(col(Strand) === col("_str"), Cols.FwdStrand).otherwise(Cols.RevStrand)
      else col("_str")
    val mapped = p.withColumn("_gs", when(isNeg, col("_ee") - (hi - cs))
        .otherwise(col("_es") + (lo - cs)))
      .withColumn("_ge", when(isNeg, col("_ee") - (lo - cs))
        .otherwise(col("_es") + (hi - cs)))
      .withColumn("_ostr", outStrand)
      .withColumn(Start + "_local", col(Start))
      .withColumn(End + "_local", col(End))
      .withColumn(Strand + "_local",
        if (local.columns.contains(Strand)) col(Strand)
        else lit(null).cast("string"))
      .withColumn(Start, col("_gs")).withColumn(End, col("_ge"))
      .withColumn(Chrom, col("_chr")).withColumn(Strand, col("_ostr"))
      .drop("_chr", "_str", "_es", "_ee", Start + "_b", End + "_b", "_gs", "_ge", "_ostr")
    val dropLoc = if (keepLoc) Nil
      else Seq(Start + "_local", End + "_local", Strand + "_local")
    val dropId = if (keepId) Nil else Seq(txCol)
    mapped.drop(dropLoc ++ dropId: _*)
  }

  /** window_ranges with group_by (reference core/pyranges_main.py:
    * 4838-5096): chop each SPLICED transcript into fixed-size windows
    * from its 5' end; windows cross exon boundaries and split into one
    * row per exon fragment. Composition: generate the windows in
    * transcript-cumsum space, then lift them through the exon model —
    * i.e. exactly mapToGlobal of a generated local table. */
  def windowRangesGrouped(df: DataFrame, txCol: String, size: Long,
                          windowIdCol: Option[String] = None,
                          tieBreak: Seq[Column] = Nil): DataFrame = {
    val cum = UnaryOps.groupCumsum(df, Seq(txCol), useStrand = true, "_cs", "_ce", tieBreak)
    val lens = cum.groupBy(col(txCol)).agg(max(col("_ce")).as("_tl"))
    // Two-stage window generation: a single explode would materialize
    // every window inside #transcripts tasks (a handful of long
    // transcripts = a handful of tasks doing all the work). Explode into
    // coarse chunks first, round-robin repartition, then explode chunks
    // into windows — generation parallelism is #chunks, not #transcripts.
    val chunk = size * 1024
    val chunks = lens
      .withColumn("_c0", explode(sequence(lit(0L), col("_tl") - 1, lit(chunk))))
    val wins = chunks
      .repartition(chunks.sparkSession.sparkContext.defaultParallelism)
      .withColumn("_ws", explode(sequence(col("_c0"),
        least(col("_c0") + chunk, col("_tl")) - 1, lit(size))))
      .select(col(txCol), col("_ws").as(Start),
        least(col("_ws") + size, col("_tl")).as(End),
        (col("_ws") / size).cast("long").as("_wid"))
    val lifted = mapToGlobal(wins, df, txCol, tieBreak)
    windowIdCol.fold(lifted.drop("_wid"))(c => lifted.withColumnRenamed("_wid", c))
  }

  /** map_to_local (reference core/pyranges_main.py:1721-1909): genomic
    * intervals -> transcript-local coordinates via overlap with the exon
    * model (range join on Chromosome [+ match_by]), clipped to exons.
    * Parity shape per the doctest (:1816-1830): output Chromosome IS the
    * transcript id, output Strand is the genomic x exon strand product;
    * keepChrom/keepLoc retain the genomic columns as *_global. */
  def mapToLocal(genomic: DataFrame, exons: DataFrame, txCol: String,
                 keys: Seq[String] = Seq(Chrom),
                 tieBreak: Seq[Column] = Nil,
                 keepChrom: Boolean = false, keepLoc: Boolean = false): DataFrame = {
    val cum = UnaryOps.groupCumsum(exons, Seq(txCol), useStrand = true, "_cs", "_ce", tieBreak)
    val p = RangeJoin.pairsDispatch(genomic, cum, keys)
    val es = col(Start + "_b")
    val ee = col(End + "_b")
    val gs = greatest(col(Start), es)
    val ge = least(col(End), ee)
    val exonStrand = if (p.columns.contains(Strand + "_b")) col(Strand + "_b") else col(Strand)
    val isNeg = exonStrand === Cols.RevStrand
    val outStrand =
      if (genomic.columns.contains(Strand))
        when(col(Strand) === exonStrand, Cols.FwdStrand).otherwise(Cols.RevStrand)
      else exonStrand
    val base = p
      .withColumn("_ls", when(isNeg, col("_cs") + (ee - ge))
        .otherwise(col("_cs") + (gs - es)))
      .withColumn("_le", when(isNeg, col("_cs") + (ee - gs))
        .otherwise(col("_cs") + (ge - es)))
      .withColumn("_ostr", outStrand)
    val withGlobals = base
      .withColumn("Chromosome_global", col(Chrom))
      .withColumn("Start_global", col(Start))
      .withColumn("End_global", col(End))
      .withColumn("Strand_global",
        if (genomic.columns.contains(Strand)) col(Strand) else lit(null).cast("string"))
    val renamed = withGlobals
      .withColumn(Chrom, col(txCol))
      .withColumn(Start, col("_ls")).withColumn(End, col("_le"))
      .withColumn(Strand, col("_ostr"))
      .drop("_cs", "_ce", "_ls", "_le", "_ostr", Start + "_b", End + "_b", txCol)
    val dropGlobals =
      (if (keepChrom) Nil else Seq("Chromosome_global")) ++
      (if (keepLoc) Nil else Seq("Start_global", "End_global", "Strand_global"))
    renamed.drop(dropGlobals: _*)
  }
}
