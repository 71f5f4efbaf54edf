package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-name contract for genomic interval tables.
  *
  * Mirrors the reference's column constants (reference:
  * pyranges1/core/names.py:41-56 — GENOME_LOC_COLS = [Chromosome, Start,
  * End], valid strand values "+"/"-"). Coordinates are 0-based half-open
  * [Start, End). All coordinates are LongType (the reference preserves
  * narrow int dtypes; Spark has no unsigned ints so we normalize to Long —
  * documented deviation, see SURVEY.md §1.4).
  */
object Cols {
  val Chrom  = "Chromosome"
  val Start  = "Start"
  val End    = "End"
  val Strand = "Strand"
  /** Explicit row-identity column replacing the pandas index contract
    * (reference documents index preserved/duplicated per op). */
  val RowId  = "row_id"
  val GenomeLoc: Seq[String] = Seq(Chrom, Start, End)
  val FwdStrand = "+"
  val RevStrand = "-"
}

/** Binary-op strand matching knob (reference
  * core/pyranges_helpers.py:274-313). "Opposite" is implemented by
  * flipping other's strand before grouping (reference :222-224). */
sealed trait StrandBehavior
object StrandBehavior {
  case object Auto     extends StrandBehavior
  case object Same     extends StrandBehavior
  case object Opposite extends StrandBehavior
  case object Ignore   extends StrandBehavior
}

/** Thin wrapper over a DataFrame carrying the genomic schema contract.
  * Every operator is a pure DataFrame => DataFrame function; this class
  * only resolves group keys (Chromosome [+ Strand] [+ matchBy]) the way
  * the reference's prepare_by_single/prepare_by_binary helpers do
  * (reference core/pyranges_helpers.py:157-227).
  */
final case class GenomicFrame(df: DataFrame) {
  import Cols._

  def hasStrand: Boolean = df.columns.contains(Strand)

  /** use_strand="auto" resolution: strand column present. The reference
    * additionally checks strand validity (values all +/-); we assume the
    * ingest path normalized strands (validate() reports otherwise). */
  def resolveUseStrand(useStrand: Option[Boolean]): Boolean =
    useStrand.getOrElse(hasStrand)

  def groupCols(useStrand: Boolean, matchBy: Seq[String] = Nil): Seq[String] =
    (Seq(Chrom) ++ (if (useStrand && hasStrand) Seq(Strand) else Nil)) ++ matchBy

  /** Validity reasons, mirroring InvalidRangesReason (reference
    * range_frame/range_frame_validator.py:99-130). */
  def invalidRanges: DataFrame = {
    val reason = when(col(Start).isNull || col(End).isNull, "nan_positions")
      .when(col(End) <= col(Start), "empty_or_negative_length")
      .when(col(Start) < 0, "negative_positions")
    df.withColumn("invalid_reason", reason).filter(col("invalid_reason").isNotNull)
  }

  /** loci accessor sugar (reference core/loci_getter.py:21-149):
    * chromosome/strand/range filter, predicate-pushdown friendly. */
  def loci(chrom: String, strand: Option[String] = None,
           start: Option[Long] = None, end: Option[Long] = None): GenomicFrame = {
    var c: Column = col(Chrom) === chrom
    strand.foreach(s => c = c && col(Strand) === s)
    start.foreach(b => c = c && col(End) > b)
    end.foreach(e => c = c && col(Start) < e)
    GenomicFrame(df.filter(c))
  }

  def lengths: DataFrame = df.withColumn("length", col(End) - col(Start))

  def flipStrand: GenomicFrame = GenomicFrame(
    df.withColumn(Strand, when(col(Strand) === FwdStrand, RevStrand).otherwise(FwdStrand)))

  def removeStrand: GenomicFrame = GenomicFrame(df.drop(Strand))

  /** Attach a unique row id if absent (ingest-time; ops thread it). */
  def withRowId: GenomicFrame =
    if (df.columns.contains(RowId)) this
    else GenomicFrame(df.withColumn(RowId, monotonically_increasing_id()))
}
