package graft.ops

import graft.core.Cols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise interval metrics over a joined frame carrying (Start, End,
  * Start_b, End_b) — reference methods/interval_metrics.py:16-131 and
  * combine_interval_columns (reference range_frame/range_frame.py:159-214,
  * methods/combine_positions.py:5-45). Pure column arithmetic, fully
  * codegen'd.
  */
object Metrics {
  import Cols.{Start, End, Strand}

  private def s(suffix: String)  = col(Start + suffix)
  private def e(suffix: String)  = col(End + suffix)

  def overlapLength(suffix: String = "_b"): Column =
    greatest(least(col(End), e(suffix)) - greatest(col(Start), s(suffix)), lit(0L))

  def unionLength(suffix: String = "_b"): Column =
    (col(End) - col(Start)) + (e(suffix) - s(suffix)) - overlapLength(suffix)

  def jaccard(suffix: String = "_b"): Column =
    overlapLength(suffix).cast("double") / unionLength(suffix)

  def fractionOverlap(denom: String = "first", suffix: String = "_b"): Column = {
    val d = denom match {
      case "first"  => col(End) - col(Start)
      case "second" => e(suffix) - s(suffix)
      case _        => unionLength(suffix)
    }
    overlapLength(suffix).cast("double") / d
  }

  /** Unsigned gap in bases; 0 when overlapping OR abutting (reference
    * compute_interval_metrics doctest, core/pyranges_main.py:5485-5487 —
    * note this differs from nearest's touching=1 convention,
    * README.md:51-53, which BinaryOps.nearest/NearestK implement). */
  def distance(suffix: String = "_b"): Column =
    greatest(greatest(col(Start), s(suffix)) - least(col(End), e(suffix)), lit(0L))

  /** Signed gap: positive when the second interval is downstream of the
    * first, negative when upstream, 0 when touching/overlapping
    * (reference core/pyranges_main.py:5492-5495). */
  def signedDistance(suffix: String = "_b"): Column =
    when(s(suffix) >= col(End), greatest(s(suffix) - col(End), lit(0L)))
      .when(col(Start) >= e(suffix), -greatest(col(Start) - e(suffix), lit(0L)))
      .otherwise(lit(0L))

  /** Boolean overlap flag. */
  def overlapFlag(suffix: String = "_b"): Column =
    col(Start) < e(suffix) && s(suffix) < col(End)

  /** 2*overlap / (len1 + len2), reference symmetric_coverage. */
  def symmetricCoverage(suffix: String = "_b"): Column =
    overlapLength(suffix).cast("double") * 2 /
      ((col(End) - col(Start)) + (e(suffix) - s(suffix)))

  /** Midpoint distance ×2 (doubled to stay integral). */
  def midpointDistance2(suffix: String = "_b"): Column =
    abs((col(Start) + col(End)) - (s(suffix) + e(suffix)))

  def relativeDirection(suffix: String = "_b"): Column =
    when(col(Strand) === col(Strand + suffix), "same").otherwise("opposite")

  /** combine_interval_columns presets. */
  def combineIntersect(df: DataFrame, suffix: String = "_b"): DataFrame =
    df.withColumn(Start, greatest(col(Start), s(suffix)))
      .withColumn(End, least(col(End), e(suffix)))
      .drop(Start + suffix, End + suffix)

  def combineUnion(df: DataFrame, suffix: String = "_b"): DataFrame =
    df.withColumn(Start, least(col(Start), s(suffix)))
      .withColumn(End, greatest(col(End), e(suffix)))
      .drop(Start + suffix, End + suffix)

  def combineSwap(df: DataFrame, suffix: String = "_b"): DataFrame = {
    df.withColumn("_ts", col(Start)).withColumn("_te", col(End))
      .withColumn(Start, s(suffix)).withColumn(End, e(suffix))
      .withColumn(Start + suffix, col("_ts")).withColumn(End + suffix, col("_te"))
      .drop("_ts", "_te")
  }
}
