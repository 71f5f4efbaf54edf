package graft.ops

import graft.core.Cols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Coverage / run-length encoding (reference core/pyranges_main.py:
  * 4344-4466 `to_rle`; methods/to_rle.py:15-63): per-key RLE coverage
  * vector as a DataFrame of constant-coverage runs — emit (Start, +v) and
  * (End, -v) events, per-key prefix sum, pair adjacent breakpoints.
  * This is also the data behind to_bigwig (reference core/out.py:164-224).
  */
object Coverage {
  import Cols.{Start, End}

  /** Runs of constant coverage between min(Start) and max(End) per key.
    * valueCol: weight column (default 1 per interval). Zero-coverage runs
    * interior to the span are included; flanking zero runs are not. */
  def toRle(df: DataFrame, keys: Seq[String],
            valueCol: Option[String] = None,
            scoreCol: String = "Score"): DataFrame = {
    val k = keys.map(col)
    val v = valueCol.map(col).getOrElse(lit(1L)).cast("double")
    val ev = df.select(k :+ explode(array(
        struct(col(Start).as("_pos"), v.as("_d")),
        struct(col(End).as("_pos"), (-v).as("_d")))).as("_ev"): _*)
      .select(k ++ Seq(col("_ev._pos").as("_pos"), col("_ev._d").as("_d")): _*)
      .groupBy(k :+ col("_pos"): _*).agg(sum(col("_d")).as("_d"))
    val w = Window.partitionBy(k: _*).orderBy(col("_pos"))
    ev.withColumn(scoreCol,
        sum(col("_d")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_next", lead(col("_pos"), 1).over(w))
      .filter(col("_next").isNotNull)
      .select(k ++ Seq(col("_pos").as(Start), col("_next").as(End), col(scoreCol)): _*)
  }
}
