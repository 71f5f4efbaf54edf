package graft.io

import graft.core.Cols
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BED 3-12 reader/writer (reference readers.py:60-146 `read_bed`,
  * core/out.py:75-161 `to_bed`). BED is 0-based half-open — no coordinate
  * shift. Gzip handled transparently by the Spark text datasource.
  * Partition-parallel scan; schema fixed so the parquet-style pushdown
  * (column pruning) works on the projected columns.
  */
object Bed {
  import Cols._

  /** Standard BED column names in order (reference readers.py:75-88). */
  val bedCols: Seq[String] = Seq(Chrom, Start, End, "Name", "Score", Strand,
    "ThickStart", "ThickEnd", "ItemRGB", "BlockCount", "BlockSizes", "BlockStarts")

  private val colType: Map[String, DataType] = Map(
    Chrom -> StringType, Start -> LongType, End -> LongType,
    "Name" -> StringType, "Score" -> StringType, Strand -> StringType,
    "ThickStart" -> LongType, "ThickEnd" -> LongType, "ItemRGB" -> StringType,
    "BlockCount" -> LongType, "BlockSizes" -> StringType, "BlockStarts" -> StringType)

  /** Read a BED file; the column count of the first data row decides how
    * many standard columns apply. Lines starting with track/browser/# are
    * skipped (header sniffing, reference readers.py:97-111). */
  def read(spark: SparkSession, path: String, nCols: Int = 6): DataFrame = {
    val schema = StructType(bedCols.take(nCols).map(c =>
      StructField(c, colType(c), nullable = true)))
    spark.read
      .option("delimiter", "\t")
      .option("comment", "#")
      .schema(schema)
      .csv(path)
      .filter(!col(Chrom).startsWith("track") && !col(Chrom).startsWith("browser"))
  }

  /** Write as BED: standard columns in order with "." fills, then any
    * non-standard metadata columns appended (reference core/out.py:75-85:
    * nonstandard columns ride along after the standard 12). */
  def write(df: DataFrame, path: String): Unit = {
    val present = df.columns.toSet
    val upto = bedCols.lastIndexWhere(present.contains) max 2
    val std = bedCols.take(upto + 1).map(c =>
      if (present.contains(c)) col(c).cast("string") else lit("."))
    val extra = df.columns.filterNot(bedCols.contains).map(c => col(c).cast("string"))
    df.select(std ++ extra: _*)
      .write.option("delimiter", "\t").option("header", "false")
      .mode("overwrite").csv(path)
  }
}
