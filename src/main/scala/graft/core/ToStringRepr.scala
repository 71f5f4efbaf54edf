package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PyRanges-style table repr (reference core/tostring.py:58-230):
  * head rows + "..." + footer with row/column/chromosome/strand counts
  * and a per-column dtype line. For a distributed frame the "tail" half
  * of the reference's preview is replaced by a single truncation row —
  * a global tail requires a total sort, which a repr should never pay. */
object ToStringRepr {

  private def dtypeName(dt: DataType): String = dt match {
    case LongType => "int64"
    case IntegerType => "int32"
    case DoubleType => "float64"
    case FloatType => "float32"
    case StringType => "str"
    case BooleanType => "bool"
    case t => t.simpleString
  }

  def tostring(df: DataFrame, maxRows: Int = 8, maxColWidth: Int = 20): String = {
    val shown = df.limit(maxRows + 1).collect()
    val truncated = shown.length > maxRows
    val rows = shown.take(maxRows)
    val headers = df.columns.toSeq
    val dtypes = df.schema.fields.map(f => dtypeName(f.dataType)).toSeq

    def cell(v: Any): String = {
      val s = if (v == null) "null" else v.toString
      if (s.length > maxColWidth) s.take(maxColWidth - 3) + "..." else s
    }
    val body = rows.map(r => headers.indices.map(i => cell(r.get(i)))) ++
      (if (truncated) Seq(headers.indices.map(_ => "...")) else Nil)
    val table = Seq(headers.map(cell), dtypes.map(cell)) ++ body
    val widths = headers.indices.map(i => table.map(_(i).length).max)
    def fmt(cells: Seq[String]): String =
      cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }.mkString("  ")
    val sep = widths.map("-" * _).mkString("  ")

    val total = df.count()
    val chromLine =
      if (headers.contains(Cols.Chrom)) {
        val aggs = Seq(countDistinct(col(Cols.Chrom)).as("c")) ++
          (if (headers.contains(Cols.Strand))
             Seq(countDistinct(col(Cols.Strand)).as("s")) else Nil)
        val r = df.agg(aggs.head, aggs.tail: _*).head
        val c = r.getLong(0)
        val s = if (headers.contains(Cols.Strand)) s" and ${r.getLong(1)} strands" else ""
        s"\nContains $c chromosomes$s."
      } else ""
    (Seq(fmt(headers.map(cell)), fmt(dtypes.map(cell)), sep) ++ body.map(fmt))
      .mkString("\n") +
      s"\nGenomicFrame with $total rows and ${headers.size} columns." + chromLine
  }
}
