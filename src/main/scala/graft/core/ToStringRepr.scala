package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PyRanges-style table repr (reference core/tostring.py:58-230):
  * head rows + "..." + footer with row/column/chromosome/strand counts
  * and a per-column dtype line. For a distributed frame the "tail" half
  * of the reference's preview is replaced by a single truncation row —
  * a global tail requires a total sort, which a repr should never pay.
  *
  * Display knobs come from [[Options]] (reference core/options.py):
  * `max_rows_to_show` caps the preview, `console_width` caps the total
  * rendered width — columns past the cap are elided and the footer
  * lists up to `max_column_names_to_show` of the hidden names (plus
  * "..." when more remain), mirroring tostring.py's adjust_table_width
  * + columns_not_shown. Explicit arguments override the options. */
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

  /** `maxRows` < 0 reads Options.max_rows_to_show; `maxTotalWidth` < 0
    * reads Options.console_width (None/auto = uncapped). */
  def tostring(df: DataFrame, maxRows: Int = -1, maxColWidth: Int = 20,
               maxTotalWidth: Int = -1): String = {
    val nRows =
      if (maxRows >= 0) maxRows
      else Options.getOption("max_rows_to_show").getOrElse(8)
    val totalWidth =
      if (maxTotalWidth >= 0) maxTotalWidth
      else Options.getOption("console_width").getOrElse(Int.MaxValue)
    val namesToShow = Options.getOption("max_column_names_to_show").getOrElse(3)
    val shown = df.limit(nRows + 1).collect()
    val truncated = shown.length > nRows
    val rows = shown.take(nRows)
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
    // console-width elision: include columns left-to-right while the
    // cumulative rendered width (cell + 2-space separator) fits; when
    // any column is elided the appended "..." marker costs 5 more chars
    // (separator + 3), which the budget must reserve or lines overflow
    def fit(budget: Int): Int = {
      var cum = 0
      var inc = 0
      while (inc < headers.size &&
          cum + widths(inc) + (if (inc == 0) 0 else 2) <= budget) {
        cum += widths(inc) + (if (inc == 0) 0 else 2)
        inc += 1
      }
      inc
    }
    val all = fit(totalWidth)
    val included = math.max(1, // always show at least one column
      if (all == headers.size) all
      else if (totalWidth == Int.MaxValue) all else fit(totalWidth - 5))
    val elided = headers.size - included
    val colMarker = if (elided > 0) Seq("...") else Nil
    def keep(cells: Seq[String]): Seq[String] = cells.take(included) ++ colMarker
    val keptWidths = widths.take(included) ++ (if (elided > 0) Seq(3) else Nil)
    def fmt(cells: Seq[String]): String =
      keep(cells).zip(keptWidths).map { case (c, w) => c.padTo(w, ' ') }.mkString("  ")
    val sep = keptWidths.map("-" * _).mkString("  ")

    val total = df.count()
    val hiddenLine =
      if (elided > 0) {
        val names = headers.slice(included, included + namesToShow)
          .map(n => s""""$n"""") ++
          (if (elided > namesToShow) Seq("...") else Nil)
        s""" ($elided columns not shown: ${names.mkString(", ")})."""
      } else ""
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
      s"\nGenomicFrame with $total rows and ${headers.size} columns." +
      hiddenLine + chromLine
  }

  /** HTML repr (the Jupyter surface, reference options
    * `html_max_cols` / `html_max_rows` from core/options.py): same
    * preview semantics as [[tostring]] but capped by the html options —
    * `html_max_rows` preview rows (falling back to `max_rows_to_show`
    * when unset, matching the option's documented contract) and
    * `html_max_cols` columns, the rest elided behind a "..." column
    * with a hidden-count note. Cell text is HTML-escaped. Explicit
    * arguments override the options.
    *
    * The exact-total footer costs a `count()` job only when the frame
    * is actually truncated (otherwise the preview collect already IS
    * the total); a display surface that re-renders the same frame
    * repeatedly (Jupyter re-executing a cell) can pass a cached
    * `totalRows` to skip that job entirely. */
  def tohtml(df: DataFrame, maxRows: Int = -1, maxCols: Int = -1,
             totalRows: Long = -1L): String = {
    val nRows =
      if (maxRows >= 0) maxRows
      else Options.getOption("html_max_rows")
        .orElse(Options.getOption("max_rows_to_show")).getOrElse(8)
    val nCols =
      if (maxCols >= 0) maxCols
      else Options.getOption("html_max_cols").getOrElse(20)
    val shown = df.limit(nRows + 1).collect()
    val truncated = shown.length > nRows
    val rows = shown.take(nRows)
    val headers = df.columns.toSeq
    val dtypes = df.schema.fields.map(f => dtypeName(f.dataType)).toSeq
    val included = math.max(1, math.min(nCols, headers.size))
    val elided = headers.size - included
    val rail = if (elided > 0) Seq("...") else Nil
    def esc(v: Any): String = {
      val s = if (v == null) "null" else v.toString
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    }
    def tr(cells: Seq[String], tag: String): String =
      cells.map(c => s"<$tag>$c</$tag>").mkString("<tr>", "", "</tr>")
    val head = tr(headers.take(included).map(esc) ++ rail, "th") +
      tr(dtypes.take(included).map(esc) ++ rail, "th")
    val body = rows.toSeq.map(r =>
        tr((0 until included).map(i => esc(r.get(i))) ++ rail, "td")) ++
      (if (truncated)
        Seq(tr(Seq.fill(included + rail.size)("..."), "td")) else Nil)
    val total =
      if (totalRows >= 0L) totalRows
      else if (!truncated) rows.length.toLong // preview covered the frame
      else df.count()
    val hiddenNote =
      if (elided > 0) s""" <span>($elided columns not shown)</span>""" else ""
    s"""<div><table border="1" class="dataframe"><thead>$head</thead>""" +
      s"<tbody>${body.mkString}</tbody></table>" +
      s"<p>$total rows &#215; ${headers.size} columns$hiddenNote</p></div>"
  }
}
