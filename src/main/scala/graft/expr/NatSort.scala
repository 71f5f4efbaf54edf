package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Natural-sort key for chromosome names (chr2 < chr10 < chrX), mirroring
  * the reference's natsort-based group ordering (reference
  * methods/sort.py:12-40; core/pyranges_main.py:611-614 `chromosomes`).
  *
  * Pure built-in expression (codegen'd, no UDF): every digit run is
  * zero-padded to width 10 so lexicographic order == natural order.
  * Nine regexp passes each prepend one '0' to every digit run still
  * shorter than 10 digits; a k-digit run reaches exactly width 10 and
  * then stops matching. Runs longer than 10 digits (never occurs in
  * sequence names) are left as-is.
  */
object NatSort {
  def natsortKey(c: Column): Column =
    (1 to 9).foldLeft(c)((acc, _) =>
      regexp_replace(acc, "(?<![0-9])(\\d{1,9})(?![0-9])", "0$1"))
}
