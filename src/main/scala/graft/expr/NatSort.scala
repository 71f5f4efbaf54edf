package graft.expr

import org.apache.spark.sql.Column

/** Natural-sort key for chromosome names (chr2 < chr10 < chrX), mirroring
  * the reference's natsort-based group ordering (reference
  * methods/sort.py:12-40; core/pyranges_main.py:611-614 `chromosomes`).
  * Backed by the codegen'd NatSortKey Catalyst expression (single pass;
  * previously a 9-pass regexp_replace chain). */
object NatSort {
  def natsortKey(c: Column): Column = Exprs.natsort_key(c)
}
