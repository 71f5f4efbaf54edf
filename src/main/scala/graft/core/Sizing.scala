package graft.core

import org.apache.spark.sql.DataFrame

/** Input-size heuristics shared by the operators that auto-switch
  * between a low-stage-count plan (small inputs) and a salted/two-phase
  * plan (large inputs). Uses the optimizer's sizeInBytes estimate — for
  * parquet scans that's the pruned file size, available without running
  * a job; derived plans inherit their scan's estimate, which is exactly
  * the right signal ("how much data feeds this operator"). */
object Sizing {
  /** Above this combined estimate the per-key window sweeps switch to
    * salted two-phase plans (measured crossover at local[32]/sf0.1). */
  val saltedInputThreshold: Long = 8L << 20

  /** Higher bar for the mapPartitions sweeps (nearest): their per-row
    * cost is a single comparison, so per-key serialization only hurts
    * once keys carry hundreds of MB each. */
  val saltedSweepThreshold: Long = 64L << 20

  def bigInput(dfs: DataFrame*): Boolean = bigInputOver(saltedInputThreshold, dfs: _*)

  def bigInputOver(threshold: Long, dfs: DataFrame*): Boolean =
    dfs.map(_.queryExecution.optimizedPlan.stats.sizeInBytes).sum >
      BigInt(threshold)
}
