package graft.core

import org.apache.spark.sql.DataFrame

/** Input-size heuristics shared by the operators that auto-switch
  * between a low-stage-count plan (small inputs) and a salted/two-phase
  * plan (large inputs).
  *
  * The signal is the sum of the LEAF relations' size estimates — for
  * parquet scans, the file bytes, available without running a job.
  * Round-2 gated on the derived plan's estimate instead, and projection
  * width re-estimation made the same physical input look 2-5x larger or
  * smaller depending on how many string columns the query touched — the
  * gate misfired both ways. Leaf bytes are stable under projections and
  * measure exactly "how much data feeds this operator".
  *
  * Every decision is logged (and recorded in `lastDecision` for plan-
  * contract tests), per the round-2 verdict: an auto-switch nobody can
  * observe is an auto-switch nobody can debug.
  */
object Sizing {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Above this leaf-bytes sum the per-key window sweeps (cumsum, RLE)
    * switch to salted two-phase plans. Crossover rationale: the failure
    * mode being prevented is one hot key serializing into a single
    * task's sort; a ~256 MB key (~5M rows) single-task-sorts in seconds,
    * while the salted plan's fixed cost is ~2 extra exchanges — below
    * this the plain window wins on stage count (measured at
    * local[32]/sf0.1: salting 13 MB inputs was 2-6x SLOWER end-to-end;
    * BASELINE.md round-2 rows). */
  val saltedInputThreshold: Long = 256L << 20

  /** Higher bar for the mapPartitions sweeps (nearest): their per-row
    * cost is a single comparison, so per-key serialization only hurts
    * once keys carry ~GBs each. */
  val saltedSweepThreshold: Long = 1024L << 20

  /** Last auto-switch decision: (operator, leafBytes, wentSalted).
    * Test/debug observability only. */
  val lastDecision =
    new java.util.concurrent.atomic.AtomicReference[(String, Long, Boolean)]()

  /** Sum of leaf-relation size estimates across the given plans. */
  def leafScanBytes(dfs: DataFrame*): BigInt =
    dfs.map(_.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).sum).sum

  /** Gate + log: true = take the salted path. */
  def decide(op: String, threshold: Long, dfs: DataFrame*): Boolean = {
    val bytes = leafScanBytes(dfs: _*)
    val big = bytes > threshold
    lastDecision.set((op, bytes.toLong, big))
    log.info("[graft.sizing] {}: leafScanBytes={} threshold={} -> {}",
      op, bytes, threshold.asInstanceOf[AnyRef],
      if (big) "salted" else "plain")
    big
  }

  def bigInput(dfs: DataFrame*): Boolean =
    bigInputOver(saltedInputThreshold, dfs: _*)

  def bigInputOver(threshold: Long, dfs: DataFrame*): Boolean =
    leafScanBytes(dfs: _*) > BigInt(threshold)
}
