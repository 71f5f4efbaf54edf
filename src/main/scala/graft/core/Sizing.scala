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

  /** Above this leaf-bytes sum the per-key window sweeps (merge, cumsum,
    * RLE) switch to salted two-phase plans. MEASURED crossover
    * (graft.SaltBench, local[32], hot-key table with one chromosome
    * holding ~2/3 of rows over a ~240 MB-coordinate span — BASELINE.md
    * "salted crossover" table): salted wins 1.3-2.2x at 43 MB,
    * 2.0-2.9x at 158 MB, 3.6-4.9x at 627 MB; plain won 2-6x at the
    * natural sf0.1 shape (13-17 MB, round-2 rows). 32 MB sits in the
    * measured bracket (17, 43) and keeps every sf0.1 bench input
    * (<= 14 MB leaf bytes) on the plain path it measured fastest on. */
  val saltedInputThreshold: Long = 32L << 20

  /** Same bar for the window-scan nearest sweep: the round-3 guess of
    * 1 GB ("per-row cost is a single comparison") measured WRONG —
    * salted nearest wins 1.97x already at 43 MB and 2.1x at 627 MB on
    * the hot-key table, so the sweep follows the same 32 MB crossover. */
  val saltedSweepThreshold: Long = 32L << 20

  /** Last auto-switch decision: (operator, leafBytes, wentSalted).
    * Test/debug observability only. */
  val lastDecision =
    new java.util.concurrent.atomic.AtomicReference[(String, Long, Boolean)]()

  /** Sampled mega-bin width for the salted two-phase plans: aim for ~8
    * bins per core over the observed coordinate span, rounded up in
    * powers of two, clamped to [16384, 2^24]. Bounded `limit(sampleRows)`
    * sample — one small single-stage job independent of table size (the
    * RangeJoin.autoBinSize pattern), and it only runs once a salted gate
    * has already fired on a large input. Guards the measured narrow-span
    * failure mode: a fixed 1M-wide bin over a ~1M-coordinate span handed
    * the salted merge two bins of parallelism and it LOST 0.78x at
    * 609 MB (BASELINE.md "salted crossover" notes). */
  def autoSaltBin(df: DataFrame, sampleRows: Int = 100000): Long =
    saltPlan(df, Nil, sampleRows).getOrElse(16384L)

  /** Span- and key-aware dispatch decision: Some(binWidth) = salt with
    * that mega-bin, None = stay on the plain per-key window regardless
    * of input size, because the sample shows the split cannot pay:
    *
    *  - NARROW SPAN: fewer than ~4 floor-width bins of coordinates —
    *    the measured 0.78x failure mode (BASELINE.md).
    *  - MANY BALANCED KEYS: the plain window already has more groups
    *    than cores, so parallelism is free and the salted plan's extra
    *    join/stages only cost — measured 0.56-0.84x at 2000 balanced
    *    keys ("--manykeys" row in BASELINE.md). The demotion is
    *    deliberately ONE-SIDED against sampling bias: a limit() sample
    *    of key-clustered data (the common coordinate-sorted layout)
    *    shows few keys and therefore keeps salting — it can only
    *    demote when the sample PROVES >= 4x-cores distinct keys AND no
    *    sampled key holds a hot share, both of which under-, never
    *    over-trigger on clustered samples.
    *
    * Both signals come from one bounded `limit(sampleRows)` sample
    * (two tiny aggregations) — plan-time-safe against 100 TB inputs. */
  def saltPlan(df: DataFrame, keys: Seq[String] = Nil,
               sampleRows: Int = 100000): Option[Long] = {
    import org.apache.spark.sql.functions._
    val cores = math.max(df.sparkSession.sparkContext.defaultParallelism, 1)
    val sample = df.limit(sampleRows)
      .select(keys.map(col) ++ Seq(col(Cols.Start).cast("long").as("_s"),
        col(Cols.End).cast("long").as("_e")): _*)
    // one sample job: per-key partials re-aggregated to (distinct keys,
    // hottest-key rows, total rows, span) in a single pass
    val (minS, maxE, manyBalancedKeys) =
      if (keys.isEmpty) {
        val r = sample.agg(min(col("_s")), max(col("_e"))).head()
        (if (r.isNullAt(0)) None else Some(r.getLong(0)),
         if (r.isNullAt(1)) None else Some(r.getLong(1)), false)
      } else {
        val r = sample.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("_n"), min(col("_s")).as("_mns"),
            max(col("_e")).as("_mxe"))
          .agg(count(lit(1)), max(col("_n")), sum(col("_n")),
            min(col("_mns")), max(col("_mxe"))).head()
        val distinct = r.getLong(0)
        if (distinct == 0) (None, None, false)
        else {
          val hottest = r.getLong(1).toDouble / math.max(r.getLong(2), 1L)
          (Some(r.getLong(3)), Some(r.getLong(4)),
            distinct >= 4L * cores && hottest <= 1.0 / (2 * cores))
        }
      }
    def binFor(s: Long, e: Long): Long = {
      val span = math.max(e - s, 1L)
      val target = span / (8L * cores)
      var b = 16384L
      while (b < target && b < (1L << 24)) b *= 2
      b
    }
    val plan = forced() match {
      // forced salted: the audit wants the salted plan SHAPE, so the
      // narrow-span / many-balanced-keys demotions are bypassed
      case Some(true) => Some(binFor(minS.getOrElse(0L), maxE.getOrElse(1L)))
      case Some(false) => None
      case None => (minS, maxE) match {
        case (Some(s), Some(e)) if !manyBalancedKeys =>
          if (math.max(e - s, 1L) < 4L * 16384L) None
          else Some(binFor(s, e))
        case _ => None
      }
    }
    Sizing.log.info("[graft.sizing] saltPlan={}",
      plan.map(_.toString).getOrElse(
        if (manyBalancedKeys) "plain (many balanced keys)"
        else "plain (narrow span or empty)"))
    plan
  }

  /** Sum of leaf-relation size estimates across the given plans. */
  def leafScanBytes(dfs: DataFrame*): BigInt =
    dfs.map(_.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).sum).sum

  /** Conf key for the small-scan fan-out gate (shared by the range-join
    * probe side and the ML kernels; 0 disables). Historic name — the
    * gate now covers every expensive-compute-behind-a-tiny-scan site,
    * not just joins. */
  val FanoutKey = "spark.graft.join.fanoutScanBytes"

  /** Restore parallelism behind a tiny scan feeding expensive per-row
    * compute (shingle+hash kernels, quantized dot products, bin-explode
    * probes). A small parquet input is often ONE row group = one task,
    * serializing a 32-core pipeline behind one core; a bounded
    * round-robin repartition fixes that for the price of one narrow
    * exchange. Gated on leaf bytes <= [[FanoutKey]] (default 256 MB):
    * at cluster scale the scan has thousands of splits and this is a
    * no-op — it is exclusively a small-input fixup. Streaming frames
    * pass through untouched (micro-batch sizing is the trigger's job
    * and leaf stats are undefined mid-stream). */
  def fanOutSmallScan(df: DataFrame): DataFrame = {
    val thr = org.apache.spark.sql.internal.SQLConf.get
      .getConfString(FanoutKey, (256L << 20).toString).toLong
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (!df.isStreaming && thr > 0 && target > 1 && leafScanBytes(df) <= thr)
      df.repartition(target)
    else df
  }

  /** Conf key overriding every size gate: "salted" forces the big-input
    * branch, "plain" forces the small one, anything else defers to the
    * measured thresholds. The audit hook for PLANS.md's forced-gate
    * section and PlanContractSpec: the plans a 100x-the-bench run would
    * execute are the ABOVE-gate branches, which sf0.1 leaf bytes never
    * trigger — forcing the gate lets the contract tests pin those plan
    * shapes without terabyte fixtures. */
  val ForceKey = "spark.graft.sizing.force"

  private def forced(): Option[Boolean] =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString(ForceKey, "") match {
      case "salted" => Some(true)
      case "plain" => Some(false)
      case _ => None
    }

  /** Gate + log: true = take the salted path. */
  def decide(op: String, threshold: Long, dfs: DataFrame*): Boolean = {
    val bytes = leafScanBytes(dfs: _*)
    val big = forced().getOrElse(bytes > threshold)
    lastDecision.set((op, bytes.toLong, big))
    log.info("[graft.sizing] {}: leafScanBytes={} threshold={} -> {}{}",
      op, bytes, threshold.asInstanceOf[AnyRef],
      if (big) "salted" else "plain",
      if (forced().isDefined) " (FORCED)" else "")
    big
  }

  def bigInput(dfs: DataFrame*): Boolean =
    bigInputOver(saltedInputThreshold, dfs: _*)

  def bigInputOver(threshold: Long, dfs: DataFrame*): Boolean =
    leafScanBytes(dfs: _*) > BigInt(threshold)
}
