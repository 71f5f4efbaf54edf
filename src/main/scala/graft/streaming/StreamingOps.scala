package graft.streaming

import graft.core.Cols
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming interval operators.
  *
  * The reference has no streaming story (SURVEY.md §1.4) — this is the
  * beyond-parity extension: the interval kernels whose sweeps are
  * per-group monotone (coverage, merge) run incrementally under event
  * time. Designed for the 100 TB ingest case: a sorted interval stream
  * (e.g. position-sorted alignments) folds into islands/coverage with
  * state bounded by the number of open islands per key, not the stream
  * length.
  */
object StreamingOps {
  import Cols._

  /** Streaming tile coverage: count intervals per (Chromosome, tile) and
    * event-time window. Standard watermark + windowed agg — append mode
    * emits finalized windows only. `df` must be a streaming DataFrame
    * with an event-time column `tsCol`. */
  def tileCoverage(df: DataFrame, tileSize: Long, tsCol: String,
                   watermark: String = "10 minutes",
                   windowLen: String = "5 minutes"): DataFrame =
    df.withColumn("_tile", explode(sequence(
        floor(col(Start).cast("double") / tileSize).cast("long"),
        floor((col(End) - 1).cast("double") / tileSize).cast("long"))))
      .withWatermark(tsCol, watermark)
      .groupBy(col(Chrom), col("_tile"), window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("n_intervals"))
      .select(col(Chrom), (col("_tile") * tileSize).as(Start),
        ((col("_tile") + 1) * tileSize).as(End),
        col("window.start").as("window_start"), col("n_intervals"))

  /** Streaming exact dedup for a document stream: content-hash key,
    * state bounded by the watermark horizon (Spark evicts seen keys
    * older than the watermark — the idiomatic scale-safe streaming
    * dedup; an unbounded dropDuplicates would grow state forever at
    * 100 TB/day ingest). */
  def streamingDedupExact(df: DataFrame, textCol: String, tsCol: String,
                          watermark: String = "1 hour"): DataFrame =
    df.withColumn("_h", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("_h")
      .drop("_h")

  /** Stream-static interval join: each streaming row joins the (small)
    * static interval table on `keys` equality plus half-open containment
    * of its `posCol` in the static row's [startCol, endCol). The static
    * side is BROADCAST to every executor, so the stream never shuffles
    * before the join and no join state accrues — the scale shape for
    * enriching an unbounded event stream against a bounded dimension of
    * ranges (campaign windows, genomic annotation, feature flags by
    * time). Stateless (plain inner join), so it composes with any
    * downstream output mode; the static side's key columns are dropped
    * (the stream's survive). */
  def streamStaticIntervalJoin(stream: DataFrame, dim: DataFrame,
                               keys: Seq[String], posCol: String,
                               startCol: String, endCol: String): DataFrame = {
    val cond = (keys.map(k => stream(k) === dim(k)) :+
      (stream(posCol) >= dim(startCol)) :+
      (stream(posCol) < dim(endCol))).reduce(_ && _)
    keys.foldLeft(stream.join(broadcast(dim), cond))((d, k) => d.drop(dim(k)))
  }

  case class OpenIsland(start: Long, end: Long, n: Long)
  case class MergeState(open: Option[OpenIsland], maxStartSeen: Long)
  case class Island(chromosome: String, start: Long, end: Long, n: Long)
  case class InInterval(chromosome: String, start: Long, end: Long)

  /** Streaming merge_overlaps for a START-SORTED interval stream (the
    * sorted-BAM ingest case): per chromosome, intervals arriving in
    * non-decreasing Start order fold into the single open island; an
    * island is emitted as soon as a new interval starts beyond its end
    * (+slack). State per key = one open island — O(1). Out-of-order rows
    * within a micro-batch are handled (sorted in-memory per batch);
    * across batches the start-sorted assumption is required and rows
    * behind the open island's start extend it conservatively. */
  def streamingMerge(ds: Dataset[InInterval], slack: Long = 0): Dataset[Island] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.chromosome)
      .flatMapGroupsWithState[MergeState, Island](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (chrom, rows, state: GroupState[MergeState]) =>
          val sorted = rows.toSeq.sortBy(r => (r.start, r.end))
          var st = state.getOption.getOrElse(MergeState(None, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer[Island]()
          for (r <- sorted) {
            st.open match {
              case None =>
                st = MergeState(Some(OpenIsland(r.start, r.end, 1)), r.start)
              case Some(oi) =>
                if (r.start >= oi.end + slack) {
                  out += Island(chrom, oi.start, oi.end, oi.n)
                  st = MergeState(Some(OpenIsland(r.start, r.end, 1)), r.start)
                } else {
                  st = MergeState(Some(OpenIsland(math.min(oi.start, r.start),
                    math.max(oi.end, r.end), oi.n + 1)), math.max(st.maxStartSeen, r.start))
                }
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
