package graft.plans

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.LongType

/** Whole-operator Catalyst form of the sort-merge interval sweep
  * (SURVEY.md §4.3 option (c)): the physical alternative to the binned
  * range join for the long-interval regime, where exploding each row
  * into len/binSize bins makes the binned plan's row count blow up.
  *
  * Logical node + SparkStrategy + SparkPlan, registered through
  * [[GraftExtensions]] (and self-registered into
  * `spark.experimental.extraStrategies` by [[IntervalJoinRewrite]] when
  * it emits this node), per the preference order in SURVEY.md §4:
  * compose built-ins where possible, custom operator only where the
  * built-in plan genuinely can't express the semantics — here, a
  * co-grouped forward sweep that emits each overlapping pair exactly
  * once with zero row amplification.
  *
  * `joinType` Inner emits the matching (left ++ right) pairs; LeftSemi /
  * LeftAnti emit each left row at most once by row identity — matched
  * rows on first match (semi) or never-matched rows at eviction (anti) —
  * so the existence joins need NO row-id tagging, no re-join, and no
  * double evaluation of the probe side (a nondeterministic-rid rejoin
  * plan is wrong whenever the two evaluations can disagree).
  *
  * Scale shape: both children hash-cluster on the group keys (Spark's
  * EnsureRequirements inserts compatible exchanges + per-partition
  * sorts by (keys, start)); each partition then runs one forward merge
  * holding only the active interval set of each side — memory is the
  * maximum concurrent overlap depth, never the partition size, and the
  * operator streams. Equivalent to the reference's sort-sweep kernel
  * (reference methods/overlap.py:20-47); `slack` extends the LEFT side
  * for matching only (core/pyranges_main.py:2393-2615).
  */
case class IntervalSweepJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    lStart: Expression,
    lEnd: Expression,
    rStart: Expression,
    rEnd: Expression,
    slack: Long,
    condition: Expression,
    joinType: JoinType = Inner) extends BinaryNode {
  require(joinType == Inner || joinType == LeftSemi || joinType == LeftAnti,
    s"IntervalSweepJoinNode supports Inner/LeftSemi/LeftAnti, got $joinType")
  override def output: Seq[Attribute] =
    if (joinType == Inner) left.output ++ right.output else left.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalSweepJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[IntervalSweepJoinNode]] as [[IntervalSweepJoinExec]]. */
object IntervalSweepStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalSweepJoinNode(l, r, lk, rk, ls, le, rs, re, slack, cond, jt) =>
      IntervalSweepJoinExec(lk, rk, ls, le, rs, re, slack, cond, jt,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical sort-merge interval sweep.
  *
  * Requires both children clustered on the join keys and sorted by
  * (keys, start) — the planner inserts the exchanges/sorts, and reuses
  * an existing compatible partitioning when one is already there. One
  * forward pass per partition merges the two sorted streams by
  * (key, sweep position); each side's rows enter an active buffer at
  * their (slack-extended, for the left) start and leave when the sweep
  * passes their end, so every overlapping pair meets exactly once — at
  * the later of the two starts — and is checked against the full
  * original join condition (exactness therefore never depends on the
  * sweep's geometry, including degenerate End <= Start rows; eviction
  * is still final because a future right start >= the evicted left end
  * falsifies the retained range conjunct).
  *
  * Rows with a NULL in any key follow SQL equi-join semantics (EqualTo
  * never matches on NULL): skipped on read, except LeftAnti emits
  * null-key LEFT rows immediately (they can never match).
  */
case class IntervalSweepJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    lStart: Expression,
    lEnd: Expression,
    rStart: Expression,
    rEnd: Expression,
    slack: Long,
    condition: Expression,
    joinType: JoinType,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (joinType == Inner) left.output ++ right.output else left.output

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // slack shifts left positions by a constant, so ordering by the raw
  // start column is the sweep order on both sides
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(lStart, Ascending),
      rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rStart, Ascending))

  // every output row is built from a left row of the same partition
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val (lsE, leE, rsE, reE) = (lStart, lEnd, rStart, rEnd)
    val cond = condition
    val slk = slack
    val jt = joinType
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lPosProj = UnsafeProjection.create(Seq(
        Subtract(Cast(lsE, LongType), Literal(slk)),
        Add(Cast(leE, LongType), Literal(slk))), lOut)
      val rPosProj = UnsafeProjection.create(Seq(
        Cast(rsE, LongType), Cast(reE, LongType)), rOut)
      val keyOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val pred = Predicate.create(cond, lOut ++ rOut)
      pred.initialize(TaskContext.getPartitionId())
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(outAttrs,
        if (jt == Inner) lOut ++ rOut else lOut)
      val semi = jt == LeftSemi
      val anti = jt == LeftAnti

      new Iterator[InternalRow] {
        // stream heads: row/key buffers are the iterator's and the
        // projections' reuse buffers — valid until the next advance,
        // which only happens after the head is fully processed
        private var lRow: InternalRow = _
        private var lKey: UnsafeRow = _
        private var lPosS = 0L
        private var lPosE = 0L
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rPosS = 0L
        private var rPosE = 0L
        private var curKey: UnsafeRow = _ // copy; owns its bytes
        private val activeL = new scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]
        private val activeR = new scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]
        private var pending: Iterator[InternalRow] = Iterator.empty
        private var flushed = false

        advanceL()
        advanceR()

        private def advanceL(): Unit = {
          lRow = null
          while (lRow == null && lIt.hasNext) {
            val row = lIt.next()
            val k = lKeyProj(row)
            if (!k.anyNull) {
              lRow = row
              lKey = k
              val p = lPosProj(row)
              lPosS = p.getLong(0)
              lPosE = p.getLong(1)
            } else if (anti) {
              // a null-key left row matches nothing: anti emits it now
              // (projection deferred to consumption: outProj's buffer is
              // shared, an eager call here would alias queued emissions)
              val c = row.copy()
              pending = pending ++ Iterator.single(c).map(outProj(_))
            }
          }
        }

        private def advanceR(): Unit = {
          rRow = null
          while (rRow == null && rIt.hasNext) {
            val row = rIt.next()
            val k = rKeyProj(row)
            if (!k.anyNull) {
              rRow = row
              rKey = k
              val p = rPosProj(row)
              rPosS = p.getLong(0)
              rPosE = p.getLong(1)
            }
          }
        }

        /** Drop entries the sweep has passed; anti emits evicted LEFT
          * entries (eviction proves no future right row can match). */
        private def evictL(pos: Long): Unit = {
          var i = 0
          while (i < activeL.length) {
            if (activeL(i)._1 <= pos) {
              val dropped = activeL.remove(i)
              if (anti) pending =
                pending ++ Iterator.single(dropped._2).map(outProj(_))
            } else i += 1
          }
        }

        private def evictR(pos: Long): Unit = {
          var i = 0
          while (i < activeR.length) {
            if (activeR(i)._1 <= pos) activeR.remove(i) else i += 1
          }
        }

        /** Anti: flush still-unmatched left entries (group change / end). */
        private def flushL(): Unit = {
          if (anti && activeL.nonEmpty) {
            val rows = activeL.map(_._2).toArray
            pending = pending ++ rows.iterator.map(outProj(_))
          }
          activeL.clear()
          activeR.clear()
        }

        private def step(): Unit = {
          val takeLeft =
            if (lRow == null) false
            else if (rRow == null) true
            else {
              val c = keyOrd.compare(lKey, rKey)
              if (c != 0) c < 0 else lPosS <= rPosS
            }
          if (takeLeft) {
            if (curKey == null || keyOrd.compare(lKey, curKey) != 0) {
              flushL(); curKey = lKey.copy()
            }
            evictR(lPosS)
            evictL(lPosS)
            val copied = lRow.copy()
            if (jt == Inner) {
              activeL += ((lPosE, copied))
              pending = pending ++ activeR.iterator.flatMap { case (_, r) =>
                joined(copied, r)
                if (pred.eval(joined)) Iterator.single[InternalRow](outProj(joined))
                else Iterator.empty
              }
            } else {
              var matched = false
              var i = 0
              while (!matched && i < activeR.length) {
                joined(copied, activeR(i)._2)
                matched = pred.eval(joined)
                i += 1
              }
              if (matched) {
                if (semi) pending =
                  pending ++ Iterator.single(copied).map(outProj(_))
                // anti: matched row is dropped for good
              } else {
                activeL += ((lPosE, copied)) // undecided: a later right may match
              }
            }
            advanceL()
          } else {
            if (curKey == null || keyOrd.compare(rKey, curKey) != 0) {
              flushL(); curKey = rKey.copy()
            }
            evictR(rPosS)
            evictL(rPosS)
            val copied = rRow.copy()
            activeR += ((rPosE, copied))
            if (jt == Inner) {
              pending = pending ++ activeL.iterator.flatMap { case (_, l) =>
                joined(l, copied)
                if (pred.eval(joined)) Iterator.single[InternalRow](outProj(joined))
                else Iterator.empty
              }
            } else {
              // resolve undecided left entries that this right row matches
              var i = 0
              while (i < activeL.length) {
                joined(activeL(i)._2, copied)
                if (pred.eval(joined)) {
                  val hit = activeL.remove(i)
                  if (semi) pending =
                    pending ++ Iterator.single(hit._2).map(outProj(_))
                } else i += 1
              }
            }
            advanceR()
          }
        }

        override def hasNext: Boolean = {
          while (!pending.hasNext && (lRow != null || rRow != null)) step()
          if (!pending.hasNext && !flushed) {
            flushed = true
            flushL()
          }
          pending.hasNext
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty sweep iterator")
          numOutputRows += 1
          pending.next()
        }
      }
    }
  }
}

object IntervalSweepJoinExec {
  /** Idempotently register [[IntervalSweepStrategy]] on `spark` so a
    * plan containing [[IntervalSweepJoinNode]] is plannable — covers
    * sessions that opted in via `experimental.extraOptimizations` only
    * (GraftExtensions-configured sessions get it injected properly). */
  def ensureStrategy(spark: SparkSession): Unit = {
    val ex = spark.experimental
    if (!ex.extraStrategies.contains(IntervalSweepStrategy)) {
      ex.extraStrategies = ex.extraStrategies :+ IntervalSweepStrategy
    }
  }
}
