package graft.plans

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.LongType

/** Per-row output mode of the sweep (with joinType Inner):
  *
  *  - [[SweepMode.Pairs]]   — every overlapping pair, exactly once.
  *  - [[SweepMode.First]]   — per left row, the single match with the
  *    smallest (rightStart, rightEnd); nothing for unmatched rows.
  *  - [[SweepMode.Last]]    — per left row, the LARGEST (rightStart,
  *    rightEnd) match (reference `multiple="last"` picks max start —
  *    core/pyranges_main.py:5406-5415).
  *  - [[SweepMode.Count]]   — per left row, (left columns, match count)
  *    — EVERY left row, including unmatched (0) and null-key /
  *    null-bound rows (0), so the caller needs no rejoin.
  *
  * First/Last/Count never materialize the pair set: the pick/count is
  * folded into the sweep's active buffers, so a row with 10^4 matches
  * costs 10^4 counter bumps, not 10^4 emitted rows — the reason q52's
  * pair-emission bound does not apply to these modes at scale.
  */
object SweepMode {
  val Pairs = "pairs"
  val First = "first"
  val Last = "last"
  val Count = "count"
  val all: Set[String] = Set(Pairs, First, Last, Count)
}

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
  * `joinType` Inner emits matches per `mode` ([[SweepMode]]); LeftSemi /
  * LeftAnti emit each left row at most once by row identity — matched
  * rows on first match (semi) or never-matched rows at eviction (anti) —
  * so the existence joins need NO row-id tagging, no re-join, and no
  * double evaluation of the probe side (a nondeterministic-rid rejoin
  * plan is wrong whenever the two evaluations can disagree).
  *
  * `countAttr` is the Count-mode output column, created by the caller so
  * the attribute id is stable across plan copies.
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
    joinType: JoinType = Inner,
    mode: String = SweepMode.Pairs,
    countAttr: Option[Attribute] = None,
    pickTies: Seq[Expression] = Nil) extends BinaryNode {
  require(Seq(Inner, LeftSemi, LeftAnti, LeftOuter, RightOuter, FullOuter)
      .contains(joinType),
    s"IntervalSweepJoinNode supports Inner/LeftSemi/LeftAnti/outer, got $joinType")
  require(SweepMode.all.contains(mode), s"unknown sweep mode $mode")
  require(mode == SweepMode.Pairs ||
      joinType == Inner,
    s"mode $mode requires Inner joinType")
  require((mode == SweepMode.Count) == countAttr.isDefined,
    "countAttr is required by (exactly) Count mode")
  override def output: Seq[Attribute] =
    IntervalSweepJoinExec.outputFor(mode, joinType, left.output, right.output, countAttr)
  // the count column is synthesized by this operator, not read from a child
  override def producedAttributes: AttributeSet = AttributeSet(countAttr.toSeq)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalSweepJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[IntervalSweepJoinNode]] as [[IntervalSweepJoinExec]]. */
object IntervalSweepStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalSweepJoinNode(l, r, lk, rk, ls, le, rs, re, slack, cond, jt, mode, cnt, ties) =>
      IntervalSweepJoinExec(lk, rk, ls, le, rs, re, slack, cond, jt, mode, cnt, ties,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** One buffered interval: heap-ordered by `endPos`. Carries the
  * per-left-row fold state for the First/Last/Count modes and the
  * lazy-deletion flag for semi/anti resolution. */
private[plans] final class SweepEntry(
    val startPos: Long, val endPos: Long, val row: InternalRow) {
  var dead = false             // semi/anti: resolved before eviction
  var matched = false          // outer modes: >= 1 pair emitted for this row
  var count = 0L               // Count mode
  var best: InternalRow = _    // First/Last mode: winning right row (copy)
  var bestS = 0L               // winner's (start, end) for the compare
  var bestE = 0L
  var bestTie: UnsafeRow = _   // winner's tie-break key (copy), lazy
}

/** Array-backed binary min-heap on `endPos` with live iteration and
  * lazy deletion — eviction pops are O(log depth) (the round-5 version
  * scanned and `ArrayBuffer.remove`d: O(depth) per advance, O(depth²)
  * per key worst case, which capped `sweepMaxDepth`). Semi/anti resolve
  * entries mid-heap by tombstoning; when tombstones pass half the heap
  * it compacts in O(depth) — amortized O(log) per resolution. */
private[plans] final class SweepHeap {
  private var arr = new Array[SweepEntry](16)
  private var n = 0
  private var deadCount = 0

  def size: Int = n
  def live: Int = n - deadCount
  def isEmpty: Boolean = live == 0

  def add(e: SweepEntry): Unit = {
    if (n == arr.length) arr = java.util.Arrays.copyOf(arr, n * 2)
    arr(n) = e
    var i = n
    n += 1
    while (i > 0 && arr((i - 1) / 2).endPos > arr(i).endPos) {
      val p = (i - 1) / 2
      val t = arr(p); arr(p) = arr(i); arr(i) = t
      i = p
    }
  }

  /** Mark resolved (semi/anti) — physically removed on pop/compact. */
  def kill(e: SweepEntry): Unit = {
    e.dead = true
    deadCount += 1
    if (deadCount > 1 && deadCount * 2 > n) compact()
  }

  private def compact(): Unit = {
    var w = 0
    var i = 0
    while (i < n) {
      if (!arr(i).dead) { arr(w) = arr(i); w += 1 }
      i += 1
    }
    java.util.Arrays.fill(arr.asInstanceOf[Array[AnyRef]], w, n, null)
    n = w
    deadCount = 0
    // heapify bottom-up: O(n)
    i = n / 2 - 1
    while (i >= 0) { siftDown(i); i -= 1 }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < n && arr(l).endPos < arr(m).endPos) m = l
      if (r < n && arr(r).endPos < arr(m).endPos) m = r
      if (m == i) return
      val t = arr(m); arr(m) = arr(i); arr(i) = t
      i = m
    }
  }

  /** Pop every entry with endPos <= pos; live ones go to `onEvict`. */
  def evictUpTo(pos: Long)(onEvict: SweepEntry => Unit): Unit = {
    while (n > 0 && arr(0).endPos <= pos) {
      val top = arr(0)
      n -= 1
      arr(0) = arr(n)
      arr(n) = null
      if (n > 0) siftDown(0)
      if (top.dead) deadCount -= 1 else onEvict(top)
    }
  }

  /** Visit live entries in heap (arbitrary) order. Callers must not
    * mutate the heap during the visit (kill() is allowed only via the
    * returned-entry list pattern used in step()). */
  def foreachLive(f: SweepEntry => Unit): Unit = {
    var i = 0
    while (i < n) {
      if (!arr(i).dead) f(arr(i))
      i += 1
    }
  }

  /** Snapshot of live entries (used for lazy pair-emission iterators,
    * which are consumed before the next heap mutation). */
  def liveIterator: Iterator[SweepEntry] =
    arr.iterator.take(n).filterNot(_.dead)

  def drainLive(): Array[SweepEntry] = {
    val out = new Array[SweepEntry](live)
    var i = 0
    var w = 0
    while (i < n) {
      if (!arr(i).dead) { out(w) = arr(i); w += 1 }
      arr(i) = null
      i += 1
    }
    n = 0
    deadCount = 0
    out
  }

  def clear(): Unit = {
    java.util.Arrays.fill(arr.asInstanceOf[Array[AnyRef]], 0, n, null)
    n = 0
    deadCount = 0
  }
}

/** Disk-backed overflow for an active set past the in-heap depth cap:
  * generations of spillable row buffers ([[org.apache.spark.sql.GraftSpillableRowBuffer]]),
  * each sealed at `genRows` rows with its max end position recorded. A
  * generation is dropped wholesale once the sweep passes its max end;
  * until then its rows are re-iterated per arrival with a per-row
  * liveness check (the caller recomputes positions from the row). This
  * trades CPU/IO (re-reads of partially-expired generations) for
  * BOUNDED memory: a mis-sampled all-overlapping key degrades to
  * streaming disk reads instead of OOMing the task. */
private[plans] final class SweepOverflow(genRows: Int) {
  private final class Gen {
    val buf = new org.apache.spark.sql.GraftSpillableRowBuffer(4096)
    var maxEnd = Long.MinValue
  }
  private val gens = new scala.collection.mutable.ArrayBuffer[Gen]
  private var open: Gen = _
  private var n = 0L

  def isEmpty: Boolean = n == 0L
  def size: Long = n

  def add(row: UnsafeRow, endPos: Long): Unit = {
    if (open == null || open.buf.length >= genRows) {
      open = new Gen
      gens += open
    }
    open.buf.add(row)
    if (endPos > open.maxEnd) open.maxEnd = endPos
    n += 1
  }

  /** Drop generations whose every entry the sweep has passed. */
  def dropExpired(pos: Long): Unit = {
    var i = 0
    while (i < gens.length) {
      if (gens(i).maxEnd <= pos) {
        n -= gens(i).buf.length
        gens(i).buf.clear()
        if (gens(i) eq open) open = null
        gens.remove(i)
      } else i += 1
    }
  }

  /** All stored rows (including individually-expired ones — the caller
    * filters by recomputed position). Spilled rows are reused buffers:
    * copy before retaining. */
  def iterator: Iterator[UnsafeRow] =
    gens.toSeq.iterator.flatMap(_.buf.iterator)

  def clear(): Unit = {
    gens.foreach(_.buf.clear())
    gens.clear()
    open = null
    n = 0L
  }
}

/** Disk-backed overflow for STATEFUL entries — count fold state,
  * semi/anti resolution, and the outer modes' matched flags. The row
  * payload spills to [[org.apache.spark.sql.GraftSpillableRowBuffer]]
  * generations exactly like [[SweepOverflow]], but each row keeps ONE
  * resident Long of fold state addressed by (generation, ordinal) — 8
  * bytes in heap per spilled row instead of the whole row, so these
  * modes degrade to bounded memory at any concurrent depth. Pick's fold
  * state (a candidate right ROW) is too big for a slot — it demotes to
  * [[PickSweepOverflow]]'s winner-identity compression instead. State
  * arrays are
  * allocated at full generation size up front so the (array, ordinal)
  * handle returned by [[add]] stays valid for the row's lifetime (lazy
  * emission closures write through it). A generation is drained
  * (row + final state) and dropped once the sweep passes its max end —
  * by then no later right row can match anything in it, the same
  * finality argument as heap eviction. */
private[plans] final class StatefulSweepOverflow(genRows: Int) {
  private final class Gen {
    val buf = new org.apache.spark.sql.GraftSpillableRowBuffer(4096)
    val state = new Array[Long](genRows)
    var maxEnd = Long.MinValue
  }
  private val gens = new scala.collection.mutable.ArrayBuffer[Gen]
  private var open: Gen = _
  private var n = 0L

  def isEmpty: Boolean = n == 0L
  def size: Long = n

  /** Store a row with initial fold state; returns the resident state
    * slot as (array, index) — valid until the row's generation drops. */
  def add(row: UnsafeRow, endPos: Long, state0: Long): (Array[Long], Int) = {
    if (open == null || open.buf.length >= genRows) {
      open = new Gen
      gens += open
    }
    val i = open.buf.length
    open.buf.add(row)
    open.state(i) = state0
    if (endPos > open.maxEnd) open.maxEnd = endPos
    n += 1
    (open.state, i)
  }

  /** Visit every stored row with write access to its state slot.
    * Spilled rows are reused buffers: copy before retaining. The caller
    * re-checks per-row liveness from the row's own positions. */
  def foreachSlot(f: (UnsafeRow, Array[Long], Int) => Unit): Unit =
    gens.foreach { g =>
      var i = 0
      val it = g.buf.iterator
      while (it.hasNext) { f(it.next(), g.state, i); i += 1 }
    }

  /** Drain-and-drop generations whose every row the sweep has passed,
    * handing (reused row buffer, final state) to `emit`. */
  def dropExpired(pos: Long)(emit: (UnsafeRow, Long) => Unit): Unit = {
    var i = 0
    while (i < gens.length) {
      val g = gens(i)
      if (g.maxEnd <= pos) {
        var j = 0
        val it = g.buf.iterator
        while (it.hasNext) { emit(it.next(), g.state(j)); j += 1 }
        n -= g.buf.length
        g.buf.clear()
        if (g eq open) open = null
        gens.remove(i)
      } else i += 1
    }
  }

  /** Drain everything (group flush / stream end). */
  def drainAll(emit: (UnsafeRow, Long) => Unit): Unit = {
    gens.foreach { g =>
      var j = 0
      val it = g.buf.iterator
      while (it.hasNext) { emit(it.next(), g.state(j)); j += 1 }
      g.buf.clear()
    }
    gens.clear()
    open = null
    n = 0L
  }
}

/** Disk-backed overflow for PICK entries (First/Last modes) — the one
  * fold state too big for a [[StatefulSweepOverflow]] slot: a candidate
  * right ROW. Compression: the resident state per spilled left row is
  * the winner's IDENTITY — (bestStart, bestEnd, index into an
  * append-only candidate log[, tie key]) — while the winning right rows
  * themselves live in a per-generation disk-backed log. Every
  * fold-better event appends the new winner to the log and repoints the
  * resident index; superseded appends become garbage that the single
  * drain scan skips. At generation drop/drain (sweep passed its max
  * end — fold state final, same argument as heap eviction), winner
  * indices are inverted into a (log position -> left row copy) map of
  * at most `genRows` entries and ONE sequential scan of the log emits
  * the (left, winner) pairs, so drain memory is O(genRows) rows — the
  * same order as a heap flush — never O(candidates). Tie keys (a few
  * projected right columns) stay resident: O(tie bytes) per entry, not
  * O(row). */
private[plans] final class PickSweepOverflow(
    genRows: Int, last: Boolean,
    tieProj: UnsafeProjection, tieOrd: Ordering[InternalRow]) {
  private final class Gen {
    val buf = new org.apache.spark.sql.GraftSpillableRowBuffer(4096)
    val cand = new org.apache.spark.sql.GraftSpillableRowBuffer(4096)
    var candLen = 0L
    val bestS = new Array[Long](genRows)
    val bestE = new Array[Long](genRows)
    val winner = new Array[Long](genRows) // index into cand; -1 = unmatched
    val tie: Array[UnsafeRow] =
      if (tieProj != null) new Array[UnsafeRow](genRows) else null
    // per-arrival append dedup: one right row improving MANY slots in
    // this generation is logged once, all improved slots point at it
    var lastArr = -1L
    var lastArrPos = -1L
    var lastArrTie: UnsafeRow = _
    var maxEnd = Long.MinValue
  }
  private val gens = new scala.collection.mutable.ArrayBuffer[Gen]
  private var open: Gen = _
  private var n = 0L

  def isEmpty: Boolean = n == 0L
  def size: Long = n

  /** Spill a left row with no winner yet; returns an opaque slot handle
    * (generation, ordinal) valid until the generation drains. */
  def add(row: UnsafeRow, endPos: Long): (AnyRef, Int) = {
    if (open == null || open.buf.length >= genRows) {
      open = new Gen
      gens += open
    }
    val i = open.buf.length
    open.buf.add(row)
    open.winner(i) = -1L
    if (endPos > open.maxEnd) open.maxEnd = endPos
    n += 1
    (open, i)
  }

  /** Fold a matched right row into the slot: if (rs, re[, tie]) beats
    * the incumbent winner identity under the First/Last ordering, log
    * the row in the generation's candidate log (the log copies — the
    * caller may pass a reused buffer) and repoint the resident index.
    * `arrivalId` is a monotone per-right-arrival counter: one arrival
    * improving many slots of a generation (the Last-mode common case —
    * ascending starts make every new right row beat every incumbent)
    * appends ONCE, and the improved slots share the log position. */
  def offer(h: AnyRef, i: Int, rightRow: UnsafeRow, rs: Long, re: Long,
            arrivalId: Long): Unit = {
    val g = h.asInstanceOf[Gen]
    val better =
      if (g.winner(i) < 0L) true
      else if (rs == g.bestS(i) && re == g.bestE(i)) {
        if (tieProj == null) false
        else tieOrd.compare(tieProj(rightRow), g.tie(i)) < 0
      }
      else if (last) rs > g.bestS(i) || (rs == g.bestS(i) && re > g.bestE(i))
      else rs < g.bestS(i) || (rs == g.bestS(i) && re < g.bestE(i))
    if (better) {
      if (g.lastArr != arrivalId) {
        g.cand.add(rightRow)
        g.lastArr = arrivalId
        g.lastArrPos = g.candLen
        g.candLen += 1L
        g.lastArrTie = if (tieProj != null) tieProj(rightRow).copy() else null
      }
      g.winner(i) = g.lastArrPos
      g.bestS(i) = rs
      g.bestE(i) = re
      if (tieProj != null) g.tie(i) = g.lastArrTie
    }
  }

  /** Visit every stored left row with its slot handle for fold probes.
    * Rows are reused buffers; the caller re-checks liveness from the
    * row's own positions. */
  def foreachSlot(f: (UnsafeRow, AnyRef, Int) => Unit): Unit =
    gens.foreach { g =>
      var i = 0
      val it = g.buf.iterator
      while (it.hasNext) { f(it.next(), g, i); i += 1 }
    }

  /** Drain-and-drop generations whose every row the sweep has passed.
    * `emit` receives (left row COPY, winner row reused buffer) — copy
    * the right side before retaining. Unmatched rows emit nothing
    * (inner pick semantics). */
  def dropExpired(pos: Long)(emit: (UnsafeRow, UnsafeRow) => Unit): Unit = {
    var i = 0
    while (i < gens.length) {
      val g = gens(i)
      if (g.maxEnd <= pos) {
        drainGen(g, emit)
        n -= g.buf.length
        g.buf.clear()
        g.cand.clear()
        if (g eq open) open = null
        gens.remove(i)
      } else i += 1
    }
  }

  /** Drain everything (group flush / stream end). */
  def drainAll(emit: (UnsafeRow, UnsafeRow) => Unit): Unit = {
    gens.foreach { g =>
      drainGen(g, emit)
      g.buf.clear()
      g.cand.clear()
    }
    gens.clear()
    open = null
    n = 0L
  }

  private def drainGen(g: Gen, emit: (UnsafeRow, UnsafeRow) => Unit): Unit = {
    // a log position may be shared by many slots (per-arrival dedup),
    // so the inversion maps position -> every owning left row copy
    val want =
      new scala.collection.mutable.LongMap[scala.collection.mutable.ArrayBuffer[UnsafeRow]]
    var j = 0
    val it = g.buf.iterator
    while (it.hasNext) {
      val lr = it.next()
      if (g.winner(j) >= 0L)
        want.getOrElseUpdate(g.winner(j),
          new scala.collection.mutable.ArrayBuffer[UnsafeRow](1)) += lr.copy()
      j += 1
    }
    if (want.nonEmpty) {
      var p = 0L
      val cit = g.cand.iterator
      while (cit.hasNext) {
        val cr = cit.next()
        val ls = want.getOrNull(p)
        if (ls != null) ls.foreach(lr => emit(lr, cr))
        p += 1L
      }
    }
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
  * null-key LEFT rows immediately (they can never match) and Count
  * emits them with count 0. Rows with a NULL start or end are routed
  * the same way — they can never satisfy the range conjuncts, and
  * feeding them through the position projection would read the null
  * slot as 0 and break sweep monotonicity under negative coordinates.
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
    mode: String,
    countAttr: Option[Attribute],
    pickTies: Seq[Expression],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    IntervalSweepJoinExec.outputFor(mode, joinType, left.output, right.output, countAttr)

  override def producedAttributes: AttributeSet = AttributeSet(countAttr.toSeq)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // slack shifts left positions by a constant, so ordering by the raw
  // start column is the sweep order on both sides
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(lStart, Ascending),
      rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rStart, Ascending))

  // Which child's partitioning guarantee survives: every output row
  // preserves that side's attribute values. Under RightOuter the
  // null-padded-LEFT rows live in partitions chosen by the RIGHT key
  // hash (left attrs are null), so claiming Hash(leftKeys) would let a
  // downstream operator clustered on left attrs elide a required
  // exchange and go wrong; FullOuter pads both sides, so neither claim
  // holds (same shape as Spark's ShuffledJoin.outputPartitioning).
  override def outputPartitioning: Partitioning = joinType match {
    case RightOuter => right.outputPartitioning
    case FullOuter =>
      UnknownPartitioning(left.outputPartitioning.numPartitions)
    case _ => left.outputPartitioning
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    // depth governance: up to `spillDepth` entries per side live in the
    // in-heap active set; beyond that, STATELESS entries (both sides of
    // a pairs sweep, the right side of count/pick) overflow to
    // disk-spillable generations and the sweep degrades to bounded-
    // memory re-scans. STATEFUL entries whose fold state fits one long
    // — count tallies, semi/anti resolution bits, the outer modes'
    // matched flags — demote to StatefulSweepOverflow: the row spills,
    // 8 bytes stay resident. PICK entries (fold state = a candidate
    // right ROW) demote to PickSweepOverflow: the row spills, the
    // winner IDENTITY (2 longs + log index + tie key) stays resident
    // and winner rows live in a disk-backed candidate log — so EVERY
    // mode is bounded-memory at any concurrent depth; a mis-sampled
    // all-overlapping key degrades to disk instead of erroring.
    val spillDepth = conf.getConfString(
      "spark.graft.join.sweepSpillDepth", "262144").toInt
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val (lsE, leE, rsE, reE) = (lStart, lEnd, rStart, rEnd)
    val cond = condition
    val slk = slack
    val jt = joinType
    val md = mode
    val cntAttr = countAttr
    val ties = pickTies
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
      val semi = jt == LeftSemi
      val anti = jt == LeftAnti
      // outer flags: loJ = emit unmatched LEFT rows with a null right,
      // roJ = emit unmatched RIGHT rows with a null left
      val loJ = jt == LeftOuter || jt == FullOuter
      val roJ = jt == RightOuter || jt == FullOuter
      // outer modes ride the pair-emission machinery plus matched flags
      val pairs = md == SweepMode.Pairs && (jt == Inner || loJ || roJ)
      val pick = md == SweepMode.First || md == SweepMode.Last
      val pickLast = md == SweepMode.Last
      val counting = md == SweepMode.Count
      val countRow = new GenericInternalRow(1)
      // all-null pad rows for the outer emissions (GenericInternalRow
      // defaults every slot to null)
      val nullR = new GenericInternalRow(rOut.length)
      val nullL = new GenericInternalRow(lOut.length)
      val outProj = UnsafeProjection.create(outAttrs, md match {
        case SweepMode.Count => lOut :+ cntAttr.get
        case _ if jt == Inner || loJ || roJ =>
          // bind against nullability-adjusted inputs so the generated
          // projection null-checks the padded side
          (if (roJ) lOut.map(_.withNullability(true)) else lOut) ++
            (if (loJ) rOut.map(_.withNullability(true)) else rOut)
        case _ => lOut
      })
      // tie-break for exact (rStart, rEnd) pick ties: ascending over the
      // caller-supplied right-side expressions (matches the aggregation
      // path's min_by ordering struct, where non-coordinate columns stay
      // ascending for first AND last)
      val tieProj =
        if (pick && ties.nonEmpty) UnsafeProjection.create(ties, rOut)
        else null
      val tieOrd: Ordering[InternalRow] =
        if (tieProj != null)
          RowOrdering.createNaturalAscendingOrdering(ties.map(_.dataType))
        else null

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
        private val activeL = new SweepHeap
        private val activeR = new SweepHeap
        // stateless overflow (left only participates in pairs mode)
        // generation size rides spillDepth: a generation only retires
        // once the sweep passes its max end, so until then every
        // arrival re-scans the whole generation (expired rows included,
        // liveness re-checked per row). Generations much larger than
        // the live depth make that re-scan mostly dead work — measured
        // 8x on a forced spillDepth=64 / depth~1000 count (BASELINE.md
        // "sweep demotion cost") with the old fixed 65536.
        private val genRows =
          math.max(1024, math.min(65536, spillDepth))
        private val overL = new SweepOverflow(genRows)
        private val overR = new SweepOverflow(genRows)
        // stateful overflow: spilled row + one resident long of fold
        // state (count / semi-anti resolution / outer matched flag) —
        // these modes degrade to bounded memory past spillDepth instead
        // of pinning rows in-heap; pick (O(row) fold state) excluded
        private val statefulOverL = new StatefulSweepOverflow(genRows)
        private val statefulOverR = new StatefulSweepOverflow(genRows)
        private var pending: Iterator[InternalRow] = Iterator.empty
        private var flushed = false

        private val lUnsafe = UnsafeProjection.create(lOut.map(_.dataType).toArray)
        private val rUnsafe = UnsafeProjection.create(rOut.map(_.dataType).toArray)
        private def unsafeCopy(r: InternalRow, p: UnsafeProjection): UnsafeRow =
          r match { case u: UnsafeRow => u; case o => p(o).copy() }
        // pick overflow: left rows past spillDepth spill with resident
        // winner-identity state; winner rows ride a per-generation
        // disk-backed candidate log. arrivalSeq identifies each distinct
        // right row offered so one arrival logs at most once per gen.
        private val pickOverL =
          new PickSweepOverflow(genRows, pickLast, tieProj, tieOrd)
        private var arrivalSeq = 0L

        advanceL()
        advanceR()

        /** Emit a demoted pick pair at generation drop/drain — the
          * winner is final there. `l` is an owned copy, `r` a reused
          * log buffer: copy before deferring projection. */
        private def emitPickL(l: UnsafeRow, r: UnsafeRow): Unit = {
          val rc = r.copy()
          pending = pending ++
            Iterator.single(l).map(lr => outProj(joined(lr, rc)))
        }

        /** Emit a left row that matched nothing and never will (anti:
          * always; count: with count 0; left/full outer: null-padded
          * right). Projection deferred to consumption — outProj's buffer
          * is shared, an eager call here would alias queued emissions. */
        private def emitUnmatched(row: InternalRow): Unit = {
          val c = row.copy()
          if (anti) pending = pending ++ Iterator.single(c).map(outProj(_))
          else if (counting) pending = pending ++ Iterator.single(c).map { r =>
            countRow.setLong(0, 0L)
            outProj(joined(r, countRow))
          }
          else if (loJ) pending =
            pending ++ Iterator.single(c).map(r => outProj(joined(r, nullR)))
        }

        /** Right/full outer: emit a right row that matched nothing with a
          * null-padded left. */
        private def emitUnmatchedR(row: InternalRow): Unit = {
          val c = row.copy()
          pending = pending ++ Iterator.single(c).map(r => outProj(joined(nullL, r)))
        }

        /** Emit a stateful-overflow LEFT row at generation drop/drain —
          * its fold state is final there. Semi already emitted at match
          * time (the state bit enforces exactly-once), so nothing here.
          * `row` is a reused buffer: copy before deferring projection. */
        private def emitStatefulL(row: UnsafeRow, st: Long): Unit = {
          if (counting) {
            val c = row.copy()
            pending = pending ++ Iterator.single(c).map { r =>
              countRow.setLong(0, st)
              outProj(joined(r, countRow))
            }
          } else if (anti) {
            if (st == 0L)
              pending = pending ++ Iterator.single(row.copy()).map(outProj(_))
          } else if (loJ && st == 0L) {
            val c = row.copy()
            pending = pending ++ Iterator.single(c).map(r => outProj(joined(r, nullR)))
          }
        }

        /** Right/full outer counterpart: never-matched spilled right rows
          * surface null-padded at drop/drain. */
        private def emitStatefulR(row: UnsafeRow, st: Long): Unit =
          if (st == 0L) {
            val c = row.copy()
            pending = pending ++ Iterator.single(c).map(r => outProj(joined(nullL, r)))
          }

        private def advanceL(): Unit = {
          lRow = null
          while (lRow == null && lIt.hasNext) {
            val row = lIt.next()
            val k = lKeyProj(row)
            if (k.anyNull) {
              // a null-key left row matches nothing, ever
              emitUnmatched(row)
            } else {
              val p = lPosProj(row)
              if (p.isNullAt(0) || p.isNullAt(1)) {
                // null start/end: range conjuncts are unknowable; the
                // cast would read the null slot as 0 and de-monotonize
                // the sweep position under negative coordinates
                emitUnmatched(row)
              } else {
                lRow = row
                lKey = k
                lPosS = p.getLong(0)
                lPosE = p.getLong(1)
              }
            }
          }
        }

        private def advanceR(): Unit = {
          rRow = null
          while (rRow == null && rIt.hasNext) {
            val row = rIt.next()
            val k = rKeyProj(row)
            if (k.anyNull) {
              // a null-key right row matches nothing, ever; right/full
              // outer must still surface it
              if (roJ) emitUnmatchedR(row)
            } else {
              val p = rPosProj(row)
              if (p.isNullAt(0) || p.isNullAt(1)) {
                if (roJ) emitUnmatchedR(row)
              } else {
                rRow = row
                rKey = k
                rPosS = p.getLong(0)
                rPosE = p.getLong(1)
              }
            }
          }
        }

        /** Fold a matched right row into a left entry's pick/count
          * state. First = smallest (rStart, rEnd); Last = largest.
          * Exact (rStart, rEnd) ties break ascending on `pickTies`
          * (without ties configured, the incumbent wins). */
        private def fold(e: SweepEntry, rightRow: InternalRow,
                         rs: Long, re: Long): Unit = {
          if (counting) { e.count += 1L; return }
          val better =
            if (e.best == null) true
            else if (rs == e.bestS && re == e.bestE) {
              if (tieProj == null) false
              else {
                if (e.bestTie == null) e.bestTie = tieProj(e.best).copy()
                tieOrd.compare(tieProj(rightRow), e.bestTie) < 0
              }
            }
            else if (pickLast) rs > e.bestS || (rs == e.bestS && re > e.bestE)
            else rs < e.bestS || (rs == e.bestS && re < e.bestE)
          if (better) {
            e.best = rightRow // caller passes an owned copy
            e.bestS = rs
            e.bestE = re
            e.bestTie = null
          }
        }

        /** Emit a decided left entry (eviction / flush) in pick/count
          * modes. */
        private def emitDecided(e: SweepEntry): Unit = {
          if (counting) {
            pending = pending ++ Iterator.single(e).map { en =>
              countRow.setLong(0, en.count)
              outProj(joined(en.row, countRow))
            }
          } else if (e.best != null) {
            pending = pending ++ Iterator.single(e).map { en =>
              outProj(joined(en.row, en.best))
            }
          }
        }

        /** Drop entries the sweep has passed. Anti emits evicted LEFT
          * entries (eviction proves no future right row can match);
          * pick/count emit their decided fold state; left/full outer
          * emits never-matched entries null-padded. */
        private def evictL(pos: Long): Unit = {
          activeL.evictUpTo(pos) { e =>
            if (anti) pending = pending ++ Iterator.single(e.row).map(outProj(_))
            else if (pick || counting) emitDecided(e)
            else if (loJ && !e.matched) pending =
              pending ++ Iterator.single(e).map(en => outProj(joined(en.row, nullR)))
          }
          overL.dropExpired(pos)
          statefulOverL.dropExpired(pos)(emitStatefulL)
          pickOverL.dropExpired(pos)(emitPickL)
        }

        private def evictR(pos: Long): Unit = {
          activeR.evictUpTo(pos) { e =>
            if (roJ && !e.matched) pending =
              pending ++ Iterator.single(e).map(en => outProj(joined(nullL, en.row)))
          }
          overR.dropExpired(pos)
          statefulOverR.dropExpired(pos)(emitStatefulR)
        }

        /** Flush still-active entries (group change / stream end): anti
          * emits left entries as unmatched, pick/count as decided, the
          * outer modes emit their never-matched side(s) null-padded. */
        private def flushL(): Unit = {
          if (anti && !activeL.isEmpty) {
            val rows = activeL.drainLive()
            pending = pending ++ rows.iterator.map(e => outProj(e.row))
          } else if ((pick || counting) && !activeL.isEmpty) {
            activeL.drainLive().foreach(emitDecided)
          } else if (loJ && !activeL.isEmpty) {
            val rows = activeL.drainLive()
            pending = pending ++ rows.iterator.filterNot(_.matched)
              .map(e => outProj(joined(e.row, nullR)))
          }
          if (roJ && !activeR.isEmpty) {
            val rows = activeR.drainLive()
            pending = pending ++ rows.iterator.filterNot(_.matched)
              .map(e => outProj(joined(nullL, e.row)))
          }
          statefulOverL.drainAll(emitStatefulL)
          statefulOverR.drainAll(emitStatefulR)
          pickOverL.drainAll(emitPickL)
          activeL.clear()
          activeR.clear()
          overL.clear()
          overR.clear()
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
            val arrivalPos = lPosS
            if (pairs) {
              // left entries are stateless for inner/right-outer pairs
              // (may overflow to disk); left/full outer entries past
              // spillDepth demote to the stateful overflow — row on
              // disk, matched flag resident through the returned slot
              var lEntry: SweepEntry = null
              var lSlot: Array[Long] = null
              var lSlotIdx = 0
              if (activeL.size < spillDepth) {
                lEntry = new SweepEntry(lPosS, lPosE, copied)
                activeL.add(lEntry)
              } else if (loJ) {
                val s = statefulOverL.add(unsafeCopy(copied, lUnsafe), lPosE, 0L)
                lSlot = s._1; lSlotIdx = s._2
              } else {
                overL.add(unsafeCopy(copied, lUnsafe), lPosE)
              }
              val le = lEntry
              val ls = lSlot
              val lsi = lSlotIdx
              def markL(): Unit =
                if (le != null) le.matched = true
                else if (ls != null) ls(lsi) = 1L
              // right/full outer with a deep right side: probe the
              // spilled stateful right rows EAGERLY (slot writes), the
              // matched pair copies emit through pending
              if (!statefulOverR.isEmpty) {
                var ms: List[UnsafeRow] = Nil
                statefulOverR.foreachSlot { (rRowOv, arr, j) =>
                  if (rPosProj(rRowOv).getLong(1) > arrivalPos) {
                    joined(copied, rRowOv)
                    if (pred.eval(joined)) {
                      arr(j) = 1L
                      markL()
                      ms = rRowOv.copy() :: ms
                    }
                  }
                }
                if (ms.nonEmpty) pending = pending ++
                  ms.reverseIterator.map(r => outProj(joined(copied, r)))
              }
              // matched flags are set inside the lazy emission closures;
              // safe because `pending` is fully drained before the next
              // step() (hasNext's loop invariant), i.e. before any
              // eviction could read the flags
              pending = pending ++ activeR.liveIterator.flatMap { e =>
                joined(copied, e.row)
                if (pred.eval(joined)) {
                  markL()
                  e.matched = true
                  Iterator.single[InternalRow](outProj(joined))
                } else Iterator.empty
              } ++ overR.iterator.flatMap { rRowOv =>
                // overflow rows carry no eviction state: re-check liveness
                val p = rPosProj(rRowOv)
                if (p.getLong(1) > arrivalPos) {
                  joined(copied, rRowOv)
                  if (pred.eval(joined)) {
                    markL()
                    Iterator.single[InternalRow](outProj(joined))
                  } else Iterator.empty
                } else Iterator.empty
              }
            } else if (counting && activeL.size >= spillDepth) {
              // demoted count: the tally stays resident as ONE long, the
              // row spills — probe the current right sets for the
              // arrival-time partial, later rights increment the slot
              var c = 0L
              activeR.foreachLive { re =>
                joined(copied, re.row)
                if (pred.eval(joined)) c += 1L
              }
              overR.iterator.foreach { rRowOv =>
                if (rPosProj(rRowOv).getLong(1) > arrivalPos) {
                  joined(copied, rRowOv)
                  if (pred.eval(joined)) c += 1L
                }
              }
              statefulOverL.add(unsafeCopy(copied, lUnsafe), lPosE, c)
            } else if (pick && activeL.size >= spillDepth) {
              // demoted pick: the row spills, the winner identity stays
              // resident — probe the current right sets for the
              // arrival-time fold, later rights offer through the slot
              val h = pickOverL.add(unsafeCopy(copied, lUnsafe), lPosE)
              activeR.foreachLive { re =>
                joined(copied, re.row)
                if (pred.eval(joined)) {
                  arrivalSeq += 1
                  pickOverL.offer(h._1, h._2, unsafeCopy(re.row, rUnsafe),
                    re.startPos, re.endPos, arrivalSeq)
                }
              }
              overR.iterator.foreach { rRowOv =>
                val p = rPosProj(rRowOv)
                val (rs, rEndP) = (p.getLong(0), p.getLong(1))
                if (rEndP > arrivalPos) {
                  joined(copied, rRowOv)
                  if (pred.eval(joined)) {
                    arrivalSeq += 1
                    pickOverL.offer(h._1, h._2, rRowOv, rs, rEndP, arrivalSeq)
                  }
                }
              }
            } else if (pick || counting) {
              val entry = new SweepEntry(lPosS, lPosE, copied)
              activeL.add(entry)
              activeR.foreachLive { re =>
                joined(copied, re.row)
                if (pred.eval(joined)) fold(entry, re.row, re.startPos, re.endPos)
              }
              overR.iterator.foreach { rRowOv =>
                val p = rPosProj(rRowOv)
                val (rs, re) = (p.getLong(0), p.getLong(1))
                if (re > arrivalPos) {
                  joined(copied, rRowOv)
                  // overflow iterator rows are reused buffers: fold copies
                  if (pred.eval(joined)) fold(entry, rRowOv.copy(), rs, re)
                }
              }
            } else { // semi / anti
              var matched = false
              activeR.foreachLive { re =>
                if (!matched) {
                  joined(copied, re.row)
                  matched = pred.eval(joined)
                }
              }
              if (!matched && !overR.isEmpty) {
                val it = overR.iterator
                while (!matched && it.hasNext) {
                  val rRowOv = it.next()
                  if (rPosProj(rRowOv).getLong(1) > arrivalPos) {
                    joined(copied, rRowOv)
                    matched = pred.eval(joined)
                  }
                }
              }
              if (matched) {
                if (semi) pending =
                  pending ++ Iterator.single(copied).map(outProj(_))
                // anti: matched row is dropped for good
              } else if (activeL.size >= spillDepth) {
                // undecided, demoted: resolution bit resident, row spills
                statefulOverL.add(unsafeCopy(copied, lUnsafe), lPosE, 0L)
              } else {
                // undecided: a later right may match
                activeL.add(new SweepEntry(lPosS, lPosE, copied))
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
            val arrivalPos = rPosS
            // right entries are stateless except under right/full outer,
            // where entries past spillDepth demote to the stateful
            // overflow (row on disk, matched flag resident)
            var rEntry: SweepEntry = null
            var rSlot: Array[Long] = null
            var rSlotIdx = 0
            if (activeR.size < spillDepth) {
              rEntry = new SweepEntry(rPosS, rPosE, copied)
              activeR.add(rEntry)
            } else if (roJ) {
              val s = statefulOverR.add(unsafeCopy(copied, rUnsafe), rPosE, 0L)
              rSlot = s._1; rSlotIdx = s._2
            } else {
              overR.add(unsafeCopy(copied, rUnsafe), rPosE)
            }
            if (pairs) {
              val re0 = rEntry
              val rs0 = rSlot
              val rsi = rSlotIdx
              def markR(): Unit =
                if (re0 != null) re0.matched = true
                else if (rs0 != null) rs0(rsi) = 1L
              // left/full outer with a deep left side: probe the spilled
              // stateful left rows eagerly (slot writes), pairs via pending
              if (!statefulOverL.isEmpty) {
                var ms: List[UnsafeRow] = Nil
                statefulOverL.foreachSlot { (lRowOv, arr, j) =>
                  if (lPosProj(lRowOv).getLong(1) > arrivalPos) {
                    joined(lRowOv, copied)
                    if (pred.eval(joined)) {
                      arr(j) = 1L
                      markR()
                      ms = lRowOv.copy() :: ms
                    }
                  }
                }
                if (ms.nonEmpty) pending = pending ++
                  ms.reverseIterator.map(l => outProj(joined(l, copied)))
              }
              pending = pending ++ activeL.liveIterator.flatMap { e =>
                joined(e.row, copied)
                if (pred.eval(joined)) {
                  e.matched = true
                  markR()
                  Iterator.single[InternalRow](outProj(joined))
                } else Iterator.empty
              } ++ overL.iterator.flatMap { lRowOv =>
                val p = lPosProj(lRowOv)
                if (p.getLong(1) > arrivalPos) {
                  joined(lRowOv, copied)
                  if (pred.eval(joined)) {
                    markR()
                    Iterator.single[InternalRow](outProj(joined))
                  } else Iterator.empty
                } else Iterator.empty
              }
            } else if (pick || counting) {
              activeL.foreachLive { e =>
                joined(e.row, copied)
                if (pred.eval(joined)) fold(e, copied, rPosS, rPosE)
              }
              // demoted count rows: increment through the resident slots
              if (counting && !statefulOverL.isEmpty)
                statefulOverL.foreachSlot { (lRowOv, arr, j) =>
                  if (lPosProj(lRowOv).getLong(1) > arrivalPos) {
                    joined(lRowOv, copied)
                    if (pred.eval(joined)) arr(j) += 1L
                  }
                }
              // demoted pick rows: offer through the winner-identity
              // slots — ONE arrival id, so the row logs at most once
              // per generation however many slots it improves
              if (pick && !pickOverL.isEmpty) {
                val rU = unsafeCopy(copied, rUnsafe)
                arrivalSeq += 1
                val aid = arrivalSeq
                pickOverL.foreachSlot { (lRowOv, h, j) =>
                  if (lPosProj(lRowOv).getLong(1) > arrivalPos) {
                    joined(lRowOv, copied)
                    if (pred.eval(joined))
                      pickOverL.offer(h, j, rU, rPosS, rPosE, aid)
                  }
                }
              }
            } else {
              // resolve undecided left entries that this right row matches
              var hits: List[SweepEntry] = Nil
              activeL.foreachLive { e =>
                joined(e.row, copied)
                if (pred.eval(joined)) hits = e :: hits
              }
              hits.foreach { e =>
                activeL.kill(e)
                if (semi) pending =
                  pending ++ Iterator.single(e.row).map(outProj(_))
              }
              // demoted undecided rows: the state bit enforces exactly-
              // once (semi emits on the 0->1 transition, anti at drop)
              if (!statefulOverL.isEmpty)
                statefulOverL.foreachSlot { (lRowOv, arr, j) =>
                  if (arr(j) == 0L && lPosProj(lRowOv).getLong(1) > arrivalPos) {
                    joined(lRowOv, copied)
                    if (pred.eval(joined)) {
                      arr(j) = 1L
                      if (semi) {
                        val c = lRowOv.copy()
                        pending = pending ++ Iterator.single(c).map(outProj(_))
                      }
                    }
                  }
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
  /** Output attribute list shared by the logical node and the exec:
    * outer join types mark the null-padded side(s) nullable, exactly as
    * Spark's own Join node does — the projection's generated null checks
    * depend on it. */
  def outputFor(mode: String, joinType: JoinType, lOut: Seq[Attribute],
                rOut: Seq[Attribute], countAttr: Option[Attribute]): Seq[Attribute] =
    mode match {
      case SweepMode.Count => lOut :+ countAttr.get
      case _ => joinType match {
        case Inner => lOut ++ rOut
        case LeftOuter => lOut ++ rOut.map(_.withNullability(true))
        case RightOuter => lOut.map(_.withNullability(true)) ++ rOut
        case FullOuter => (lOut ++ rOut).map(_.withNullability(true))
        case _ => lOut
      }
    }

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
