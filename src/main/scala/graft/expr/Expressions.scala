package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Width dispatch for the quantized-vector expressions (round-18
  * narrowing, guide §2.3): the kernels accept array<int> OR array<long>
  * children natively, so an int-quantized vector is read at 4 bytes per
  * component with NO per-row cast — the `inputTypes` contract returns
  * the child's own type for those two spellings and falls back to
  * ArrayType(LongType) (an implicit up-cast) for anything else,
  * preserving the old coercion behavior for exotic callers. */
private[expr] object VecWidth {
  def isIntArray(e: Expression): Boolean =
    e.resolved && (e.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    })

  /** The accepted input type for one vector child. */
  def accept(e: Expression): DataType =
    if (!e.resolved) ArrayType(LongType)
    else e.dataType match {
      case t @ ArrayType(IntegerType, _) => t
      case t @ ArrayType(LongType, _) => t
      case _ => ArrayType(LongType)
    }

  /** The accepted type for a PAIR of vector children that a kernel
    * requires to share one width: int only when BOTH are int (the
    * mixed case up-casts the odd side to long). */
  def acceptPair(a: Expression, b: Expression): DataType =
    if (isIntArray(a) && isIntArray(b)) ArrayType(IntegerType)
    else ArrayType(LongType)
}

/** Single-pass implementations behind the custom Catalyst expressions.
  * Kept as static-style helpers so whole-stage codegen can call them
  * directly (the standard pattern for non-arithmetic expressions: the
  * generated Java invokes one static method — no Row boxing, no UDF
  * serialization, stays inside the WholeStageCodegen span). */
object ExprKernels {
  /** Zero-pad every digit run to width 10 so lexicographic order equals
    * natural order ("chr2" < "chr10"). One pass, no regex. */
  def natsortKey(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length + 16)
    var i = 0
    val n = str.length
    while (i < n) {
      val c = str.charAt(i)
      if (c >= '0' && c <= '9') {
        var j = i
        while (j < n && str.charAt(j) >= '0' && str.charAt(j) <= '9') j += 1
        var pad = 10 - (j - i)
        while (pad > 0) { sb.append('0'); pad -= 1 }
        sb.append(str, i, j)
        i = j
      } else {
        sb.append(c)
        i += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }

  private val aas =
    "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG"
  private def baseIdx(c: Char): Int = c match {
    case 'T' | 't' | 'U' | 'u' => 0
    case 'C' | 'c' => 1
    case 'A' | 'a' => 2
    case 'G' | 'g' => 3
    case _ => -1
  }

  /** Codon -> amino acid translation, standard NCBI table 1; unknown
    * codons and the trailing partial codon -> 'X' (reference
    * ext/seqs.py:150-162: "Incomplete codons at the end of the sequence,
    * as well as non-canonical codons, result in the unknown character").
    * One pass, no map lookups (direct base-4 indexing). */
  def translateCds(s: UTF8String): UTF8String = translateCodons(s, aas)

  /** Same pass against an arbitrary 64-char NCBI code string (TCAG-major
    * codon order); '---' gap codons -> '-' (reference ext/seqs.py:43). */
  def translateCodons(s: UTF8String, table: String): UTF8String = {
    val str = s.toString
    val full = str.length / 3
    val partial = str.length % 3 != 0
    val sb = new java.lang.StringBuilder(full + 1)
    var i = 0
    while (i < full) {
      val c0 = str.charAt(3 * i)
      val c1 = str.charAt(3 * i + 1)
      val c2 = str.charAt(3 * i + 2)
      if (c0 == '-' && c1 == '-' && c2 == '-') sb.append('-')
      else {
        val a = baseIdx(c0)
        val b = baseIdx(c1)
        val c = baseIdx(c2)
        sb.append(if (a < 0 || b < 0 || c < 0) 'X' else table(a * 16 + b * 4 + c))
      }
      i += 1
    }
    if (partial) sb.append('X')
    UTF8String.fromString(sb.toString)
  }

  /** nProbe nearest centroid cells via a TWO-LEVEL branch-and-bound —
    * EXACT (bit-equal to [[nearestCells]], same (distance asc, cell
    * asc) contract) but O(sqrt(k) x dim) per row in the common case
    * instead of O(k x dim): super-cells are scanned in distance order
    * and a whole group is skipped when the triangle-inequality lower
    * bound `||v - s_g|| - radius_g` already exceeds the current
    * nProbe-th best TRUE distance. The flat argmin dominated the 8M
    * text-semdedup walls (assignment is O(k x dim)/row and k grows
    * with n to hold per-cell population — BASELINE.md
    * round14-semtext-8m); this kernel cuts it ~sqrt(k)-fold while
    * keeping the result exact:
    *
    *  - candidate distances stay EXACT LONGS (the flat kernel's
    *    true-squared-distance loop, with its partial-distance early
    *    exit) and ties insert by (d asc, cell asc) explicitly — visit
    *    order across groups is distance-sorted, not cell-sorted, so
    *    the tie compare the flat kernel gets for free from its
    *    ascending scan is spelled out here;
    *  - pruning bounds are FLOATING but one-sided: the bound is
    *    deflated and the incumbent inflated by 1e-9 relative (orders
    *    of magnitude beyond accumulated double rounding at any
    *    realistic dim), so a group is skipped only when every member
    *    is STRICTLY worse than the kept worst — float error can only
    *    cost a wasted scan, never a changed result. */
  def nearestCellsTwoLevel(v: ArrayData, idx: TwoLevelCells,
                           nProbe: Int): ArrayData = {
    val centers = idx.centers
    val k = math.min(nProbe, centers.length)
    val nv = v.numElements()
    val G = idx.supers.length
    val dg = new Array[Double](G)
    val og = new Array[Int](G)
    var g = 0
    while (g < G) {
      val s = idx.supers(g)
      var d = 0.0
      var i = 0
      val n = math.min(nv, s.length)
      while (i < n) { val t = v.getLong(i) - s(i); d += t * t; i += 1 }
      while (i < s.length) { d += s(i) * s(i); i += 1 }
      dg(g) = d
      // insertion into og by (d asc, g asc)
      var pos = g
      while (pos > 0 && d < dg(og(pos - 1))) pos -= 1
      var m = g
      while (m > pos) { og(m) = og(m - 1); m -= 1 }
      og(pos) = g
      g += 1
    }
    val dBest = new Array[Long](k)
    val cBest = new Array[Long](k)
    var filled = 0
    var gi = 0
    var done = false
    while (gi < G && !done) {
      val grp = og(gi)
      var skip = false
      if (filled == k) {
        // dBest holds TRUE squared distances (round 15 — same
        // accumulator as the flat kernel), so the triangle bound
        // compares directly; one-sided float slack as before
        val worstTrue = dBest(k - 1).toDouble * (1 + 1e-9)
        val sq = Math.sqrt(dg(grp))
        val lbAll = (sq - idx.rMax) * (1 - 1e-9)
        if (lbAll > 0 && lbAll * lbAll > worstTrue) { done = true; skip = true }
        else {
          val lb = (sq - idx.radius(grp)) * (1 - 1e-9)
          if (lb > 0 && lb * lb > worstTrue) skip = true
        }
      }
      if (!skip) {
        val mem = idx.members(grp)
        var mi = 0
        while (mi < mem.length) {
          val c = mem(mi)
          val row = centers(c)
          val n = math.min(nv, row.length)
          // partial-distance early exit (the flat kernel's round-15
          // guard): groups arrive nearest-first, so the incumbent is
          // tight almost immediately and far members abandon after a
          // few components; strict > can never skip a tie
          val worst = if (filled == k) dBest(k - 1) else Long.MaxValue
          var d = 0L
          var i = 0
          var live = true
          while (live && i < n) {
            val lim = math.min(i + 16, n)
            while (i < lim) {
              val t = row(i) - v.getLong(i)
              d += t * t
              i += 1
            }
            if (d > worst) live = false
          }
          while (live && i < row.length) {
            val lim = math.min(i + 16, row.length)
            while (i < lim) {
              val w = row(i)
              d += w * w
              i += 1
            }
            if (d > worst) live = false
          }
          if (live) {
            var pos = filled
            while (pos > 0 && (d < dBest(pos - 1) ||
                (d == dBest(pos - 1) && c < cBest(pos - 1)))) pos -= 1
            if (pos < k) {
              val upto = math.min(filled, k - 1)
              var m = upto
              while (m > pos) { dBest(m) = dBest(m - 1); cBest(m) = cBest(m - 1); m -= 1 }
              dBest(pos) = d
              cBest(pos) = c
              if (filled < k) filled += 1
            }
          }
          mi += 1
        }
      }
      gi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(cBest, filled))
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val spaceUtf8 = UTF8String.fromString(" ")
  private val sgnUtf8 = UTF8String.fromString("sgn")

  /** Signed hashed-n-gram embedding over a TOKEN ARRAY, one tight pass
    * (the TextOps.hashedNgramEmbedding kernel). Semantics are pinned to
    * the Column spelling it replaces, component for component:
    * shingle = n tokens space-joined; xxhash64 mode's bucket/sign are
    * `pmod(xxhash64(s), dim)` / `pmod(xxhash64(s, "sgn"), 2) * 2 - 1`
    * (XXH64 seed 42, then the "sgn" literal hashed with the first
    * hash as seed — exactly how the variadic xxhash64 chains); md5
    * mode's are the first 6 hex digits (= first 3 digest bytes) mod
    * dim and hex digit 7's (= byte 3's high nibble) parity. The
    * interpreted-HOF spelling measured 695.7 s at 2M docs — per-bucket
    * aggregate() lambdas pay dim x shingles interpreted dispatches per
    * row; this loop is the same arithmetic fused into one pass. */
  def hashedNgramEmbed(toks: ArrayData, n: Int, dim: Int,
                       distinct: Boolean, md5Mode: Boolean): ArrayData = {
    val acc = new Array[Float](dim)
    val nt = toks.numElements()
    if (nt >= n) {
      val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 1
      while (j < 2 * n - 1) { parts(j) = spaceUtf8; j += 2 }
      var p = 0
      while (p <= nt - n) {
        var i = 0
        while (i < n) { parts(2 * i) = toks.getUTF8String(p + i); i += 1 }
        val s = UTF8String.concat(parts: _*)
        if (seen == null || seen.add(s)) {
          if (md5Mode) {
            val md = md5Digest.get()
            md.reset()
            val d = md.digest(s.getBytes)
            val bucket =
              ((((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff)) % dim)
            acc(bucket) += (if (((d(3) >> 4) & 1) == 1) 1f else -1f)
          } else {
            val h1 = org.apache.spark.sql.catalyst.expressions.XXH64
              .hashUTF8String(s, 42L)
            val b = (((h1 % dim) + dim) % dim).toInt
            val h2 = org.apache.spark.sql.catalyst.expressions.XXH64
              .hashUTF8String(sgnUtf8, h1)
            acc(b) += (if (((h2 % 2) + 2) % 2 == 1) 1f else -1f)
          }
        }
        p += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(acc)
  }

  /** Euclid gcd on longs (exact-fraction reduction in the bigWig divide
    * payload). Plain long arithmetic — no BigInt allocation per row. */
  def gcdLong(a0: Long, b0: Long): Long = {
    var a = math.abs(a0)
    var b = math.abs(b0)
    while (b != 0) { val t = a % b; a = b; b = t }
    a
  }

  /** Integer dot product over two long arrays (quantized embeddings).
    * Tight primitive loop on Spark's columnar ArrayData — no per-element
    * lambda dispatch, no intermediate zip array. Arrays are assumed
    * null-element-free (the quantize() contract). */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var s = 0L
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** The array<int> spellings of [[dotLong]] (round-18 narrowing, guide
    * §2.3 narrower types): quantized embedding components fit int32 —
    * the kill-gate magnitude contract (sum x_i^2 < 2^63) already caps
    * every |x_i| well inside int for any dim >= 4 — so the vectors can
    * ride the rank shuffle and the quadratic kill join at 4 bytes per
    * component instead of 8. Products widen to long BEFORE multiplying;
    * the accumulated sums are bit-identical to the long spelling for
    * any in-contract input. Mixed variants cover int vectors dotted
    * against long literal matrices (centroid dots) without a per-row
    * array cast. */
  def dotIntInt(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var s = 0L
    while (i < n) { s += a.getInt(i).toLong * b.getInt(i); i += 1 }
    s
  }

  def dotIntLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var s = 0L
    while (i < n) { s += a.getInt(i) * b.getLong(i); i += 1 }
    s
  }

  def dotLongInt(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var s = 0L
    while (i < n) { s += a.getLong(i) * b.getInt(i); i += 1 }
    s
  }

  /** The exact integer cosine kill gate — `n2a > 0 AND n2b > 0 AND
    * dot(a,b) >= 0 AND 10^4 * dot^2 >= tPct^2 * n2a * n2b` (cosine >=
    * tPct/100 on quantized vectors, the SemDedup contract) — fused
    * into ONE pass with a MONOTONE PARTIAL-BOUND EARLY EXIT: at any
    * prefix p the final dot is bounded above by
    * `dot_p + sqrt((n2a - prefA_p) * (n2b - prefB_p))` (Cauchy–Schwarz
    * on the remaining suffix, with the suffix norms derived EXACTLY
    * from the full norms minus the long-integer prefix sums), so once
    * that bound falls below the required `tPct/100 * sqrt(n2a*n2b)`
    * the pair can be abandoned mid-row. The exit is ONE-SIDED: the
    * bound is inflated and the requirement deflated by 1e-9 relative
    * (orders beyond accumulated double rounding), so float error can
    * only cost a wasted scan, never a changed verdict — a skipped pair
    * is PROVABLY below threshold. Checked every 16 components, the
    * [[nearestCells]] cadence (a per-element branch taxed that kernel
    * measurably).
    *
    * The completed-dot verdict stays EXACT at any magnitude: a double
    * screen decides outside a 1e-9 relative guard band (double products
    * carry ~1e-15 relative error — the band is 6 orders wider), and
    * inside the band the compare re-runs in BigInteger, bit-equal to
    * the DecimalType(38,0) Column spelling the DuckDB oracles replay
    * in HUGEINT (q132/q133). Boundary ties (10^4*dot^2 == t^2*n2a*n2b)
    * land in the band and resolve exactly — OpsSpec pins gate ==
    * unguarded on constructed ties.
    *
    * MAGNITUDE CONTRACT (round-16 ADVICE): `n2a`/`n2b` must be the
    * EXACT squared norms — i.e. sum(x_i^2) must not wrap a Long
    * (sum |x_i|^2 < 2^63, guaranteed whenever dim * max(x_i)^2 < 2^63
    * — e.g. any dim <= 2^23 at the quantize contract's |x_i| <~ 2^20,
    * and every realistic embedding far below that). The one-sided
    * Cauchy–Schwarz abandon derives suffix norms as n2 minus the exact
    * prefix sums; with a WRAPPED n2 the suffix is garbage and the
    * bound is no longer one-sided — the documented bit-equality with
    * the Column gate (itself deterministic even on wrapped dots) would
    * silently break. Callers quantizing with [[graft.ml.Similarity]]
    * defaults (scale 1000, |component| <= ~10^6, dim <= ~10^4) sit
    * ~6 orders inside the bound. */
  def cosineKillGate(a: ArrayData, b: ArrayData, n2a: Long, n2b: Long,
                     tPct: Int): Boolean = {
    if (n2a <= 0 || n2b <= 0) return false
    val n = math.min(a.numElements(), b.numElements())
    // required = (tPct/100) * sqrt(n2a*n2b), deflated one-sidedly
    val needD = 0.01 * tPct *
      Math.sqrt(n2a.toDouble * n2b.toDouble) * (1 - 1e-9)
    var dot = 0L
    var pa = 0L
    var pb = 0L
    var i = 0
    while (i < n) {
      val lim = math.min(i + 16, n)
      while (i < lim) {
        val x = a.getLong(i)
        val y = b.getLong(i)
        dot += x * y
        pa += x * x
        pb += y * y
        i += 1
      }
      if (i < n) {
        val remA = (n2a - pa).toDouble
        val remB = (n2b - pb).toDouble
        // inflate the bound; the +1e-9 keeps the inflation one-sided
        // even when the partial bound itself is negative
        val ub = (dot.toDouble + Math.sqrt(remA * remB)) * (1 + 1e-9) + 1e-9
        if (ub < needD) return false
      }
    }
    if (dot < 0) return false
    // exact verdict: double screen outside the guard band, BigInteger
    // inside it (ties and near-ties — rare by construction)
    val lhs = 1e4 * dot.toDouble * dot.toDouble
    val rhs = tPct.toDouble * tPct * n2a.toDouble * n2b.toDouble
    if (lhs > rhs * (1 + 1e-9)) true
    else if (lhs < rhs * (1 - 1e-9)) false
    else {
      val big = java.math.BigInteger.valueOf(dot)
      val l = big.multiply(big)
        .multiply(java.math.BigInteger.valueOf(10000L))
      val r = java.math.BigInteger.valueOf(tPct.toLong * tPct)
        .multiply(java.math.BigInteger.valueOf(n2a))
        .multiply(java.math.BigInteger.valueOf(n2b))
      l.compareTo(r) >= 0
    }
  }

  /** The array<int> spelling of [[cosineKillGate]] — identical verdict
    * bit-for-bit for in-contract inputs (the int components widen to
    * long before every multiply; the accumulated dot/prefix sums are the
    * same longs), at half the memory traffic per pair on the serve
    * paths whose index tables store int vectors (round-18 narrowing). */
  def cosineKillGateInt(a: ArrayData, b: ArrayData, n2a: Long, n2b: Long,
                        tPct: Int): Boolean = {
    if (n2a <= 0 || n2b <= 0) return false
    val n = math.min(a.numElements(), b.numElements())
    val needD = 0.01 * tPct *
      Math.sqrt(n2a.toDouble * n2b.toDouble) * (1 - 1e-9)
    var dot = 0L
    var pa = 0L
    var pb = 0L
    var i = 0
    while (i < n) {
      val lim = math.min(i + 16, n)
      while (i < lim) {
        val x = a.getInt(i).toLong
        val y = b.getInt(i).toLong
        dot += x * y
        pa += x * x
        pb += y * y
        i += 1
      }
      if (i < n) {
        val remA = (n2a - pa).toDouble
        val remB = (n2b - pb).toDouble
        val ub = (dot.toDouble + Math.sqrt(remA * remB)) * (1 + 1e-9) + 1e-9
        if (ub < needD) return false
      }
    }
    if (dot < 0) return false
    val lhs = 1e4 * dot.toDouble * dot.toDouble
    val rhs = tPct.toDouble * tPct * n2a.toDouble * n2b.toDouble
    if (lhs > rhs * (1 + 1e-9)) true
    else if (lhs < rhs * (1 - 1e-9)) false
    else {
      val big = java.math.BigInteger.valueOf(dot)
      val l = big.multiply(big)
        .multiply(java.math.BigInteger.valueOf(10000L))
      val r = java.math.BigInteger.valueOf(tPct.toLong * tPct)
        .multiply(java.math.BigInteger.valueOf(n2a))
        .multiply(java.math.BigInteger.valueOf(n2b))
      l.compareTo(r) >= 0
    }
  }

  /** Stride-16 prefix squared norms of a quantized vector: entry k =
    * sum(x_i^2) over i in [0, min(16*(k+1), len)) — so the LAST entry
    * is the full squared norm and entry k is the exact prefix the
    * [[cosineKillGatePre]] checkpoint at element 16*(k+1) needs. An
    * empty vector yields [0] (norm 0 — the gate's n2 > 0 guard catches
    * it). Computed ONCE per row; the v1 [[cosineKillGate]] recomputes
    * both prefix sums per PAIR (3 multiplies per component on the kill
    * join's quadratic hot path — this rider drops it to 1). */
  def prefixNorms16(a: ArrayData): ArrayData = {
    val len = a.numElements()
    val k = math.max(1, (len + 15) / 16)
    val out = new Array[Long](k)
    var s = 0L
    var i = 0
    var ck = 0
    while (i < len) {
      val lim = math.min(i + 16, len)
      while (i < lim) { val x = a.getLong(i); s += x * x; i += 1 }
      out(ck) = s
      ck += 1
    }
    if (len == 0) out(0) = 0L
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** The array<int> spelling of [[prefixNorms16]] — identical output
    * longs (components widen before squaring). */
  def prefixNorms16Int(a: ArrayData): ArrayData = {
    val len = a.numElements()
    val k = math.max(1, (len + 15) / 16)
    val out = new Array[Long](k)
    var s = 0L
    var i = 0
    var ck = 0
    while (i < len) {
      val lim = math.min(i + 16, len)
      while (i < lim) { val x = a.getInt(i).toLong; s += x * x; i += 1 }
      out(ck) = s
      ck += 1
    }
    if (len == 0) out(0) = 0L
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** The v2 kill gate: identical VERDICT to [[cosineKillGate]] (and
    * therefore to the Decimal Column gate — one-sided abandons plus the
    * same exact completed-dot verdict), but the per-pair prefix norms
    * come from the per-ROW [[prefixNorms16]] riders instead of being
    * re-accumulated per pair, so the hot loop is ONE multiply-add per
    * component (dot only), and the Cauchy–Schwarz checkpoint compares
    * in SQUARED form (rem_a * rem_b < gap^2) — no per-checkpoint sqrt.
    * One sqrt per pair remains (the threshold right-hand side). The
    * abandon stays one-sided: rem products inflate and the needed dot
    * deflates by 4e-9 relative (double rounding is ~1e-15), so a skip
    * is PROVABLY below threshold; in-band completed dots re-run in
    * BigInteger exactly as v1. Same magnitude contract as v1: the
    * prefix sums (hence the full norms) must be exact Longs. */
  def cosineKillGatePre(a: ArrayData, b: ArrayData, pna: ArrayData,
                        pnb: ArrayData, tPct: Int): Boolean = {
    val n2a = pna.getLong(pna.numElements() - 1)
    val n2b = pnb.getLong(pnb.numElements() - 1)
    if (n2a <= 0 || n2b <= 0) return false
    val n = math.min(a.numElements(), b.numElements())
    val needD = 0.01 * tPct *
      Math.sqrt(n2a.toDouble * n2b.toDouble) * (1 - 1e-9)
    var dot = 0L
    var i = 0
    var ck = 0
    while (i < n) {
      val lim = math.min(i + 16, n)
      while (i < lim) { dot += a.getLong(i) * b.getLong(i); i += 1 }
      if (i < n) {
        // i == 16*(ck+1) exactly, and 16*(ck+1) < n <= both lengths, so
        // pn*(ck) is the exact prefix over the consumed elements
        val remA = (n2a - pna.getLong(ck)).toDouble
        val remB = (n2b - pnb.getLong(ck)).toDouble
        val dd = dot.toDouble
        // abandon iff dot + sqrt(remA*remB) provably < needD, in squared
        // form. The gap carries an ABSOLUTE slack scaled to the operand
        // magnitudes (dots past 2^53 round in toDouble — a relative
        // inflation of the squared compare alone would not cover a
        // rounding error larger than a small gap), and the rem product
        // inflates relatively (+1e-9 absolute for the rounds-to-zero
        // edge) — both one-sided, 3-6 orders beyond double rounding
        val gap = (needD - dd) - (Math.abs(dd) + needD) * 1e-12
        if (gap > 0 && remA * remB * (1 + 4e-9) + 1e-9 < gap * gap)
          return false
        ck += 1
      }
    }
    if (dot < 0) return false
    val lhs = 1e4 * dot.toDouble * dot.toDouble
    val rhs = tPct.toDouble * tPct * n2a.toDouble * n2b.toDouble
    if (lhs > rhs * (1 + 1e-9)) true
    else if (lhs < rhs * (1 - 1e-9)) false
    else {
      val big = java.math.BigInteger.valueOf(dot)
      val l = big.multiply(big)
        .multiply(java.math.BigInteger.valueOf(10000L))
      val r = java.math.BigInteger.valueOf(tPct.toLong * tPct)
        .multiply(java.math.BigInteger.valueOf(n2a))
        .multiply(java.math.BigInteger.valueOf(n2b))
      l.compareTo(r) >= 0
    }
  }

  /** The array<int> spelling of [[cosineKillGatePre]] — identical
    * verdict bit-for-bit for in-contract inputs (components widen to
    * long before the multiply-add; the prefix-norm riders stay long
    * arrays either way). This is THE hot loop of the quadratic kill
    * join: at 4 bytes per component each (candidate, killer) pair reads
    * half the memory the long spelling did (round-18 narrowing, §2.3). */
  def cosineKillGatePreInt(a: ArrayData, b: ArrayData, pna: ArrayData,
                           pnb: ArrayData, tPct: Int): Boolean = {
    val n2a = pna.getLong(pna.numElements() - 1)
    val n2b = pnb.getLong(pnb.numElements() - 1)
    if (n2a <= 0 || n2b <= 0) return false
    val n = math.min(a.numElements(), b.numElements())
    val needD = 0.01 * tPct *
      Math.sqrt(n2a.toDouble * n2b.toDouble) * (1 - 1e-9)
    var dot = 0L
    var i = 0
    var ck = 0
    while (i < n) {
      val lim = math.min(i + 16, n)
      while (i < lim) { dot += a.getInt(i).toLong * b.getInt(i); i += 1 }
      if (i < n) {
        val remA = (n2a - pna.getLong(ck)).toDouble
        val remB = (n2b - pnb.getLong(ck)).toDouble
        val dd = dot.toDouble
        val gap = (needD - dd) - (Math.abs(dd) + needD) * 1e-12
        if (gap > 0 && remA * remB * (1 + 4e-9) + 1e-9 < gap * gap)
          return false
        ck += 1
      }
    }
    if (dot < 0) return false
    val lhs = 1e4 * dot.toDouble * dot.toDouble
    val rhs = tPct.toDouble * tPct * n2a.toDouble * n2b.toDouble
    if (lhs > rhs * (1 + 1e-9)) true
    else if (lhs < rhs * (1 - 1e-9)) false
    else {
      val big = java.math.BigInteger.valueOf(dot)
      val l = big.multiply(big)
        .multiply(java.math.BigInteger.valueOf(10000L))
      val r = java.math.BigInteger.valueOf(tPct.toLong * tPct)
        .multiply(java.math.BigInteger.valueOf(n2a))
        .multiply(java.math.BigInteger.valueOf(n2b))
      l.compareTo(r) >= 0
    }
  }

  /** nProbe nearest centroid cells of a quantized vector: euclidean
    * argmin over a REFERENCE matrix, ordered (d asc, cell asc) —
    * bit-equal to the unrolled least()/array_sort struct spelling it
    * replaces, but O(1) generated-code size at any cell count (the
    * unrolled spelling emits one struct comparator per cell and blows
    * Janino's 64 KB method limit at ~1024 cells, dropping the WHOLE
    * stage to interpreted — measured in MlBench `semdedup`).
    *
    * Round 15: the accumulator is the TRUE squared distance
    * sum((c_j - v_j)^2) over the centroid's components (v_j = 0 past
    * the vector's length — the same convention the old |c|^2 - 2 v.c
    * form had), which is MONOTONE nondecreasing in j, so once the
    * partial sum strictly exceeds the current nProbe-th best the cell
    * can be abandoned mid-row (partial-distance early exit — exact by
    * construction: a strictly-greater partial can never end <= worst,
    * and ties are never skipped because the break is strict).
    * MEASURED (BASELINE.md round15-assign): the full flat scan at
    * 8M x 4000 cells x 64 dims took 150.8 s without the exit; the
    * early-exit scan abandons most cells after a handful of
    * components. Ordering is unchanged from the old form — for the
    * rectangular matrices every caller builds, the two accumulators
    * differ by the per-row constant |v|^2, which shifts every cell's
    * distance equally. */
  def nearestCells(v: ArrayData, centers: Array[Array[Long]],
                   nProbe: Int): ArrayData = {
    val k = math.min(nProbe, centers.length)
    val dBest = new Array[Long](k)
    val cBest = new Array[Long](k)
    var filled = 0
    var c = 0
    val nv = v.numElements()
    while (c < centers.length) {
      val row = centers(c)
      val n = math.min(nv, row.length)
      val worst = if (filled == k) dBest(k - 1) else Long.MaxValue
      var d = 0L
      var j = 0
      var live = true
      // exit check every 16 components, not per element: the per-element
      // branch measurably taxed the nProbe=4 path (148.1 -> 159.3 s at
      // 8M) while the win comes from abandoning whole tails
      while (live && j < n) {
        val lim = math.min(j + 16, n)
        while (j < lim) {
          val t = row(j) - v.getLong(j)
          d += t * t
          j += 1
        }
        if (d > worst) live = false
      }
      while (live && j < row.length) {
        val lim = math.min(j + 16, row.length)
        while (j < lim) {
          val w = row(j)
          d += w * w
          j += 1
        }
        if (d > worst) live = false
      }
      if (live) {
        // insertion ordered by (d asc, cell asc): strict < keeps the
        // earlier (smaller) cell id in front on distance ties
        var pos = filled
        while (pos > 0 && d < dBest(pos - 1)) pos -= 1
        if (pos < k) {
          val upto = math.min(filled, k - 1)
          var m = upto
          while (m > pos) { dBest(m) = dBest(m - 1); cBest(m) = cBest(m - 1); m -= 1 }
          dBest(pos) = d
          cBest(pos) = c
          if (filled < k) filled += 1
        }
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(cBest, filled))
  }

  /** The array<int> spelling of [[nearestCells]] — identical cells and
    * ordering bit-for-bit (the int components widen to long before the
    * subtract; distances are the same longs), with the per-row vector
    * read at half the bytes (round-18 narrowing). Same partial-distance
    * early exit, same stride-16 check cadence. */
  def nearestCellsInt(v: ArrayData, centers: Array[Array[Long]],
                      nProbe: Int): ArrayData = {
    val k = math.min(nProbe, centers.length)
    val dBest = new Array[Long](k)
    val cBest = new Array[Long](k)
    var filled = 0
    var c = 0
    val nv = v.numElements()
    while (c < centers.length) {
      val row = centers(c)
      val n = math.min(nv, row.length)
      val worst = if (filled == k) dBest(k - 1) else Long.MaxValue
      var d = 0L
      var j = 0
      var live = true
      while (live && j < n) {
        val lim = math.min(j + 16, n)
        while (j < lim) {
          val t = row(j) - v.getInt(j)
          d += t * t
          j += 1
        }
        if (d > worst) live = false
      }
      while (live && j < row.length) {
        val lim = math.min(j + 16, row.length)
        while (j < lim) {
          val w = row(j)
          d += w * w
          j += 1
        }
        if (d > worst) live = false
      }
      if (live) {
        var pos = filled
        while (pos > 0 && d < dBest(pos - 1)) pos -= 1
        if (pos < k) {
          val upto = math.min(filled, k - 1)
          var m = upto
          while (m > pos) { dBest(m) = dBest(m - 1); cBest(m) = cBest(m - 1); m -= 1 }
          dBest(pos) = d
          cBest(pos) = c
          if (filled < k) filled += 1
        }
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(cBest, filled))
  }
}

/** The driver-built two-level structure behind
  * [[ExprKernels.nearestCellsTwoLevel]]: ~sqrt(k) super-cells (a small
  * deterministic Lloyd pass over the k CENTROIDS — tiny: the input is
  * the centroid matrix, never the corpus), each with its member cell
  * ids ascending and a conservatively-inflated covering radius. Ships
  * to executors as ONE codegen reference object, like the centroid
  * matrix itself. */
final class TwoLevelCells(val centers: Array[Array[Long]],
                          val supers: Array[Array[Double]],
                          val members: Array[Array[Int]],
                          val radius: Array[Double],
                          val rMax: Double) extends Serializable

object TwoLevelCells {
  /** Deterministic build: G = ceil(sqrt(k)) super-centers initialized
    * at evenly-spaced centroid indices, 10 Lloyd iterations (ties to
    * the smaller group), means in double space. Grouping quality only
    * affects pruning SPEED — any partition of the cells is exact. */
  def build(centers: Array[Array[Long]]): TwoLevelCells = {
    val k = centers.length
    require(k >= 1, "TwoLevelCells: empty centroid matrix")
    // RECTANGULAR ONLY (round-16 ADVICE): member distances in the scan
    // kernel accumulate over row.length components while the pruning
    // bound and the build-time radii live in padded dim-space — for a
    // RAGGED matrix whose short rows face a longer query, the dim-space
    // lower bound can exceed a member's actual flat-kernel distance and
    // a group would be wrongly skipped, silently breaking the
    // documented bit-equality with NearestCellsLong. Every product
    // caller (trainIvfCentroids, ivfCentroids, padToK) builds
    // rectangular matrices; fail fast on anything else.
    require(centers.forall(_.length == centers(0).length),
      "TwoLevelCells: ragged centroid matrix (rows of unequal length) — " +
        "the triangle-inequality prune is only exact for rectangular " +
        "matrices; pad rows to a common dimension before building")
    val dim = centers.map(_.length).max
    val G = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    def comp(row: Array[Long], j: Int): Double =
      if (j < row.length) row(j).toDouble else 0.0
    val supers = Array.tabulate(G) { i =>
      val c = centers(((i.toLong * k) / G).toInt)
      Array.tabulate(dim)(j => comp(c, j))
    }
    val assign = new Array[Int](k)
    var it = 0
    while (it < 10) {
      var c = 0
      while (c < k) {
        val row = centers(c)
        var best = 0
        var bestD = Double.MaxValue
        var g = 0
        while (g < G) {
          val s = supers(g)
          var d = 0.0
          var j = 0
          while (j < dim) { val x = comp(row, j) - s(j); d += x * x; j += 1 }
          if (d < bestD) { bestD = d; best = g }
          g += 1
        }
        assign(c) = best
        c += 1
      }
      val sums = Array.fill(G)(new Array[Double](dim))
      val cnt = new Array[Int](G)
      var c2 = 0
      while (c2 < k) {
        val g = assign(c2)
        val row = centers(c2)
        var j = 0
        while (j < dim) { sums(g)(j) += comp(row, j); j += 1 }
        cnt(g) += 1
        c2 += 1
      }
      var g = 0
      while (g < G) {
        if (cnt(g) > 0) {
          var j = 0
          while (j < dim) { supers(g)(j) = sums(g)(j) / cnt(g); j += 1 }
        }
        g += 1
      }
      it += 1
    }
    // members from the LAST assignment, radii against the UPDATED
    // means (the covering property is re-measured, so the one-step
    // mean/assignment lag cannot under-cover)
    val members = Array.tabulate(G)(g => (0 until k).filter(assign(_) == g).toArray)
    val radius = Array.tabulate(G) { g =>
      val s = supers(g)
      var r = 0.0
      members(g).foreach { c =>
        val row = centers(c)
        var d = 0.0
        var j = 0
        while (j < dim) { val x = comp(row, j) - s(j); d += x * x; j += 1 }
        r = math.max(r, math.sqrt(d))
      }
      r * (1 + 1e-9) + 1e-9
    }
    new TwoLevelCells(centers, supers, members, radius, radius.max)
  }

  // expression copy() during tree transforms must not rebuild the
  // structure: memo by content hash, verified by deep equality. The
  // cache is BOUNDED (round-16 ADVICE): a long-lived session training
  // many centroid sets would otherwise retain every matrix (centers +
  // supers + members) for the JVM lifetime — past the cap the whole
  // map is dropped (the entries are pure derived state; the only cost
  // of eviction is one rebuild per re-seen matrix).
  private val maxCached = 16
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, TwoLevelCells]()
  def cached(centers: Array[Array[Long]]): TwoLevelCells = {
    val h = java.util.Arrays.deepHashCode(centers.asInstanceOf[Array[AnyRef]])
    val hit = cache.get(h)
    if (hit != null && java.util.Arrays.deepEquals(
        hit.centers.asInstanceOf[Array[AnyRef]],
        centers.asInstanceOf[Array[AnyRef]])) hit
    else {
      val b = build(centers)
      if (cache.size >= maxCached) cache.clear()
      cache.put(h, b)
      b
    }
  }
}

/** Natural-sort key as a native codegen'd Catalyst expression (replaces
  * the 9-pass regexp_replace chain — reference natsort usage,
  * methods/sort.py:12-40). */
case class NatSortKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    ExprKernels.natsortKey(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ExprKernels.natsortKey($c)")
  override protected def withNewChildInternal(c: Expression): NatSortKey = copy(c)
}

/** Codon translation as a native codegen'd expression (promotion of the
  * Seqs.translateCds UDF per SURVEY.md §4.3.5). */
case class TranslateCds(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    ExprKernels.translateCds(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ExprKernels.translateCds($c)")
  override protected def withNewChildInternal(c: Expression): TranslateCds = copy(c)
}

/** Translation against an arbitrary genetic-code table (a 64-char AA
  * string in TCAG-major codon order) — the table rides as a codegen
  * reference object, so every NCBI variant stays inside whole-stage
  * codegen with zero per-row lookup cost. */
case class TranslateCodons(child: Expression, table: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    ExprKernels.translateCodons(v.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gcTable", table, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.expr.ExprKernels.translateCodons($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): TranslateCodons =
    copy(child = c)
}

/** Quantized-embedding dot product as a native codegen'd expression —
  * replaces an aggregate(zip_with(...)) higher-order-function chain that
  * paid per-element lambda dispatch on every candidate pair in the ANN
  * joins (measured ~4 us/pair at dim=64; the primitive loop is ~20x
  * cheaper and stays inside WholeStageCodegen). */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  // width-polymorphic (round-18, §2.3): each side is read at its OWN
  // declared width — array<int> children stay 4 bytes/component with no
  // per-row cast; anything else up-casts to array<long> as before. The
  // kernel is picked by type so codegen never reads an 8-byte slot off
  // a 4-byte array (the hazard the old mandatory cast guarded against).
  override def inputTypes = Seq(VecWidth.accept(left), VecWidth.accept(right))
  private def kernel: String = (VecWidth.isIntArray(left),
      VecWidth.isIntArray(right)) match {
    case (true, true) => "dotIntInt"
    case (true, false) => "dotIntLong"
    case (false, true) => "dotLongInt"
    case (false, false) => "dotLong"
  }
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    kernel match {
      case "dotIntInt" => ExprKernels.dotIntInt(x, y)
      case "dotIntLong" => ExprKernels.dotIntLong(x, y)
      case "dotLongInt" => ExprKernels.dotLongInt(x, y)
      case _ => ExprKernels.dotLong(x, y)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ExprKernels.$kernel($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}

/** nProbe nearest IVF cells as a native codegen'd expression with the
  * centroid matrix riding as a REFERENCE OBJECT — constant generated-
  * code size at any cell count. The unrolled least()/array_sort struct
  * spelling it replaces emits one comparator per cell: at ~1024 cells
  * the generated method crosses Janino's 64 KB limit and the WHOLE
  * stage falls back to interpreted (measured in MlBench `semdedup` —
  * the ArraySort-cliff lesson, code-size edition). Ordering is
  * (distance asc, cell asc), bit-equal to the struct spelling. */
case class NearestCellsLong(child: Expression, centers: Array[Array[Long]],
                            nProbe: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // width-polymorphic (round-18): an int-quantized vector is scanned at
  // 4 bytes/component by the nearestCellsInt kernel, bit-equal cells
  override def inputTypes = Seq(VecWidth.accept(child))
  private def kernel: String =
    if (VecWidth.isIntArray(child)) "nearestCellsInt" else "nearestCells"
  // Array fields compare by REFERENCE under case-class equality, which
  // would break expression canonicalization (sameResult / ReuseExchange
  // / subexpression elimination) between plans built from equal-content
  // but separately-constructed matrices — compare and hash by content
  override def equals(other: Any): Boolean = other match {
    case NearestCellsLong(c, m, p) =>
      c == child && p == nProbe &&
        java.util.Arrays.deepEquals(
          m.asInstanceOf[Array[AnyRef]], centers.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child,
      Integer.valueOf(java.util.Arrays.deepHashCode(
        centers.asInstanceOf[Array[AnyRef]])),
      Integer.valueOf(nProbe))
  override protected def nullSafeEval(v: Any): Any =
    if (VecWidth.isIntArray(child))
      ExprKernels.nearestCellsInt(v.asInstanceOf[ArrayData], centers, nProbe)
    else ExprKernels.nearestCells(v.asInstanceOf[ArrayData], centers, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellMatrix", centers, "long[][]")
    defineCodeGen(ctx, ev, c => s"graft.expr.ExprKernels.$kernel($c, $ref, $nProbe)")
  }
  override protected def withNewChildInternal(c: Expression): NearestCellsLong =
    copy(child = c)
}

/** The two-level exact variant of [[NearestCellsLong]] — same result
  * bit-for-bit (OpsSpec pins it against the flat kernel incl. padded
  * duplicate centroids and short vectors): distance-ordered super-cell
  * scan + triangle-inequality pruning + the same partial-distance
  * early exit. EXPLICIT OPT-IN, not the default: on high-dimensional
  * hashed-text embeddings the triangle bound barely prunes (distance
  * concentration) and the reordered member scan loses the flat
  * kernel's sequential prefetch locality — measured SLOWER than flat
  * at 8M x 4000 x 64 (172.4 vs 115.2 s; BASELINE.md round15-assign).
  * Use it for genuinely clustered LOW-dimensional cell geometries,
  * where the bound fires and the member scan shrinks to one or two
  * groups. The structure is memo-cached so Catalyst copy() churn
  * never rebuilds it. */
case class NearestCellsTwoLevel(child: Expression,
                                centers: Array[Array[Long]], nProbe: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(ArrayType(LongType))
  // content-based equality, the NearestCellsLong contract (array fields
  // otherwise compare by reference and break canonicalization)
  override def equals(other: Any): Boolean = other match {
    case NearestCellsTwoLevel(c, m, p) =>
      c == child && p == nProbe &&
        java.util.Arrays.deepEquals(
          m.asInstanceOf[Array[AnyRef]], centers.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child,
      Integer.valueOf(java.util.Arrays.deepHashCode(
        centers.asInstanceOf[Array[AnyRef]])),
      Integer.valueOf(nProbe))
  @transient private lazy val idx = TwoLevelCells.cached(centers)
  override protected def nullSafeEval(v: Any): Any =
    ExprKernels.nearestCellsTwoLevel(v.asInstanceOf[ArrayData], idx, nProbe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellIndex", idx, "graft.expr.TwoLevelCells")
    defineCodeGen(ctx, ev,
      c => s"graft.expr.ExprKernels.nearestCellsTwoLevel($c, $ref, $nProbe)")
  }
  override protected def withNewChildInternal(c: Expression): NearestCellsTwoLevel =
    copy(child = c)
}

/** Hashed-n-gram embedding as a native codegen'd expression over the
  * token array — the TextOps.hashedNgramEmbedding hot path. One fused
  * pass per row (shingle + hash + accumulate), no per-bucket lambda
  * dispatch; OpsSpec pins bit-equality with both the interpreted-HOF
  * Column spelling and the retired explode+agg spelling. */
case class HashedNgramEmbed(child: Expression, n: Int, dim: Int,
                            distinct: Boolean, md5Mode: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false)
  override def inputTypes = Seq(ArrayType(StringType))
  override protected def nullSafeEval(v: Any): Any =
    ExprKernels.hashedNgramEmbed(v.asInstanceOf[ArrayData], n, dim,
      distinct, md5Mode)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.ExprKernels.hashedNgramEmbed($c, $n, $dim, $distinct, $md5Mode)")
  override protected def withNewChildInternal(c: Expression): HashedNgramEmbed =
    copy(child = c)
}

/** The fused early-exit cosine kill gate ([[ExprKernels.cosineKillGate]])
  * as a native codegen'd expression — replaces the DotLong +
  * Decimal(38,0) cross-multiplication chain on the semantic-dedup kill
  * join's hot path (SemDedup.audit, SemIndex serve, stream filters),
  * where the unguarded spelling paid a full-dim dot per (candidate,
  * better-ranked) pair. Bit-equal to the Column spelling by
  * construction (one-sided abandon + exact in-band compare); OpsSpec
  * pins equality including constructed boundary ties. */
case class CosineKillGate(first: Expression, second: Expression,
                          third: Expression, fourth: Expression, tPct: Int)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  // width-polymorphic on the vector pair (round-18): int kernel only
  // when BOTH sides are int (a mixed pair up-casts the odd side — a
  // shape no product path builds; serve sides derive their width from
  // the stored index schema, so probe and index always agree)
  override def inputTypes =
    Seq(VecWidth.acceptPair(first, second), VecWidth.acceptPair(first, second),
      LongType, LongType)
  private def intPair: Boolean =
    VecWidth.isIntArray(first) && VecWidth.isIntArray(second)
  override protected def nullSafeEval(a: Any, b: Any, n2a: Any,
                                      n2b: Any): Any =
    if (intPair)
      ExprKernels.cosineKillGateInt(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], n2a.asInstanceOf[Long],
        n2b.asInstanceOf[Long], tPct)
    else ExprKernels.cosineKillGate(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], n2a.asInstanceOf[Long],
      n2b.asInstanceOf[Long], tPct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = if (intPair) "cosineKillGateInt" else "cosineKillGate"
    defineCodeGen(ctx, ev, (a, b, x, y) =>
      s"graft.expr.ExprKernels.$k($a, $b, $x, $y, $tPct)")
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      q: Expression): CosineKillGate =
    copy(first = f, second = s, third = t, fourth = q)
}

/** Stride-16 prefix squared norms ([[ExprKernels.prefixNorms16]]) as a
  * native codegen'd expression — the per-ROW rider that lets
  * [[CosineKillGatePre]] drop the kill join's per-PAIR prefix
  * accumulation (3 multiplies per component -> 1 on the quadratic hot
  * path). Last element = the full squared norm. */
case class PrefixNorms16(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // width-polymorphic (round-18): the rider's OUTPUT stays array<long>
  // (prefix sums of squares outgrow int), only the vector read narrows
  override def inputTypes = Seq(VecWidth.accept(child))
  private def kernel: String =
    if (VecWidth.isIntArray(child)) "prefixNorms16Int" else "prefixNorms16"
  override protected def nullSafeEval(v: Any): Any =
    if (VecWidth.isIntArray(child))
      ExprKernels.prefixNorms16Int(v.asInstanceOf[ArrayData])
    else ExprKernels.prefixNorms16(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.ExprKernels.$kernel($c)")
  override protected def withNewChildInternal(c: Expression): PrefixNorms16 =
    copy(c)
}

/** The v2 fused kill gate ([[ExprKernels.cosineKillGatePre]]): verdict
  * bit-equal to [[CosineKillGate]] and the Decimal Column gate (OpsSpec
  * pins all three incl. constructed boundary ties), with the prefix
  * norms read off per-row [[PrefixNorms16]] riders — the batch kill
  * join's hot-path spelling (SemDedup.audit), where every (candidate,
  * better-ranked) pair paid 3 multiplies per component re-deriving
  * prefix sums the rows could carry once. */
case class CosineKillGatePre(first: Expression, second: Expression,
                             third: Expression, fourth: Expression,
                             tPct: Int)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  // width-polymorphic on the vector pair (round-18, §2.3): THE hot loop
  // of the quadratic kill join reads 4 bytes/component under the int
  // kernel; the prefix-norm riders stay array<long> either way
  override def inputTypes =
    Seq(VecWidth.acceptPair(first, second), VecWidth.acceptPair(first, second),
      ArrayType(LongType), ArrayType(LongType))
  private def intPair: Boolean =
    VecWidth.isIntArray(first) && VecWidth.isIntArray(second)
  override protected def nullSafeEval(a: Any, b: Any, pna: Any,
                                      pnb: Any): Any =
    if (intPair)
      ExprKernels.cosineKillGatePreInt(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], pna.asInstanceOf[ArrayData],
        pnb.asInstanceOf[ArrayData], tPct)
    else ExprKernels.cosineKillGatePre(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], pna.asInstanceOf[ArrayData],
      pnb.asInstanceOf[ArrayData], tPct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = if (intPair) "cosineKillGatePreInt" else "cosineKillGatePre"
    defineCodeGen(ctx, ev, (a, b, x, y) =>
      s"graft.expr.ExprKernels.$k($a, $b, $x, $y, $tPct)")
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      q: Expression): CosineKillGatePre =
    copy(first = f, second = s, third = t, fourth = q)
}

/** Long gcd as a codegen'd expression — replaces a BigInt-allocating
  * Scala UDF on the bigWig divide payload's hot tail. */
case class GcdLong(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes = Seq(LongType, LongType)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.gcdLong(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ExprKernels.gcdLong($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GcdLong =
    copy(left = newLeft, right = newRight)
}

object Exprs {
  import org.apache.spark.sql.GraftColumnBridge
  def natsort_key(c: Column): Column =
    GraftColumnBridge.column(NatSortKey(GraftColumnBridge.expression(c)))
  def translate_cds(c: Column): Column =
    GraftColumnBridge.column(TranslateCds(GraftColumnBridge.expression(c)))
  def translate_codons(c: Column, table: String): Column =
    GraftColumnBridge.column(TranslateCodons(GraftColumnBridge.expression(c), table))
  def dot_long(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotLong(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def nearest_cells(c: Column, centers: Array[Array[Long]], nProbe: Int): Column =
    GraftColumnBridge.column(NearestCellsLong(
      GraftColumnBridge.expression(c), centers, nProbe))
  def nearest_cells_two_level(c: Column, centers: Array[Array[Long]],
                              nProbe: Int): Column =
    GraftColumnBridge.column(NearestCellsTwoLevel(
      GraftColumnBridge.expression(c), centers, nProbe))
  def hashed_ngram_embed(toks: Column, n: Int, dim: Int,
                         distinct: Boolean, md5Mode: Boolean): Column =
    GraftColumnBridge.column(HashedNgramEmbed(
      GraftColumnBridge.expression(toks), n, dim, distinct, md5Mode))
  def cosine_kill_gate(a: Column, b: Column, n2a: Column, n2b: Column,
                       tPct: Int): Column =
    GraftColumnBridge.column(CosineKillGate(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b),
      GraftColumnBridge.expression(n2a), GraftColumnBridge.expression(n2b),
      tPct))
  def prefix_norms(c: Column): Column =
    GraftColumnBridge.column(PrefixNorms16(GraftColumnBridge.expression(c)))
  def cosine_kill_gate_pre(a: Column, b: Column, pna: Column, pnb: Column,
                           tPct: Int): Column =
    GraftColumnBridge.column(CosineKillGatePre(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b),
      GraftColumnBridge.expression(pna), GraftColumnBridge.expression(pnb),
      tPct))
  def gcd_long(a: Column, b: Column): Column =
    GraftColumnBridge.column(GcdLong(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Register both for SQL use: natsort_key(s), translate_cds(s). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "natsort_key", exprs => NatSortKey(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "translate_cds", exprs => TranslateCds(exprs.head), "scala_udf")
  }
}
