package graft.ext

import graft.core.Cols
import graft.ops.{BinaryOps, UnaryOps}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical helpers (reference ext/stats.py): multiple-testing
  * adjustment, per-group Simes, interval-set association coefficients.
  * All window/aggregate plans — no UDFs, no driver-side math.
  */
object Stats {
  import Cols.{Start, End}

  /** Benjamini-Hochberg FDR adjustment (reference ext/stats.py:124):
    * adj_i = min_{j>=i}(p_j * n / j) capped at 1, over p ascending.
    * Optional per-group keys; tieBreak makes rank assignment total. */
  def fdr(df: DataFrame, pCol: String, keys: Seq[String] = Nil,
          outCol: String = "fdr", tieBreak: Seq[Column] = Nil): DataFrame = {
    val part = if (keys.isEmpty) Window.partitionBy()
               else Window.partitionBy(keys.map(col): _*)
    val asc = part.orderBy(col(pCol).asc +: tieBreak: _*)
    val n = count(lit(1)).over(part.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing))
    val rank = row_number().over(asc)
    val raw = col(pCol) * n / rank
    // reverse running min: min over rows with rank >= current
    val desc = part.orderBy(col(pCol).desc +: tieBreak.map(_.desc): _*)
    df.withColumn("_adj", raw)
      .withColumn(outCol, least(min(col("_adj"))
        .over(desc.rowsBetween(Window.unboundedPreceding, Window.currentRow)), lit(1.0)))
      .drop("_adj")
  }

  /** Simes combined p-value per group (reference ext/stats.py:569-680):
    * min_i(p_i * n / rank_i). */
  def simes(df: DataFrame, pCol: String, keys: Seq[String],
            outCol: String = "simes"): DataFrame = {
    val part = Window.partitionBy(keys.map(col): _*)
    val rank = row_number().over(part.orderBy(col(pCol).asc))
    val n = count(lit(1)).over(part)
    df.withColumn("_s", col(pCol) * n / rank)
      .groupBy(keys.map(col): _*).agg(min(col("_s")).as(outCol))
  }

  /** Shared base of jaccard/forbes/mcc: merge EACH side once, take the
    * per-key merged lengths, and intersect the already-merged islands
    * directly (setIntersect would re-merge both sides — four window
    * sweeps instead of two). Returns (len_a, len_b, len_i) keyed rows. */
  private def mergedLens(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val ma = UnaryOps.merge(a, keys)
    val mb = UnaryOps.merge(b, keys)
    val la = ma.groupBy(keys.map(col): _*).agg(sum(col(End) - col(Start)).as("len_a"))
    val lb = mb.groupBy(keys.map(col): _*).agg(sum(col(End) - col(Start)).as("len_b"))
    val rs = Start + "_b"
    val re = End + "_b"
    val inter = graft.join.RangeJoin.pairs(ma, mb, keys)
      .groupBy(keys.map(col): _*)
      .agg(sum(least(col(End), col(re)) - greatest(col(Start), col(rs))).as("len_i"))
    la.join(lb, keys).join(inter, keys.toSeq, "left").na.fill(0L, Seq("len_i"))
  }

  /** Jaccard coefficient of two interval sets per key (reference
    * ext/stats.py:745-797): |A ∩ B| / |A ∪ B| in base pairs. Returns
    * integer numerator/denominator (exact; divide at the edge). */
  def jaccardStat(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    mergedLens(a, b, keys)
      .select(keys.map(col) :+ col("len_i").as("jaccard_num") :+
        (col("len_a") + col("len_b") - col("len_i")).as("jaccard_den"): _*)

  /** Forbes coefficient (reference ext/stats.py:687-742):
    * N * |A ∩ B| / (|A| * |B|) with N the key-space size (chromSizes).
    * Returned as exact integer numerator/denominator. */
  def forbesStat(a: DataFrame, b: DataFrame, keys: Seq[String],
                 chromSizes: DataFrame): DataFrame =
    mergedLens(a, b, keys)
      .join(broadcast(chromSizes), Seq(Cols.Chrom))
      .select(keys.map(col) :+ (col("size") * col("len_i")).as("forbes_num") :+
        (col("len_a") * col("len_b")).as("forbes_den"): _*)

  /** Fisher's exact test for 2x2 tables (reference ext/stats.py:174-246,
    * via the `fisher` package — 'greater' / 'less' / 'two-sided'
    * alternatives): hypergeometric tail under fixed margins for table
    * [[a,b],[c,d]]. Log-gamma formulation, numerically stable; per-row
    * UDF (pure, no state). */
  private def hypergeomLogPmf(a: Long, b: Long, c: Long, d: Long)(i: Long): Double = {
    def lg(x: Long): Double = org.apache.commons.math3.special.Gamma.logGamma(x + 1.0)
    val n = a + b + c + d
    val lDen = lg(n) - lg(a + b) - lg(c + d)
    val bb = a + b - i
    val cc = a + c - i
    val dd = d - a + i
    lg(a + c) - lg(i) - lg(cc) + lg(b + d) - lg(bb) - lg(dd) - lDen
  }

  private def fisherRange(a: Long, b: Long, c: Long, d: Long): (Long, Long) =
    (math.max(0L, a - d), math.min(a + b, a + c))

  val fisherExactGreater = udf { (a: Long, b: Long, c: Long, d: Long) =>
    val lp = hypergeomLogPmf(a, b, c, d) _
    val (_, hi) = fisherRange(a, b, c, d)
    var p = 0.0
    var i = a
    while (i <= hi) { p += math.exp(lp(i)); i += 1 }
    math.min(p, 1.0)
  }

  /** P[X <= a] (alternative='less'). */
  val fisherExactLess = udf { (a: Long, b: Long, c: Long, d: Long) =>
    val lp = hypergeomLogPmf(a, b, c, d) _
    val (lo, _) = fisherRange(a, b, c, d)
    var p = 0.0
    var i = lo
    while (i <= a) { p += math.exp(lp(i)); i += 1 }
    math.min(p, 1.0)
  }

  /** Two-sided: sum of all table probabilities <= P[observed] (the
    * standard 'sum of small p' definition, with the usual 1+1e-7 slack
    * for float round-off). */
  val fisherExactTwoSided = udf { (a: Long, b: Long, c: Long, d: Long) =>
    val lp = hypergeomLogPmf(a, b, c, d) _
    val (lo, hi) = fisherRange(a, b, c, d)
    val pObs = math.exp(lp(a)) * (1.0 + 1e-7)
    var p = 0.0
    var i = lo
    while (i <= hi) {
      val pi = math.exp(lp(i))
      if (pi <= pObs) p += pi
      i += 1
    }
    math.min(p, 1.0)
  }

  /** Row-wise Pearson moments over two equal-length integer array
    * columns (reference ext/stats.py:411-568 rowbased_pearson): exact
    * integer moments n*Σxy−ΣxΣy (covariance numerator) and the two
    * variance numerators — r = num / sqrt(denX*denY) at the caller's
    * float edge. Higher-order functions over the arrays, no explode. */
  def rowbasedPearsonMoments(x: Column, y: Column): Column = {
    def s(c: Column) = aggregate(c, lit(0L), (a, v) => a + v)
    val n = size(x).cast("long")
    val sx = s(x)
    val sy = s(y)
    val sxy = s(zip_with(x, y, (a, b) => a * b))
    val sxx = s(transform(x, v => v * v))
    val syy = s(transform(y, v => v * v))
    struct((n * sxy - sx * sy).as("num"),
      (n * sxx - sx * sx).as("den_x"),
      (n * syy - sy * sy).as("den_y"))
  }

  /** Row-wise Spearman = Pearson over within-row ranks (reference
    * ext/stats.py rankdata): ranks computed per row via array sort +
    * position lookup (average-rank ties are approximated by min-rank —
    * documented deviation). */
  def rowbasedSpearmanMoments(x: Column, y: Column): Column = {
    def ranks(c: Column) = transform(c, v =>
      aggregate(c, lit(0L), (acc, o) => acc + when(o < v, 1L).otherwise(0L)))
    rowbasedPearsonMoments(ranks(x), ranks(y))
  }

  /** Matthews correlation of two interval sets against the genome
    * background (reference ext/stats.py:249-408): confusion counts in
    * base pairs from merged/intersection lengths + chromSizes
    * (Chromosome, size). mcc = (TP*TN - FP*FN) / sqrt((TP+FP)(TP+FN)(TN+FP)(TN+FN));
    * exact integer numerator + the four factors returned. */
  def mccStat(a: DataFrame, b: DataFrame, keys: Seq[String],
              chromSizes: DataFrame): DataFrame = {
    mergedLens(a, b, keys)
      .join(broadcast(chromSizes), Seq(Cols.Chrom))
      .withColumn("tp", col("len_i"))
      .withColumn("fp", col("len_a") - col("len_i"))
      .withColumn("fn", col("len_b") - col("len_i"))
      .withColumn("tn", col("size") - col("len_a") - col("len_b") + col("len_i"))
      .select(keys.map(col) :+ col("tp") :+ col("fp") :+ col("fn") :+ col("tn") :+
        (col("tp") * col("tn") - col("fp") * col("fn")).as("mcc_num"): _*)
  }

  /** Relative-distance distribution (reference ext/stats.py:800-865):
    * histogram of floor(100 * reldist) where reldist is each a-midpoint's
    * distance to the nearest b-midpoint divided by the distance between
    * its two flanking b-midpoints. */
  def relativeDistance(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val amid = a.select(keys.map(col) :+ (col(Start) + col(End)).as("_m2"): _*)
    val bmid = b.select(keys.map(col) :+ (col(Start) + col(End)).as("_bm2"): _*)
    // as-of via union sweep: previous and next b midpoint around each a
    val aTag = amid.withColumn("_isA", lit(1)).withColumn("_bm2", lit(null).cast("long"))
    val bTag = bmid.withColumn("_isA", lit(0)).withColumn("_m2", lit(null).cast("long"))
      .select(aTag.columns.map(col): _*)
    val u = aTag.unionByName(bTag)
    val pos = coalesce(col("_bm2"), col("_m2"))
    val wPrev = Window.partitionBy(keys.map(col): _*)
      .orderBy(pos.asc, col("_isA").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(keys.map(col): _*)
      .orderBy(pos.desc, col("_isA").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withNbrs = u
      .withColumn("_prev", last(when(col("_isA") === 0, col("_bm2")), ignoreNulls = true).over(wPrev))
      .withColumn("_next", last(when(col("_isA") === 0, col("_bm2")), ignoreNulls = true).over(wNext))
      .filter(col("_isA") === 1 && col("_prev").isNotNull && col("_next").isNotNull &&
        col("_next") > col("_prev"))
    withNbrs
      .withColumn("_rd100", floor(least(col("_m2") - col("_prev"), col("_next") - col("_m2"))
        .cast("double") * 100 / (col("_next") - col("_prev"))).cast("long"))
      .groupBy(col("_rd100").as("reldist_x100")).agg(count(lit(1)).as("n"))
  }
}
