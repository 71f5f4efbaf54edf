package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level relevance ranking for training-data curation: BM25
  * term scoring over the whole corpus (Robertson/Sparck-Jones idf with
  * the +1 smoothing, the standard k1/b length normalization).
  *
  * Scale design: every stage is a hash aggregation or hash join on a
  * well-distributed key — (doc, term) for tf, doc for length, term for
  * document frequency — so the plan is a fixed number of shuffles over
  * data proportional to the token stream; the corpus-wide scalars
  * (N, total length) ride a 1-row broadcast. Nothing is collected to
  * the driver and no per-term state is broadcast (vocabulary can be
  * arbitrarily large; the df join shuffles on term instead).
  */
object Ranking {

  /** Series length and fixed-point constants of the deterministic ln —
    * shared by the Spark expression below and the DuckDB oracle
    * generator ([[lnSeriesTerms]] is referenced there so the two can
    * never drift apart). LN2_Q18 = floor(ln 2 * 1e18); with the
    * argument range-reduced to [1, 2), the atanh series variable z is
    * < 1/3, so 18 terms put the truncation below 1e-17. */
  val lnSeriesTerms = 18
  val LN2_Q18 = "693147180559945309"
  val ONE_Q18 = "1000000000000000000"

  /** Top-`topN` BM25-scored terms per document with k1=1.2, b=0.75.
    * Emits the score as `score_x1m ~ floor(1e6 * score)` and ranks on
    * THAT integer (ties broken by term).
    *
    * ENGINE-EXACT BY CONSTRUCTION: every arithmetic step is integer
    * (decimal(38,0) here, HUGEINT in the DuckDB oracle) with floor
    * division, including the logarithm — the idf's ln is computed in
    * Q18 fixed point by binary range reduction (m = floor(log2 y) via
    * binary-string length, the q111 trick) plus an 18-term atanh
    * series, so both engines produce bit-identical integers and the
    * former Math.log-vs-libm last-ulp floor risk class is gone. The
    * quantization (Q18 ln, Q12 rational factor) deviates from the
    * real-valued BM25 score by < ~1e-10, orders below the 1e-6 output
    * quantum; the DEFINITION of score_x1m is this deterministic
    * integer computation.
    *
    * The BM25 term rewrites to exact rationals before quantizing:
    * idf = ln(2(N+1)/(2 df+1)), and the tf/length normalization
    * equals 22 tf TT / (10 tf TT + 3 TT + 9 dl N) with TT the corpus
    * token count — integer numerators/denominators throughout.
    * Operating bounds for decimal(38,0)/HUGEINT headroom: N <= ~1e12
    * docs, TT <= ~1e13 tokens, tf, dl <= ~1e6 (documented, far above
    * any per-partition reality; products stay below 1e36). */
  def bm25TopTerms(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id", topN: Int = 5): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col(idCol)).agg(sum("tf").as("dl"))
    // the two corpus scalars are computed EAGERLY (one scan+aggregate
    // job at plan-build, the same pattern as the Sizing samples) and
    // inlined as literals: joining a broadcast 1-row aggregate instead
    // plans as BroadcastNestedLoopJoin — Catalyst folds any constant
    // equi-key back to a cross join — and the suite-wide plan contract
    // (no |L|x|R| operators anywhere) rightly rejects that shape.
    // n_docs equals dl's row count because even an empty text yields
    // one (empty-string) token, so every document has >= 1 tf row.
    val scal = docs.agg(count(lit(1)).as("n"),
      sum(size(TextOps.tokens(col(textCol)))).cast("long").as("s")).head
    val nDocs = scal.getLong(0)
    if (nDocs == 0)
      return tf.select(col(idCol), col("term"), col("tf"), col("tf").as("df"),
        col("tf").as("score_x1m"), col("tf").as("rnk")).where(lit(false))
    val tt = scal.getLong(1)
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // The Q18 ln depends ONLY on df, so it is computed once per
    // DISTINCT df value — a table bounded by the corpus's distinct
    // document-frequency counts (hundreds even for web-scale corpora,
    // never the vocabulary) — and broadcast back. The per-(doc, term)
    // path keeps only codegen'd decimal multiply/divide; the
    // interpreted series fold runs on the tiny distinct table
    // (measured: inlining it per row cost ~5 s at sf0.1 vs ~0 here).
    var cur = dft.select("df").distinct()
      // y = idf argument as an exact rational num/den; m = floor(log2 y)
      .withColumn("_num", expr(s"CAST(${2L * (nDocs + 1)} AS DECIMAL(38,0))"))
      .withColumn("_den", expr("CAST(2 * df + 1 AS DECIMAL(38,0))"))
      .withColumn("_m", expr("length(bin(CAST(_num div _den AS BIGINT))) - 1"))
      // z = (y' - 1)/(y' + 1) in Q18, y' = y / 2^m in [1, 2)
      .withColumn("_p2", expr("CAST(shiftleft(CAST(1 AS BIGINT), _m) AS DECIMAL(38,0))"))
      .withColumn("_z", expr(s"CAST(((_num - _den * _p2) * $ONE_Q18) div (_num + _den * _p2) AS DECIMAL(38,0))"))
      .withColumn("_z2", expr(s"CAST((_z * _z) div $ONE_Q18 AS DECIMAL(38,0))"))
      // the series runs as ONE aggregate() fold — chained withColumns
      // would inline each step's tree into the next after projection
      // collapse (a quadratically-duplicated expression, measured 4x
      // slower steady-state); the fold evaluates its 2-field (p, acc)
      // state iteratively per row instead
      .withColumn("_ser", expr(
        s"aggregate(sequence(1, ${lnSeriesTerms - 1}), " +
          "named_struct('p', _z, 'acc', _z), " +
          "(s, i) -> named_struct(" +
          s"'p', CAST((s.p * _z2) div $ONE_Q18 AS DECIMAL(38,0)), " +
          s"'acc', CAST(s.acc + CAST((s.p * _z2) div $ONE_Q18 AS DECIMAL(38,0)) div (2 * i + 1) AS DECIMAL(38,0))))"))
    // ln y in Q18: m * ln2 + 2 * atanh(z)
    val dfLn = cur
      .withColumn("_ln", expr(s"CAST(_m AS DECIMAL(38,0)) * $LN2_Q18 + 2 * _ser.acc"))
      .select(col("df"), col("_ln"))
    val scored = tf
      .join(dl, idCol)
      .join(dft, "term")
      .join(broadcast(dfLn), "df")
      // 22 tf TT / (10 tf TT + 3 TT + 9 dl N) in Q12
      .withColumn("_r12", expr(
        s"CAST((CAST(22 AS DECIMAL(38,0)) * tf * $tt * 1000000000000) div " +
          s"(CAST(10 AS DECIMAL(38,0)) * tf * $tt + CAST(3 AS DECIMAL(38,0)) * $tt + " +
          s"CAST(9 AS DECIMAL(38,0)) * dl * $nDocs) AS DECIMAL(38,0))"))
      .withColumn("score_x1m", expr(
        "(_ln * _r12) div CAST('1000000000000000000000000' AS DECIMAL(38,0))"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_x1m").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= topN)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("score_x1m"), col("rnk").cast("long").as("rnk"))
  }

  /** The DuckDB replay of the fixed-point score — same constants and
    * [[lnSeriesTerms]], HUGEINT floor division mirroring decimal(38,0)
    * `div`. `tfCte` must provide tf(doc_id, term, tf); the caller
    * appends the ranking. Kept here so the series can never drift from
    * the Spark expression above. */
  def scoreOracleSqlCtes: String = {
    val series = (1 until lnSeriesTerms).map { i =>
      s"s$i AS (SELECT * REPLACE ((p * z2) // $ONE_Q18 AS p, " +
        s"acc + ((p * z2) // $ONE_Q18) // ${2 * i + 1} AS acc) FROM s${i - 1})"
    }.mkString(", ")
    """corpus AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tt FROM dl), """ +
      """dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), """ +
      """b0 AS (SELECT t.doc_id, t.term, t.tf, f.df, d.dl, c.n_docs, c.tt, """ +
      """CAST(2 * (c.n_docs + 1) AS HUGEINT) AS num, CAST(2 * f.df + 1 AS HUGEINT) AS den """ +
      """FROM tf t JOIN dl d USING (doc_id) JOIN dft f USING (term) CROSS JOIN corpus c), """ +
      """b1 AS (SELECT *, length(bin(CAST(num // den AS BIGINT))) - 1 AS m FROM b0), """ +
      """b2 AS (SELECT *, CAST((CAST(1 AS BIGINT) << m) AS HUGEINT) AS p2 FROM b1), """ +
      s"""b3 AS (SELECT *, ((num - den * p2) * CAST($ONE_Q18 AS HUGEINT)) // (num + den * p2) AS z FROM b2), """ +
      s"""s0 AS (SELECT *, (z * z) // $ONE_Q18 AS z2, z AS p, z AS acc FROM b3), """ +
      series + ", " +
      s"""fin AS (SELECT doc_id, term, tf, df, CAST(((CAST(m AS HUGEINT) * $LN2_Q18 + 2 * acc) * """ +
      s"""((CAST(22 AS HUGEINT) * tf * tt * 1000000000000) // """ +
      s"""(CAST(10 AS HUGEINT) * tf * tt + CAST(3 AS HUGEINT) * tt + CAST(9 AS HUGEINT) * dl * n_docs))) // """ +
      s"""CAST('1000000000000000000000000' AS HUGEINT) AS BIGINT) AS score_x1m FROM s${lnSeriesTerms - 1})"""
  }
}
