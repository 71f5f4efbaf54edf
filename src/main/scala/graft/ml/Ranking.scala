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

  /** Top-`topN` BM25-scored terms per document with k1=1.2, b=0.75
    * fixed as exact double literals. Emits the score as
    * `floor(1e6 * score)` (`score_x1m`) and ranks on THAT integer
    * (ties broken by term), so the float only influences the result
    * through its first six decimals. Residual cross-engine risk: the
    * idf's natural log is NOT IEEE-correctly-rounded (JVM `Math.log`
    * vs libm may differ in the last ulp), so a score landing within
    * ~1 ulp of an integer multiple of 1e-6 could floor differently
    * across engines — P ~ 1e-10 per row; every other term of the
    * expression is reproducible exactly (integer inputs, literal
    * constants, one division order). The sqrt-based samplers avoid
    * even this residual because sqrt IS correctly rounded. */
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
    val avgdl = scal.getLong(1).toDouble / nDocs
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(dl, idCol)
      .join(dft, "term")
      .withColumn("_idf", log(lit(1.0) +
        (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("score_x1m", floor(lit(1e6) * col("_idf") * (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl))))
        .cast("long"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_x1m").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= topN)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("score_x1m"), col("rnk").cast("long").as("rnk"))
  }
}
