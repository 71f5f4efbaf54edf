package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * Baseline: brute-force top-k via a key-partitioned block nested-loop
  * (exact). Scale path: LSH bucketing by random-hyperplane sign bits —
  * candidates only compare within a bucket, turning the O(n^2) scan into
  * a per-bucket quadratic with bucket sizes ~ n / 2^planes, distributed
  * by bucket hash.
  */
object Similarity {

  /** Element-wise quantization to integers (exact cross-engine math:
    * float -> double is exact, floor(double*scale) is IEEE-deterministic,
    * integer dot products are associative). */
  def quantize(vec: Column, scale: Int = 1000): Column =
    transform(vec, x => floor(x.cast("double") * scale).cast("long"))

  /** Integer dot product of two equally-sized long arrays. */
  def dotLong(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Double-precision cosine similarity (library API; not used in the
    * oracle queries because float-sum order is engine-dependent). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  /** Exact brute-force top-k by quantized dot product (descending), ties
    * broken by neighbor id. Output: (idCol, nb, dot, rank). The pair join
    * is a cross join per id — only for modest n or as the verification
    * step after LSH pruning. */
  def bruteForceTopK(df: DataFrame, k: Int, idCol: String = "vec_id",
                     vecCol: String = "embedding", scale: Int = 1000): DataFrame = {
    val q = df.select(col(idCol), quantize(col(vecCol), scale).as("_q"))
    val l = q.select(col(idCol), col("_q"))
    val r = q.select(col(idCol).as("nb"), col("_q").as("_qb"))
    val pairs = l.crossJoin(r).filter(col(idCol) =!= col("nb"))
      .withColumn("dot", dotLong(col("_q"), col("_qb")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("dot").desc, col("nb"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col(idCol), col("nb"), col("dot"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * md5-derived value in [-500, 500). Portable to SQL if ever needed. */
  private def planeComponent(plane: Int, dim: Column): Column =
    (conv(substring(md5(concat(lit(s"p$plane-"), dim.cast("string"))), 1, 8), 16, 10)
      .cast("long") % 1000) - 500

  /** LSH bucket id: sign bits of dot(vec, plane_p) for p in [0, planes).
    * Vectors in the same bucket are near-ish; join within buckets for
    * candidate pairs, then verify exactly. */
  def lshBucket(vec: Column, planes: Int = 8): Column = {
    val bits = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(quantize(vec), transform(sequence(lit(0), size(vec) - 1),
          d => planeComponent(p, d)), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: LSH-bucketed brute force (candidates share a
    * bucket). Recall < 1 by construction; raise `planes` for smaller
    * buckets / lower recall, lower for the reverse. */
  def lshTopK(df: DataFrame, k: Int, idCol: String = "vec_id",
              vecCol: String = "embedding", planes: Int = 8,
              scale: Int = 1000): DataFrame = {
    val q = df.select(col(idCol), quantize(col(vecCol), scale).as("_q"),
      lshBucket(col(vecCol), planes).as("_bkt"))
    val l = q.select(col(idCol), col("_q"), col("_bkt"))
    val r = q.select(col(idCol).as("nb"), col("_q").as("_qb"), col("_bkt"))
    val pairs = l.join(r, Seq("_bkt")).filter(col(idCol) =!= col("nb"))
      .withColumn("dot", dotLong(col("_q"), col("_qb")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("dot").desc, col("nb"))
    pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col(idCol), col("nb"), col("dot"), col("rank"))
  }
}
