package graft.io

import graft.core.Cols
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Misc constructors (reference readers.py:22-57 `from_string`,
  * core/random.py:14-92 `random`, core/empty.py). */
object TableIO {
  import Cols._

  /** Parse a whitespace table literal with a header row — the reference's
    * doctest-friendly constructor (reference readers.py:22-57). */
  def fromString(spark: SparkSession, s: String): DataFrame = {
    val lines = s.trim.split("\n").map(_.trim).filter(_.nonEmpty)
    val header = lines.head.split("\\s+")
    val rows = lines.tail.map(_.split("\\s+"))
    import scala.jdk.CollectionConverters._
    val rowObjs = rows.map(r =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq)).toList.asJava
    val schema = org.apache.spark.sql.types.StructType(header.map(h =>
      org.apache.spark.sql.types.StructField(h, org.apache.spark.sql.types.StringType)))
    val df = spark.createDataFrame(rowObjs, schema)
    // cast the loc columns if present
    Seq(Start, End).foldLeft(df)((d, c) =>
      if (d.columns.contains(c)) d.withColumn(c, col(c).cast("long")) else d)
  }

  /** Persist an interval table BUCKETED on its group keys (sorted by
    * (keys, Start) within each bucket) into the session catalog. A
    * bucketed table's scan reports `HashPartitioning(keys)`, which
    * satisfies every `ClusteredDistribution` whose clustering contains
    * the keys — so downstream joins on (keys, bin) AND the custom sweep
    * operator (clustered on keys) elide their exchanges entirely: two
    * pre-bucketed tables interval-join with ZERO shuffle (sorts only;
    * the sweep's (keys, Start) sort matches the bucket sort order). The
    * 100 TB pattern: bucket the reused annotation/reads tables once at
    * ingest, pay no repartitioning per query after that. Both sides
    * must use the same `buckets` count; for the BINNED join (keys +
    * derived bin column — a superset of the bucket keys) also set
    * `spark.sql.requireAllClusterKeysForCoPartition=false` (Spark >=3.3
    * gates subset-key co-partitioning off by default; it is correct
    * here because equal bucket counts already co-locate every
    * (keys, bin) pair). The sweep operator clusters on exactly the
    * bucket keys and needs no conf. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int = 32): Unit =
    // pre-repartition on the SAME hash the bucketer uses, so each task
    // holds exactly one bucket and writes ONE file per bucket — then
    // opting in to spark.sql.legacy.bucketedTableScan.outputOrdering
    // (sound ONLY with single-file buckets, which this writer
    // guarantees) lets the scan report the (keys, Start) order and the
    // downstream Sorts vanish too: a sweep join of two such tables
    // plans with zero exchanges AND zero sorts
    df.repartition(buckets, keys.map(col): _*)
      .write.format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, (keys.tail :+ Start): _*)
      .mode("overwrite")
      .saveAsTable(table)

  /** Deterministic "random" intervals from a chromSizes table
    * (Chromosome, size): n intervals of `length`, positions md5-derived
    * from the row index (reproducible across engines/runs, unlike
    * rand(seed) which depends on partitioning). */
  def random(spark: SparkSession, chromSizes: DataFrame, n: Long,
             length: Long = 100): DataFrame = {
    val nChrom = chromSizes.count()
    val ids = spark.range(n)
    ids.withColumn("_h", conv(substring(md5(col("id").cast("string")), 1, 12), 16, 10).cast("long"))
      .withColumn("_ci", pmod(col("_h"), lit(nChrom)))
      .join(broadcast(chromSizes.withColumn("_ci",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(Cols.Chrom)).cast("long") - 1)), Seq("_ci"))
      .withColumn(Start, pmod(floor(col("_h") / nChrom).cast("long"), col("size") - length))
      .withColumn(End, col(Start) + length)
      .select(col("id").as(RowId), col(Chrom), col(Start), col(End))
  }

  /** Typed empty frame with the genomic schema contract. */
  def empty(spark: SparkSession, withStrand: Boolean = true): DataFrame = {
    import org.apache.spark.sql.types._
    val fields = Seq(StructField(Chrom, StringType), StructField(Start, LongType),
      StructField(End, LongType)) ++
      (if (withStrand) Seq(StructField(Strand, StringType)) else Nil)
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(fields))
  }
}
