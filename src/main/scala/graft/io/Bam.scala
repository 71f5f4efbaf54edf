package graft.io

import graft.core.Cols
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BAM ingestion (reference readers.py:149-240 `read_bam`).
  *
  * The BAM container itself (BGZF blocks + binary records) has no
  * offline JVM codec in this environment, so the *format decode* is a
  * documented pre-conversion step and the *query surface* — schema,
  * mapq/flag filter semantics, sparse/full column sets — is implemented
  * here 1:1 over parquet. At cluster scale this split is also the right
  * architecture: BAM is a single-threaded-decode format, so the standard
  * pipeline converts once to parquet (partitioned by Chromosome) and
  * every downstream read is a parallel, predicate-pushdown columnar
  * scan rather than a re-decode.
  *
  * Pre-conversion recipe (one-off, any machine with samtools; no
  * proprietary tooling):
  * {{{
  *   samtools view -@8 in.bam | awk -v OFS='\t' '{
  *     flag=$2; strand=and(flag,16)?"-":"+";
  *     print $3, $4-1, $4-1+length($10), strand, flag, $5, $1, $6, $10
  *   }' > reads.tsv
  *   # then load the TSV with readsFromTsv below, or convert with any
  *   # TSV->parquet tool, writing the sparseSchema/fullSchema columns
  * }}}
  * (0-based half-open: BAM's POS is 1-based; length($10) approximates
  * the reference span for non-clipped alignments — a full converter
  * should walk the CIGAR, which samtools/bamread do natively.)
  */
object Bam {
  import Cols._

  /** sparse=true column set (reference doctest :193-210). */
  val sparseSchema: StructType = StructType(Seq(
    StructField(Chrom, StringType), StructField(Start, LongType),
    StructField(End, LongType), StructField(Strand, StringType),
    StructField("Flag", IntegerType)))

  /** sparse=false adds the query-level columns (reference :166-170). */
  val fullSchema: StructType = StructType(sparseSchema.fields ++ Seq(
    StructField("MapQ", IntegerType), StructField("Name", StringType),
    StructField("Cigar", StringType), StructField("QuerySequence", StringType)))

  /** read_bam over pre-converted parquet: mapq / required_flag /
    * filter_flag semantics exactly as the reference (default 1540 =
    * unmapped | QC-fail | duplicate). Flag predicates are bitwise
    * column expressions — pushed into the scan where the source
    * supports it, codegen'd otherwise. */
  def readBamParquet(spark: SparkSession, path: String, mapq: Int = 0,
                     requiredFlag: Int = 0, filterFlag: Int = 1540,
                     sparse: Boolean = true): DataFrame = {
    val df = spark.read.parquet(path)
    filterReads(df, mapq, requiredFlag, filterFlag, sparse)
  }

  /** The TSV emitted by the samtools recipe above. */
  def readsFromTsv(spark: SparkSession, path: String, mapq: Int = 0,
                   requiredFlag: Int = 0, filterFlag: Int = 1540,
                   sparse: Boolean = true): DataFrame = {
    val tsvSchema = StructType(Seq(
      StructField(Chrom, StringType), StructField(Start, LongType),
      StructField(End, LongType), StructField(Strand, StringType),
      StructField("Flag", IntegerType), StructField("MapQ", IntegerType),
      StructField("Name", StringType), StructField("Cigar", StringType),
      StructField("QuerySequence", StringType)))
    val df = spark.read.option("delimiter", "\t").schema(tsvSchema).csv(path)
    filterReads(df, mapq, requiredFlag, filterFlag, sparse)
  }

  /** read_bigwig surface (reference readers.py:452-533): value runs as
    * (Chromosome, Start, End, Value). Like BAM, the .bw container needs
    * a native codec — pre-convert once (`bigWigToBedGraph in.bw out.bg`,
    * UCSC tools) and load the bedGraph/parquet; Coverage.toBigwigRanges
    * produces the same shape for writing. */
  val bigwigSchema: StructType = StructType(Seq(
    StructField(Chrom, StringType), StructField(Start, LongType),
    StructField(End, LongType), StructField("Value", DoubleType)))

  def readBigwigParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(bigwigSchema.fieldNames.map(col): _*)

  /** bedGraph emitted by bigWigToBedGraph. */
  def readBedGraph(spark: SparkSession, path: String): DataFrame =
    spark.read.option("delimiter", "\t").option("comment", "#")
      .schema(bigwigSchema).csv(path)

  /** mapq/flag filter + column projection shared by both sources. */
  def filterReads(df: DataFrame, mapq: Int, requiredFlag: Int,
                  filterFlag: Int, sparse: Boolean): DataFrame = {
    val mapqOk =
      if (mapq > 0 && df.columns.contains("MapQ")) col("MapQ") >= mapq else lit(true)
    val reqOk =
      if (requiredFlag != 0) col("Flag").bitwiseAND(lit(requiredFlag)) === requiredFlag
      else lit(true)
    val filtOk =
      if (filterFlag != 0) col("Flag").bitwiseAND(lit(filterFlag)) === 0
      else lit(true)
    val filtered = df.filter(mapqOk && reqOk && filtOk)
    if (sparse)
      filtered.select(sparseSchema.fieldNames.filter(df.columns.contains).map(col): _*)
    else filtered
  }
}
