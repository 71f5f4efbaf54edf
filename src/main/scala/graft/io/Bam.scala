package graft.io

import graft.core.Cols
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BAM ingestion (reference readers.py:149-240 `read_bam`).
  *
  * `readBam` decodes the binary container natively (BGZF + record
  * layout, see below) — no pre-conversion step. The TSV/parquet
  * surfaces remain as the repeated-read scale path: BAM is a
  * single-threaded-decode format, so at cluster scale the standard
  * pipeline decodes once to parquet (partitioned by Chromosome) and
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

  /** NATIVE binary BAM reader (round-3): no samtools pre-conversion
    * needed. BGZF is a series of standard gzip members, which
    * `java.util.zip.GZIPInputStream` decodes natively (it consumes
    * concatenated members, and BGZF's EOF marker is just an empty
    * member); the record layout is the public SAM/BAM spec (magic
    * "BAM\1", refs dictionary, then little-endian records). End
    * coordinates walk the CIGAR (M/D/N/=/X consume reference), matching
    * the reference's bamread semantics (readers.py:149-240).
    *
    * Scale shape: BAM is inherently single-threaded-decode per file, so
    * the file LIST parallelizes (one task per .bam, records stream —
    * nothing buffers a whole file) and everything downstream is columnar.
    * For peta-scale reuse, decode once and persist parquet
    * (readBamParquet); this reader is the ingest edge.
    * Validated against goldens decoded from the reference's own
    * smaller.bam / test_sorted.bam by an independent parser
    * (fixtures: smaller/test_sorted _bam_golden.tsv), whose head rows match the reference's
    * read_bam doctest (readers.py:195-210). */
  def readBam(spark: SparkSession, path: String, mapq: Int = 0,
              requiredFlag: Int = 0, filterFlag: Int = 1540,
              sparse: Boolean = true): DataFrame = {
    // list through the Hadoop FileSystem API so directory inputs work
    // on any scheme (file://, hdfs://, s3a://), not just local paths
    val p = new org.apache.hadoop.fs.Path(path)
    val hfs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val files: Seq[String] =
      if (hfs.getFileStatus(p).isDirectory)
        hfs.listStatus(p)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".bam"))
          .map(_.getPath.toString).sorted.toSeq
      else Seq(path)
    // executors open through the SESSION's Hadoop conf (spark.hadoop.*
    // overrides travel — credentials, endpoints), serialized alongside
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val rdd = spark.sparkContext.parallelize(files, files.size)
      .flatMap(f => parseBamRecords(f, conf.value))
    val df = spark.createDataFrame(rdd, fullSchema)
    filterReads(df, mapq, requiredFlag, filterFlag, sparse)
  }

  private val seqCode = "=ACMGRSVTWYHKDBN".toCharArray
  private val cigarOp = "MIDNSHP=X".toCharArray

  /** Stream one BAM file's alignment records (executor-side). */
  def parseBamRecords(path: String,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Iterator[org.apache.spark.sql.Row] = {
    import java.io.{BufferedInputStream, DataInputStream, EOFException}
    // executor-side open through the Hadoop FileSystem API (the stream
    // is consumed sequentially, so any scheme works)
    val hp = new org.apache.hadoop.fs.Path(path)
    val raw = hp.getFileSystem(conf).open(hp)
    val in = new DataInputStream(new BufferedInputStream(
      new java.util.zip.GZIPInputStream(
        new BufferedInputStream(raw, 1 << 16), 1 << 16), 1 << 16))
    def readLE(n: Int): java.nio.ByteBuffer = {
      val b = new Array[Byte](n)
      in.readFully(b)
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    }
    val magic = new Array[Byte](4)
    in.readFully(magic)
    require(magic.sameElements("BAM".getBytes("ISO-8859-1")),
      s"$path: not a BAM (bad magic)")
    val lText = readLE(4).getInt
    in.skipBytes(lText)
    val nRef = readLE(4).getInt
    val refs = new Array[String](nRef)
    var i = 0
    while (i < nRef) {
      val lName = readLE(4).getInt
      val nb = new Array[Byte](lName)
      in.readFully(nb)
      refs(i) = new String(nb, 0, lName - 1, "ISO-8859-1") // strip NUL
      in.skipBytes(4) // l_ref
      i += 1
    }
    new Iterator[org.apache.spark.sql.Row] {
      private var nextRow: org.apache.spark.sql.Row = _
      private var done = false
      private def advance(): Unit = {
        val blockSize =
          try readLE(4).getInt
          catch { case _: EOFException => done = true; in.close(); return }
        val rec = readLE(blockSize)
        val refID = rec.getInt
        val pos = rec.getInt
        val lReadName = rec.get & 0xff
        val mapq = rec.get & 0xff
        rec.getShort // bin
        val nCigar = rec.getShort & 0xffff
        val flag = rec.getShort & 0xffff
        val lSeq = rec.getInt
        rec.getInt; rec.getInt; rec.getInt // next_refID, next_pos, tlen
        val nameB = new Array[Byte](lReadName)
        rec.get(nameB)
        val name = new String(nameB, 0, lReadName - 1, "ISO-8859-1")
        var end = pos.toLong
        val cig = new StringBuilder
        var c = 0
        while (c < nCigar) {
          val v = rec.getInt
          val opLen = v >>> 4
          val op = v & 0xf
          cig.append(opLen).append(cigarOp(op))
          // M, D, N, =, X consume reference
          if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8) end += opLen
          c += 1
        }
        val seqB = new Array[Byte]((lSeq + 1) / 2)
        rec.get(seqB)
        val seq = new Array[Char](lSeq)
        var s = 0
        while (s < lSeq) {
          val b = seqB(s / 2) & 0xff
          seq(s) = seqCode(if (s % 2 == 0) b >>> 4 else b & 0xf)
          s += 1
        }
        // qual + tags: rest of the record, not surfaced (reference parity)
        nextRow = org.apache.spark.sql.Row(
          if (refID >= 0) refs(refID) else "*", pos.toLong, end,
          if ((flag & 16) != 0) "-" else "+", flag, mapq, name,
          if (nCigar > 0) cig.toString else "*", if (lSeq > 0) new String(seq) else "*")
      }
      advance()
      override def hasNext: Boolean = !done
      override def next(): org.apache.spark.sql.Row = {
        val r = nextRow; advance(); r
      }
    }
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
