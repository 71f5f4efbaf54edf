package graft

import graft.core.Cols
import graft.io.{Bed, Gtf, TableIO}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** File-format round-trip tests (BED / GTF / GFF3 / from_string),
  * mirroring the reference's reader semantics: 1-based GTF/GFF -> 0-based
  * half-open, attribute grammar incl. quoted ';' (reference
  * readers.py:273-276, README.md:41-49). */
class IoSpec extends AnyFunSuite {
  import Cols._

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("BED read: fixed schema, comment skip; write round-trips") {
    val d = tmp("bed")
    Files.writeString(java.nio.file.Paths.get(s"$d/a.bed"),
      "# a comment\nchr1\t10\t20\tfeat1\t0\t+\nchr2\t5\t9\tfeat2\t3\t-\n")
    val df = Bed.read(spark, s"$d/a.bed")
    assert(df.count() == 2)
    val r = df.orderBy(Start).collect()
    assert(r(1).getString(0) == "chr1" || r(0).getString(0) == "chr2")
    assert(df.filter(col(Chrom) === "chr1").select(Start).head.getLong(0) == 10L)
    assert(df.schema(Start).dataType.typeName == "long")
    // round-trip
    val outDir = s"$d/out"
    Bed.write(df, outDir)
    val back = Bed.read(spark, outDir)
    assert(back.orderBy(Start).collect().map(_.toSeq).toSeq ==
      df.orderBy(Start).collect().map(_.toSeq).toSeq)
  }

  test("GTF read: 1-based -> half-open; quoted ';' in attribute survives") {
    val d = tmp("gtf")
    Files.writeString(java.nio.file.Paths.get(s"$d/a.gtf"),
      "# hdr\n" +
      "chr1\thavana\tgene\t11\t20\t.\t+\t.\tgene_id \"g1\"; note \"semi;colon\"; exon_number 2;\n" +
      "chr1\thavana\texon\t11\t15\t.\t+\t.\tgene_id \"g1\"; transcript_id \"t1\";\n")
    val df = Gtf.readGtf(spark, s"$d/a.gtf",
      attrKeys = Seq("gene_id", "transcript_id", "note", "exon_number"))
    assert(df.count() == 2)
    val gene = df.filter(col("Feature") === "gene").head
    assert(gene.getAs[Long](Start) == 10L && gene.getAs[Long](End) == 20L)
    assert(gene.getAs[String]("gene_id") == "g1")
    assert(gene.getAs[String]("note") == "semi;colon")
    assert(gene.getAs[String]("exon_number") == "2")
    assert(df.filter(col("Feature") === "exon").head.getAs[String]("transcript_id") == "t1")
    // write and re-read
    val outDir = s"$d/out"
    Gtf.writeGtf(df, outDir, Seq("gene_id", "transcript_id", "note"))
    val back = Gtf.readGtf(spark, outDir, Seq("gene_id", "note"))
    assert(back.count() == 2)
    assert(back.filter(col("Feature") === "gene").head.getAs[String]("note") == "semi;colon")
    assert(back.filter(col("Feature") === "gene").head.getAs[Long](Start) == 10L)
  }

  test("GTF attrs: repeated keys keep first occurrence; final attr may lack ';'") {
    val d = tmp("gtfdup")
    Files.writeString(java.nio.file.Paths.get(s"$d/a.gtf"),
      // two `tag` attributes (GENCODE-style) + last attribute unterminated
      "chr1\thavana\texon\t11\t15\t.\t+\t.\t" +
        "gene_id \"g1\"; tag \"basic\"; tag \"CCDS\"; level 2\n")
    val df = Gtf.readGtf(spark, s"$d/a.gtf",
      attrKeys = Seq("gene_id", "tag", "level"))
    val r = df.head
    assert(r.getAs[String]("gene_id") == "g1")
    assert(r.getAs[String]("tag") == "basic")   // first occurrence wins
    assert(r.getAs[String]("level") == "2")     // no trailing ';' needed
  }

  test("BAM surface: mapq/flag filters match read_bam semantics over parquet") {
    import spark.implicits._
    val d = tmp("bam")
    // rows: mapped fwd, mapped rev (16), unmapped (4), duplicate (1024),
    // low mapq
    Seq(
      ("chr1", 100L, 125L, "+", 0, 60, "r1", "25M", "A" * 25),
      ("chr1", 200L, 225L, "-", 16, 60, "r2", "25M", "C" * 25),
      ("chr1", 0L, 0L, "+", 4, 0, "r3", "*", "G" * 25),
      ("chr1", 300L, 325L, "+", 1024, 60, "r4", "25M", "T" * 25),
      ("chr1", 400L, 425L, "+", 0, 5, "r5", "25M", "A" * 25))
      .toDF(Chrom, Start, End, Strand, "Flag", "MapQ", "Name", "Cigar", "QuerySequence")
      .write.parquet(s"$d/reads")
    val sparse = graft.io.Bam.readBamParquet(spark, s"$d/reads")
    // default filter_flag 1540 drops unmapped(4) and duplicate(1024)
    assert(sparse.count() == 3)
    assert(sparse.columns.toSeq ==
      graft.io.Bam.sparseSchema.fieldNames.toSeq)
    val hq = graft.io.Bam.readBamParquet(spark, s"$d/reads", mapq = 30,
      sparse = false)
    assert(hq.count() == 2)
    assert(hq.columns.contains("Cigar"))
    val revOnly = graft.io.Bam.readBamParquet(spark, s"$d/reads",
      requiredFlag = 16)
    assert(revOnly.count() == 1)
  }

  test("BAM recipe TSV: documented samtools column order loads with documented schema") {
    val d = tmp("bamtsv")
    // exactly the README recipe's emitted columns:
    // chrom, start0, end, strand, flag, mapq, name, cigar, seq
    Files.writeString(java.nio.file.Paths.get(s"$d/reads.tsv"),
      "chr1\t99\t124\t+\t0\t60\tr1\t25M\t" + "A" * 25 + "\n" +
      "chr1\t199\t224\t-\t16\t60\tr2\t25M\t" + "C" * 25 + "\n" +
      "chr1\t0\t0\t+\t4\t0\tr3\t*\t" + "G" * 25 + "\n")
    val full = graft.io.Bam.readsFromTsv(spark, s"$d/reads.tsv", sparse = false)
    assert(full.columns.toSeq == graft.io.Bam.fullSchema.fieldNames.toSeq)
    assert(full.schema == graft.io.Bam.fullSchema)
    assert(full.count() == 2) // default filterFlag 1540 drops the unmapped row
    val sparse = graft.io.Bam.readsFromTsv(spark, s"$d/reads.tsv")
    assert(sparse.schema == graft.io.Bam.sparseSchema)
    assert(sparse.filter(col(Strand) === "-").count() == 1)
  }

  test("native BAM reader decodes the reference's real BAM files, matching independent goldens") {
    // goldens decoded by a separate stdlib parser (fixtures/*.tsv, whose
    // head rows equal the reference's read_bam doctest readers.py:195-210)
    def golden(p: String): Seq[(String, Long, Long, String, Int, Int, String, String, String)] =
      scala.io.Source.fromFile(p).getLines().map { l =>
        val f = l.split("\t")
        (f(0), f(1).toLong, f(2).toLong, f(3), f(4).toInt, f(5).toInt, f(6), f(7), f(8))
      }.toSeq
    // no flag/mapq filter: compare the raw decode
    val got = graft.io.Bam.readBam(spark,
        "/root/reference/pyranges1/data/smaller.bam", filterFlag = 0, sparse = false)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getInt(4), r.getInt(5), r.getString(6), r.getString(7), r.getString(8))).toSeq
    assert(got == golden("fixtures/smaller_bam_golden.tsv"))
    // the larger sorted file: 10k records, spot-check count + bounds
    val big = graft.io.Bam.readBam(spark,
      "/root/reference/tests/unit/test_data/test_sorted.bam", filterFlag = 0, sparse = false)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getInt(4), r.getInt(5), r.getString(6), r.getString(7), r.getString(8))).toSeq
    assert(big == golden("fixtures/test_sorted_bam_golden.tsv"))
    // default filters match the pre-converted surface semantics
    val sparse = graft.io.Bam.readBam(spark, "/root/reference/pyranges1/data/smaller.bam")
    assert(sparse.schema == graft.io.Bam.sparseSchema)
    assert(sparse.count() == 100) // doctest: "PyRanges with 100 rows"
  }

  test("native bigWig reader decodes the reference's real bigwig.bw, matching the independent golden") {
    // golden from scripts/bigwig_golden.py (stdlib-only decoder), whose
    // rows equal the reference's read_bigwig doctest (readers.py:471-482)
    val golden = scala.io.Source.fromFile("fixtures/bigwig_bw_golden.tsv")
      .getLines().map { l =>
        val f = l.split("\t")
        (f(0), f(1).toLong, f(2).toLong, f(3).toDouble)
      }.toSet
    val got = graft.io.BigWig.readBigwig(spark,
        "/root/reference/pyranges1/data/bigwig.bw")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == golden)
    assert(got.size == 6) // doctest: "PyRanges with 6 rows"
  }

  test("native bigWig writer round-trips through the real binary format") {
    val d = tmp("bwx")
    import spark.implicits._
    // >1 section per chrom (itemsPerSlot=4) and natsort chrom order
    // (chr2 < chr10); values float32-exact
    val rows = (0 until 37).map(i =>
      (if (i % 3 == 0) "chr10" else "chr2", i * 10L, i * 10L + 7L, (i % 11).toDouble / 4))
    val df = rows.toDF(Chrom, Start, End, "Value")
    graft.io.BigWig.writeBigwig(df, s"$d/out.bw", itemsPerSlot = 4)
    val back = graft.io.BigWig.readBigwig(spark, s"$d/out.bw")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(back == rows.toSet)
    // our independent python decoder agrees (cross-parser check happens
    // in the q86/q87 oracles; here just pin the index invariants)
    val (chroms, compressed, blocks) = {
      val m = graft.io.BigWig.getClass.getDeclaredMethod("readIndex",
        classOf[String], classOf[org.apache.hadoop.conf.Configuration])
      m.setAccessible(true)
      m.invoke(graft.io.BigWig, s"$d/out.bw", spark.sessionState.newHadoopConf())
        .asInstanceOf[(Map[Int, String], Boolean, Seq[(Long, Long)])]
    }
    assert(chroms == Map(0 -> "chr2", 1 -> "chr10")) // natsort ids
    assert(compressed && blocks.size == 10) // ceil(24/4) + ceil(13/4)
  }

  test("native bigWig writer streams >1000 sections per chrom through a two-level R-tree") {
    // pins the toLocalIterator streaming path (vs a regression to
    // collect) at a section count that forces the root+leaf R-tree
    // layout and >1 output partition on the sorted section plan
    val d = tmp("bws")
    import spark.implicits._
    val rows = (0 until 1100).map(i =>
      ("chr7", i * 5L, i * 5L + 3L, (i % 7).toDouble)) ++
      (0 until 50).map(i => ("chr11", i * 9L, i * 9L + 4L, i.toDouble))
    val df = rows.toDF(Chrom, Start, End, "Value").repartition(8)
    graft.io.BigWig.writeBigwig(df, s"$d/big.bw", itemsPerSlot = 1)
    val back = graft.io.BigWig.readBigwig(spark, s"$d/big.bw")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(back == rows.toSet)
    val (chroms, compressed, blocks) = {
      val m = graft.io.BigWig.getClass.getDeclaredMethod("readIndex",
        classOf[String], classOf[org.apache.hadoop.conf.Configuration])
      m.setAccessible(true)
      m.invoke(graft.io.BigWig, s"$d/big.bw", spark.sessionState.newHadoopConf())
        .asInstanceOf[(Map[Int, String], Boolean, Seq[(Long, Long)])]
    }
    assert(compressed && blocks.size == 1150) // one section per row
    assert(chroms.values.toSet == Set("chr7", "chr11"))
  }

  test("bigWig writer deletes the partial file when a stage fails mid-write") {
    // u32-overflow coordinate fires the section UDF's require during the
    // streamed write; the try/finally must close the handle, unpersist,
    // and remove the truncated .bw
    val d = tmp("bwf")
    import spark.implicits._
    val bad = Seq(("chr1", 5L, 0x100000005L, 1.0)).toDF(Chrom, Start, End, "Value")
    intercept[Exception] {
      graft.io.BigWig.writeBigwig(bad, s"$d/bad.bw",
        chromSizes = Map("chr1" -> 1000L))
    }
    assert(!new java.io.File(s"$d/bad.bw").exists)
  }

  test("bigWig writer rejects a declared chromSize smaller than the data") {
    // an undersized declared chromosome would clamp zoom buckets below
    // interval ends and silently corrupt zoom summaries — it must be a
    // loud require (and still clean up the partial file)
    val d = tmp("bwcs")
    import spark.implicits._
    val rows = Seq(("chr1", 0L, 500L, 1.0)).toDF(Chrom, Start, End, "Value")
    val err = intercept[IllegalArgumentException] {
      graft.io.BigWig.writeBigwig(rows, s"$d/small.bw",
        chromSizes = Map("chr1" -> 100L))
    }
    assert(err.getMessage.contains("chromSize"), err.getMessage)
    assert(!new java.io.File(s"$d/small.bw").exists)
    // an ample declared size is fine (and padding past the data is legal)
    graft.io.BigWig.writeBigwig(rows, s"$d/ok.bw", chromSizes = Map("chr1" -> 1000L))
    assert(new java.io.File(s"$d/ok.bw").exists)
  }

  test("bigWig writer emits real zoom levels whose buckets match recomputation") {
    val d = tmp("bwz")
    import spark.implicits._
    // non-overlapping runs over ~1000 coords on two chroms -> reductions 64, 256
    val rows = (0 until 60).map(i =>
      (if (i % 4 == 0) "chr2" else "chr1", i * 16L, i * 16L + 10L, (i % 7 + 1).toDouble))
    rows.toDF(Chrom, Start, End, "Value")
      .write.mode("overwrite").parquet(s"$d/in.parquet") // exercise a real scan
    val df = spark.read.parquet(s"$d/in.parquet")
    graft.io.BigWig.writeBigwig(df, s"$d/z.bw", itemsPerSlot = 4)

    val raf = new java.io.RandomAccessFile(s"$d/z.bw", "r")
    def at(off: Long, n: Int) = {
      val b = new Array[Byte](n); raf.seek(off); raf.readFully(b)
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    }
    try {
      val h = at(0, 64)
      assert(h.getInt == 0x888FFC26)
      h.getShort // version
      val nZoom = h.getShort
      assert(nZoom == 2, s"expected 2 zoom levels, got $nZoom")
      val zh = at(64, 24 * nZoom)
      val levels = (0 until nZoom).map { _ =>
        val red = zh.getInt; zh.getInt
        (red, zh.getLong, zh.getLong)
      }
      assert(levels.map(_._1) == Seq(64, 256))

      // decode and verify EVERY level against an independent
      // recomputation (level 1 is produced by the 4->1 rollup, so this
      // checks the hierarchy, not just the finest pass)
      case class Z(cid: Int, s: Int, e: Int, valid: Int,
                   mn: Float, mx: Float, sd: Float, sq: Float)
      levels.foreach { case (red, dataOff, indexOff) =>
        val count = at(dataOff, 4).getInt
        val blocks = Seq.newBuilder[(Long, Long)]
        def walk(off: Long): Unit = {
          val head = at(off, 4)
          val isLeaf = head.get() != 0; head.get()
          val n = head.getShort & 0xffff
          val body = at(off + 4, n * (if (isLeaf) 32 else 24))
          (0 until n).foreach { _ =>
            body.getInt; body.getInt; body.getInt; body.getInt
            if (isLeaf) blocks += ((body.getLong, body.getLong))
            else { val c = body.getLong; val s = body.position(); walk(c); body.position(s) }
          }
        }
        assert(at(indexOff, 4).getInt == 0x2468ACE0)
        walk(indexOff + 48)
        val recs = blocks.result().flatMap { case (off, size) =>
          val comp = new Array[Byte](size.toInt); raf.seek(off); raf.readFully(comp)
          val inf = new java.util.zip.Inflater(); inf.setInput(comp)
          val buf = new Array[Byte](1 << 16)
          val n = inf.inflate(buf); inf.end()
          val bb = java.nio.ByteBuffer.wrap(buf, 0, n)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          (0 until n / 32).map(_ => Z(bb.getInt, bb.getInt, bb.getInt, bb.getInt,
            bb.getFloat, bb.getFloat, bb.getFloat, bb.getFloat))
        }
        assert(recs.size == count)
        // recompute expected buckets from the input rows (chr1 = cid 0)
        val expected = rows.flatMap { case (c, s, e, v) =>
          (s / red to (e - 1) / red).map { b =>
            val lo = math.max(s, b * red); val hi = math.min(e, (b + 1) * red)
            ((c, b), (hi - lo, v))
          }
        }.groupBy(_._1).map { case ((c, b), xs) =>
          val valid = xs.map(_._2._1).sum
          val vs = xs.map(_._2._2)
          ((if (c == "chr1") 0 else 1, b * red),
            (valid, vs.min.toFloat, vs.max.toFloat,
              xs.map(x => x._2._2 * x._2._1).sum.toFloat))
        }
        assert(recs.size == expected.size, s"red=$red bucket count")
        recs.foreach { z =>
          val (valid, mn, mx, sd) = expected((z.cid, z.s.toLong))
          assert(z.valid == valid && z.mn == mn && z.mx == mx,
            s"red=$red bucket ${(z.cid, z.s)} mismatch")
          assert(math.abs(z.sd - sd) <= math.abs(sd) * 1e-5f + 1e-5f)
          assert(z.e - z.s <= red && z.s % red == 0)
        }
      }
    } finally raf.close()
  }

  test("native bigWig writer: single-row and empty-table edges") {
    val d = tmp("bwe")
    import spark.implicits._
    val one = Seq(("chr1", 5L, 9L, 2.5)).toDF(Chrom, Start, End, "Value")
    graft.io.BigWig.writeBigwig(one, s"$d/one.bw")
    val back = graft.io.BigWig.readBigwig(spark, s"$d/one.bw").collect()
    assert(back.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSeq == Seq(("chr1", 5L, 9L, 2.5)))
    val none = Seq.empty[(String, Long, Long, Double)].toDF(Chrom, Start, End, "Value")
    graft.io.BigWig.writeBigwig(none, s"$d/none.bw")
    assert(graft.io.BigWig.readBigwig(spark, s"$d/none.bw").count() == 0)
  }

  test("bigWig surface: bedGraph pre-conversion round-trips value runs") {
    val d = tmp("bw")
    Files.writeString(java.nio.file.Paths.get(s"$d/a.bedgraph"),
      "1\t0\t1\t0.1\n1\t100\t150\t1.4\n10\t200\t300\t2.0\n")
    val df = graft.io.Bam.readBedGraph(spark, s"$d/a.bedgraph")
    assert(df.count() == 3)
    assert(df.columns.toSeq == Seq(Chrom, Start, End, "Value"))
    assert(df.filter(col(Start) === 100).head.getDouble(3) == 1.4)
  }

  test("readGtfFull discovers all attribute keys from the real Ensembl file") {
    val df = Gtf.readGtfFull(spark, "/root/reference/pyranges1/data/ensembl.gtf")
    assert(df.count() == 12)
    val cols = df.columns.toSet
    assert(Set("gene_id", "gene_name", "transcript_id", "exon_number",
      "gene_biotype", "tag").subsetOf(cols))
    assert(df.filter(col("Feature") === "gene").head
      .getAs[String]("gene_id") == "ENSG00000223972")
    // rows lacking a key get null, not a parse failure
    assert(df.filter(col("Feature") === "gene")
      .head.getAs[String]("transcript_id") == null)
  }

  test("BED gzip read is transparent") {
    val d = tmp("bedgz")
    val content = "chr1\t10\t20\tf\t0\t+\n".getBytes
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$d/a.bed.gz"))
    gz.write(content); gz.close()
    val df = Bed.read(spark, s"$d/a.bed.gz")
    assert(df.count() == 1 && df.head.getLong(1) == 10L)
  }

  test("GFF3 read: k=v attributes") {
    val d = tmp("gff")
    Files.writeString(java.nio.file.Paths.get(s"$d/a.gff3"),
      "chr1\tsrc\tmRNA\t1\t100\t.\t-\t.\tID=m1;Parent=g1\n")
    val df = Gtf.readGff3(spark, s"$d/a.gff3")
    val r = df.head
    assert(r.getAs[Long](Start) == 0L && r.getAs[Long](End) == 100L)
    assert(r.getAs[String]("ID") == "m1" && r.getAs[String]("Parent") == "g1")
  }

  test("fromString parses whitespace tables with typed loc columns") {
    val df = TableIO.fromString(spark,
      """Chromosome Start End Name
        |chr1 5 10 a
        |chr2 0 3 b""".stripMargin)
    assert(df.count() == 2)
    assert(df.schema(Start).dataType.typeName == "long")
    assert(df.filter(col("Name") === "a").head.getAs[Long](End) == 10L)
  }

  test("FASTA read + chunked extraction equals whole-sequence extraction") {
    import graft.ext.Seqs
    val d = tmp("fa")
    Files.writeString(java.nio.file.Paths.get(s"$d/g.fa"),
      ">chrA test description\nACGTACGTAC\nGTACGTACGT\n>chrB\nTTTTCCCCGGGGAAAA\n")
    val fa = graft.io.Fasta.read(spark, s"$d/g.fa")
    assert(fa.count() == 2)
    val seqs = fa.collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(seqs("chrA") == "ACGTACGTACGTACGTACGT" && seqs("chrB").length == 16)

    import spark.implicits._
    val iv = Seq(("chrA", "+", 2L, 9L, 1L), ("chrA", "-", 5L, 15L, 2L),
                 ("chrB", "+", 0L, 16L, 3L), ("chrA", "+", 18L, 20L, 4L))
      .toDF(Chrom, Strand, Start, End, RowId)
    val whole = Seqs.getSequence(iv, fa).select(RowId, "sequence").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    // chunk size 4 forces every interval to span chunks
    val chunks = graft.io.Fasta.readChunked(spark, s"$d/g.fa", chunkSize = 4)
    val chunked = Seqs.getSequenceChunked(iv, chunks).select(RowId, "sequence")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(chunked == whole)
    assert(whole(1L) == "GTACGTA")
  }

  test("Cli pipeline: read_bed | merge_overlaps | write_bed round-trips") {
    val d = tmp("cli")
    Files.writeString(java.nio.file.Paths.get(s"$d/in.bed"),
      "chr1\t1\t5\tx\t0\t+\nchr1\t4\t9\ty\t0\t+\nchr1\t20\t22\tz\t0\t+\n")
    val out = graft.Cli.run(spark,
      s"read_bed $d/in.bed | merge_overlaps slack=0 | write_bed $d/out")
    assert(out.isEmpty)  // writer stage terminates the chain
    val back = Bed.read(spark, s"$d/out", nCols = 3)
    assert(back.select(Start, End).collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 9L), (20L, 22L)))
    // stage errors are loud
    intercept[IllegalArgumentException] {
      graft.Cli.run(spark, "merge_overlaps")
    }
    intercept[IllegalArgumentException] {
      graft.Cli.run(spark, s"read_bed $d/in.bed | frobnicate")
    }
  }

  test("random generates n in-bounds deterministic intervals") {
    import spark.implicits._
    val cs = Seq(("chr1", 1000L), ("chr2", 500L)).toDF(Chrom, "size")
    val r1 = TableIO.random(spark, cs, 50, 10)
    val r2 = TableIO.random(spark, cs, 50, 10)
    assert(r1.count() == 50)
    assert(r1.join(cs, Seq(Chrom)).filter(col(End) > col("size") || col(Start) < 0).count() == 0)
    assert(r1.exceptAll(r2).count() == 0)  // deterministic
  }

  test("readBam on a directory lists .bam files through the Hadoop FS API") {
    // the cluster layout: a directory of per-shard BAMs; listing goes
    // through FileSystem.listStatus (scheme-agnostic), filters non-.bam
    // entries, and unions in sorted order
    val d = tmp("bamdir")
    val src = java.nio.file.Paths.get("/root/reference/pyranges1/data/smaller.bam")
    java.nio.file.Files.copy(src, java.nio.file.Paths.get(s"$d/a.bam"))
    java.nio.file.Files.copy(src, java.nio.file.Paths.get(s"$d/b.bam"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/notes.txt"), "skip me")
    // a SUBDIRECTORY whose name ends in .bam must be skipped too (it
    // would otherwise be opened as a file executor-side and fail
    // mid-job) — the isFile guard, not just the suffix check
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$d/sub.bam"))
    val one = graft.io.Bam.readBam(spark, s"$d/a.bam", filterFlag = 0, sparse = false)
      .collect().map(_.toSeq)
    val both = graft.io.Bam.readBam(spark, d, filterFlag = 0, sparse = false)
      .collect().map(_.toSeq)
    assert(both.length == 2 * one.length && one.nonEmpty)
    assert(both.toSeq.sortBy(_.toString) ==
      (one ++ one).toSeq.sortBy(_.toString))
  }

  test("SerializableHadoopConf carries session overrides through serialization") {
    // the executor-side contract: spark.hadoop.* overrides (credentials,
    // endpoints) must survive into the deserialized conf the BAM/bigWig
    // readers open files with
    val conf = spark.sessionState.newHadoopConf()
    conf.set("graft.test.marker", "travels")
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(new graft.io.SerializableHadoopConf(conf))
    oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[graft.io.SerializableHadoopConf]
    assert(back.value.get("graft.test.marker") == "travels")
    // and a FileSystem opened from it still reads local paths
    val p = new org.apache.hadoop.fs.Path("/tmp")
    assert(p.getFileSystem(back.value).exists(p))
  }
}
