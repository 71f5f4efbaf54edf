package graft.io

import graft.core.Cols
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** NATIVE bigWig codec (round-3): read and write the binary .bw container
  * directly — no bigWigToBedGraph pre-conversion step. Implements the
  * public format (Kent et al., "BigWig and BigBed", Bioinformatics 2010,
  * supplementary spec): 64-byte little-endian header, chromosome B+ tree,
  * zlib-compressed wig data sections (bedGraph/varStep/fixedStep), R-tree
  * block index, total summary. Reference surface: readers.py:452-533
  * (`read_bigwig` -> (Chromosome, Start, End, Value) value runs) and
  * core/pyranges_main.py:3994+ (`to_bigwig`).
  *
  * Scale shape — the part that matters at 100 TB:
  *  - READ: unlike BAM (one gzip stream), bigWig blocks are independently
  *    compressed and indexed; the driver reads only the tiny header +
  *    B+ tree + R-tree (KBs), then the (offset,size) block list is
  *    parallelized so every executor seeks/inflates its own slice of the
  *    file. A multi-GB .bw scans with full cluster parallelism.
  *  - WRITE: a .bw is one indexed binary file, so final assembly is
  *    driver-side — but the expensive part (sorting runs into sections
  *    and zlib-compressing each) runs on the executors: sections are
  *    keyed by per-chromosome row rank, compressed in parallel, and the
  *    driver only concatenates the already-compressed blocks (collected
  *    bytes are the compressed payload, strictly smaller than the data)
  *    and writes the KB-scale trees around them.
  *
  * Validated against an independent stdlib decoder (scripts/
  * bigwig_golden.py -> fixtures/bigwig_bw_golden.tsv) on the reference's
  * own data/bigwig.bw, whose rows equal the read_bigwig doctest
  * (readers.py:471-482).
  */
object BigWig {
  import Cols._

  private val BigWigMagic = 0x888FFC26
  private val ChromTreeMagic = 0x78CA8C91
  private val RTreeMagic = 0x2468ACE0

  private def leBuf(bytes: Array[Byte]): java.nio.ByteBuffer =
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)

  /** Write an R-tree (root + one leaf level; blockSize = ceil(sqrt(n))
    * keeps two levels sufficient for any leaf count a u16 node can
    * index) over `leaves` = (startChromIx, startBase, endChromIx,
    * endBase, offset, size) at the current file position; returns the
    * index offset. Shared by the data index and every zoom level. */
  private def writeRTree(out: java.io.RandomAccessFile,
                         leaves: Seq[(Int, Long, Int, Long, Long, Long)],
                         itemsPerSlot: Int): Long = {
    val indexOff = out.getFilePointer
    val n = leaves.size
    val blockSize = math.max(256, math.ceil(math.sqrt(math.max(n, 1))).toInt)
    val groups = leaves.grouped(blockSize).toArray
    val rtHead = leBuf(new Array[Byte](48))
    val (sCx, sB, eCx, eB) =
      if (n == 0) (0, 0L, 0, 0L)
      else (leaves.head._1, leaves.head._2, leaves.last._3, leaves.map(_._4).max)
    rtHead.putInt(RTreeMagic).putInt(blockSize).putLong(n.toLong)
      .putInt(sCx).putInt(sB.toInt).putInt(eCx).putInt(eB.toInt)
      .putLong(indexOff).putInt(itemsPerSlot).putInt(0)
    out.write(rtHead.array())
    if (groups.length <= 1) {
      val node = leBuf(new Array[Byte](4 + 32 * n))
      node.put(1.toByte).put(0.toByte).putShort(n.toShort)
      leaves.foreach { case (sc, sb, ec, eb, off, size) =>
        node.putInt(sc).putInt(sb.toInt).putInt(ec).putInt(eb.toInt)
          .putLong(off).putLong(size)
      }
      out.write(node.array())
    } else {
      val rootBytes = 4 + 24 * groups.length
      val rootOff = out.getFilePointer
      var leafOff = rootOff + rootBytes
      val root = leBuf(new Array[Byte](rootBytes))
      root.put(0.toByte).put(0.toByte).putShort(groups.length.toShort)
      groups.foreach { g =>
        root.putInt(g.head._1).putInt(g.head._2.toInt)
          .putInt(g.last._3).putInt(g.map(_._4).max.toInt).putLong(leafOff)
        leafOff += 4 + 32 * g.size
      }
      out.write(root.array())
      groups.foreach { g =>
        val node = leBuf(new Array[Byte](4 + 32 * g.size))
        node.put(1.toByte).put(0.toByte).putShort(g.size.toShort)
        g.foreach { case (sc, sb, ec, eb, off, size) =>
          node.putInt(sc).putInt(sb.toInt).putInt(ec).putInt(eb.toInt)
            .putLong(off).putLong(size)
        }
        out.write(node.array())
      }
    }
    indexOff
  }

  /** Positioned reader over the Hadoop FileSystem API, so the bigWig
    * READ path works on any scheme (file://, hdfs://, s3a://) — the
    * java.io.RandomAccessFile it replaces only spoke local paths.
    * FSDataInputStream's positioned readFully is thread-safe and
    * seek-free, which also suits the executor-side block fetches. */
  private final class SeekIn(path: String,
      conf: org.apache.hadoop.conf.Configuration) {
    private val p = new org.apache.hadoop.fs.Path(path)
    private val in = p.getFileSystem(conf).open(p)
    def readFully(off: Long, buf: Array[Byte]): Unit = in.readFully(off, buf)
    def close(): Unit = in.close()
  }

  private def readAt(raf: SeekIn, off: Long, n: Int): java.nio.ByteBuffer = {
    val b = new Array[Byte](n)
    raf.readFully(off, b)
    leBuf(b)
  }

  /** Driver-side index scan: chrom dictionary + R-tree leaf block list. */
  private def readIndex(path: String,
      conf: org.apache.hadoop.conf.Configuration): (Map[Int, String], Boolean, Seq[(Long, Long)]) = {
    val raf = new SeekIn(path, conf)
    try {
      val h = readAt(raf, 0, 64)
      require(h.getInt == BigWigMagic, s"$path: not a bigWig (bad magic)")
      h.getShort; h.getShort // version, zoomLevels
      val chromTreeOff = h.getLong
      h.getLong // fullDataOffset
      val fullIndexOff = h.getLong
      h.getShort; h.getShort; h.getLong; h.getLong
      val compressed = h.getInt > 0 // uncompressBufSize

      val ct = readAt(raf, chromTreeOff, 32)
      require(ct.getInt == ChromTreeMagic, s"$path: bad chrom B+ tree")
      ct.getInt // blockSize
      val keySize = ct.getInt
      val chroms = Map.newBuilder[Int, String]
      def walkChrom(off: Long): Unit = {
        val head = readAt(raf, off, 4)
        val isLeaf = head.get() != 0
        head.get()
        val n = head.getShort & 0xffff
        val itemSize = keySize + 8
        val body = readAt(raf, off + 4, n * itemSize)
        var i = 0
        while (i < n) {
          val key = new Array[Byte](keySize)
          body.get(key)
          val name = new String(key.takeWhile(_ != 0), "ISO-8859-1")
          if (isLeaf) {
            val cid = body.getInt
            body.getInt // chromSize
            chroms += cid -> name
          } else {
            val child = body.getLong
            val save = body.position()
            walkChrom(child)
            body.position(save)
          }
          i += 1
        }
      }
      walkChrom(chromTreeOff + 32)

      val rt = readAt(raf, fullIndexOff, 48)
      require(rt.getInt == RTreeMagic, s"$path: bad R-tree")
      val blocks = Seq.newBuilder[(Long, Long)]
      def walkRTree(off: Long): Unit = {
        val head = readAt(raf, off, 4)
        val isLeaf = head.get() != 0
        head.get()
        val n = head.getShort & 0xffff
        val body = readAt(raf, off + 4, n * (if (isLeaf) 32 else 24))
        var i = 0
        while (i < n) {
          body.getInt; body.getInt; body.getInt; body.getInt // bounds
          if (isLeaf) blocks += ((body.getLong, body.getLong))
          else {
            val child = body.getLong
            val save = body.position()
            walkRTree(child)
            body.position(save)
          }
          i += 1
        }
      }
      walkRTree(fullIndexOff + 48)
      (chroms.result(), compressed, blocks.result())
    } finally raf.close()
  }

  private def inflate(in: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(in)
    val out = new java.io.ByteArrayOutputStream(in.length * 4)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) throw new java.io.IOException("truncated zlib section")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** One wig data section -> value-run rows. */
  private def parseSection(raw: Array[Byte], chroms: Map[Int, String]): Iterator[Row] = {
    val b = leBuf(raw)
    val cid = b.getInt
    val cstart = b.getInt
    b.getInt // chromEnd
    val step = b.getInt
    val span = b.getInt
    val secType = b.get()
    b.get()
    val n = b.getShort & 0xffff
    val chrom = chroms(cid)
    (0 until n).iterator.map { i =>
      secType match {
        case 1 => // bedGraph: start, end, value
          val s = b.getInt.toLong; val e = b.getInt.toLong
          Row(chrom, s, e, b.getFloat.toDouble)
        case 2 => // varStep: start, value (end = start + span)
          val s = b.getInt.toLong
          Row(chrom, s, s + span, b.getFloat.toDouble)
        case _ => // fixedStep: value only
          val s = cstart.toLong + i.toLong * step
          Row(chrom, s, s + span, b.getFloat.toDouble)
      }
    }
  }

  /** read_bigwig: value runs as (Chromosome, Start, End, Value), decoded
    * natively. Block decompression is distributed: one partition per
    * slice of the R-tree leaf list. */
  def readBigwig(spark: SparkSession, path: String): DataFrame = {
    // executors reopen through the SESSION's Hadoop conf (spark.hadoop.*
    // overrides travel — credentials, endpoints), serialized alongside
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val (chroms, compressed, blocks) = readIndex(path, conf.value)
    val chromsB = spark.sparkContext.broadcast(chroms)
    val slices = math.max(1, math.min(blocks.size,
      spark.sparkContext.defaultParallelism * 4))
    val rdd = spark.sparkContext.parallelize(blocks, slices).mapPartitions { it =>
      val mine = it.toArray.sortBy(_._1)
      if (mine.isEmpty) Iterator.empty
      else {
        val raf = new SeekIn(path, conf.value)
        val rows = mine.iterator.flatMap { case (off, size) =>
          val raw = new Array[Byte](size.toInt)
          raf.readFully(off, raw)
          parseSection(if (compressed) inflate(raw) else raw, chromsB.value)
        }
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = rows.hasNext
            if (!h) raf.close()
            h
          }
          override def next(): Row = rows.next()
        }
      }
    }
    spark.createDataFrame(rdd, Bam.bigwigSchema)
  }

  /** to_bigwig: write (Chromosome, Start, End, Value) runs as a real .bw
    * file — bedGraph-type zlib sections, chrom B+ tree, R-tree index,
    * total summary (zoom levels 0: readers that need zooms rebuild them;
    * the interval payload is complete). Sections are compressed on the
    * executors; the input is persisted across the two passes (chrom
    * dictionary, then sections) so upstream plans run once. chromSizes
    * defaults to each chromosome's max End.
    *
    * The WRITE side targets a LOCAL path: the bigWig layout needs
    * seekable writes (the R-tree and header back-patch offsets), which
    * object stores and HDFS streams cannot express — standard practice
    * (kentUtils included) is to write locally and upload. The READ
    * side is scheme-agnostic via the Hadoop FileSystem API. */
  def writeBigwig(df: DataFrame, path: String,
                  chromSizes: Map[String, Long] = Map.empty,
                  valueCol: String = "Value",
                  itemsPerSlot: Int = 512): Unit = {
    val typed = df.select(col(Chrom).cast("string").as(Chrom),
      col(Start).cast("long").as(Start), col(End).cast("long").as(End),
      col(valueCol).cast("double").as("_v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Everything below touches Spark jobs and the output file; the
    // try/finally guarantees the file handle closes, the persisted
    // input unpersists, and a partial .bw is deleted if any Spark
    // stage (or a header require) fails mid-write.
    var out: java.io.RandomAccessFile = null
    var ok = false
    var secAgg: DataFrame = null
    // stage marks (GRAFT_BW_DEBUG=1): the write is a driver-paced
    // multi-job pipeline, so wall attribution needs in-situ marks —
    // the GRAFT_CC_DEBUG pattern
    val dbg = sys.env.contains("GRAFT_BW_DEBUG")
    var tMark = System.nanoTime()
    def mark(what: String): Unit = if (dbg) {
      val now = System.nanoTime()
      System.err.println(f"[bw] $what: ${(now - tMark) / 1e9}%.2fs")
      tMark = now
    }
    try {
      // ONE pass over the input for header + sections (round-18,
      // VERDICT r17 item #5, §2.4 share one computation): the per-chrom
      // max(End) the header needs used to be its own full aggregation
      // pass over the persisted input (1.8 s steady at bench, a whole
      // extra cache read at 100 TB); now the section run-table — the
      // window + per-(chrom, section) aggregate that the drain below
      // needs anyway — is built FIRST, carries a per-section max(End)
      // rider (a long column; no float aggregation is reordered, so
      // bytes are identical), and is persisted, and the header's
      // maxEnds reduce over the ~rows/512 section rows instead of the
      // corpus. The drain reuses the persisted run table, so the
      // window/aggregate never re-runs; the run table unpersists right
      // after the drain, before the zoom pass touches the input again.
      val wSec = org.apache.spark.sql.expressions.Window
        .partitionBy(col(Chrom)).orderBy(col(Start), col(End))
      secAgg = typed
        .withColumn("_sec",
          floor((row_number().over(wSec) - 1) / itemsPerSlot.toDouble).cast("long"))
        .groupBy(col(Chrom), col("_sec"))
        .agg(sort_array(collect_list(struct(col(Start), col(End), col("_v")))).as("_items"),
          sum(col(End) - col(Start)).as("_nb"), min(col("_v")).as("_mn"),
          max(col("_v")).as("_mx"),
          sum(col("_v") * (col(End) - col(Start))).as("_sd"),
          sum(col("_v") * col("_v") * (col(End) - col(Start))).as("_sq"),
          max(col(End)).as("_semax"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val maxEnds = secAgg.groupBy(col(Chrom))
        .agg(max(col("_semax")).cast("long"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      mark("secAgg+maxEnds collect")
      val names = maxEnds.keys.toSeq.sortBy(n => graft.expr.ExprKernels
        .natsortKey(org.apache.spark.unsafe.types.UTF8String.fromString(n)).toString)
      val sizes = names.map(c => chromSizes.getOrElse(c, maxEnds(c)))
      require(sizes.forall(_ <= 0xffffffffL), "bigWig chrom sizes are u32")
      // a declared size smaller than the data would clamp zoom buckets
      // below interval ends: _ov goes negative and every zoom record's
      // validCount/sumData/sumSquares silently corrupts (the unzoomed
      // sections meanwhile write the out-of-range intervals unclamped)
      chromSizes.foreach { case (c, declared) =>
        maxEnds.get(c).foreach(me => require(me <= declared,
          s"declared chromSize for '$c' ($declared) < max interval End ($me)"))
      }

      // zoom reduction levels: x4 apart from a 64-base floor, while the
      // reduction still subdivides the largest chromosome; up to 6
      // levels (a display client zooms out in ~4x steps)
      val maxSpan = sizes.maxOption.getOrElse(0L)
      val zoomReds = Iterator.iterate(64L)(_ * 4)
        .takeWhile(_ < maxSpan).take(6).toSeq

      out = new java.io.RandomAccessFile(path, "rw")
      out.setLength(0)
      // header + per-level zoom headers + total summary, backpatched below
      val headerBytes = new Array[Byte](64 + 24 * zoomReds.size + 40)
      out.write(headerBytes)

      // ---- chrom B+ tree (single leaf node) ----
      val chromTreeOff = out.getFilePointer
      val keySize = math.max(1, names.map(_.length).maxOption.getOrElse(1))
      require(names.size <= 0xffff, "chrom B+ tree: >65535 chromosomes needs multi-node layout")
      val ctHead = leBuf(new Array[Byte](32 + 4))
      ctHead.putInt(ChromTreeMagic).putInt(math.max(names.size, 1)).putInt(keySize)
        .putInt(8).putLong(names.size.toLong).putLong(0L)
      ctHead.put(1.toByte).put(0.toByte).putShort(names.size.toShort)
      out.write(ctHead.array())
      names.zip(sizes).zipWithIndex.foreach { case ((name, size), id) =>
        val item = leBuf(new Array[Byte](keySize + 8))
        val kb = name.getBytes("ISO-8859-1")
        item.put(kb).position(keySize)
        item.putInt(id).putInt(size.toInt)
        out.write(item.array())
      }

      // ---- data sections (compressed on the EXECUTORS, assembled here) ----
      val fullDataOff = out.getFilePointer
      out.write(new Array[Byte](8)) // u64 sectionCount, backpatched
      // R-tree leaf records: (startChromIx, startBase, endChromIx, endBase, off, size)
      val leaves = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Int, Long, Long, Long)]

      val spark = df.sparkSession

      // sections = consecutive itemsPerSlot runs per chromosome, never
      // spanning chromosomes: per-chrom rank / itemsPerSlot is the section
      // key, each section zlib-compressed where its rows live. The
      // total-summary stats ride the SAME aggregate as per-section
      // partials (reduced over the ~1-per-512-rows section list below), so
      // the run table is evaluated exactly once.
      val compressSection = udf { (cid: Int, items: Seq[Row]) =>
        // section bound is max(End), NOT the last item's End: items are sorted
        // by (Start, End), so with overlapping input an earlier long interval
        // can extend past the last item — an external R-tree range query
        // would miss it if the leaf bound understated
        val maxEnd = items.iterator.map(_.getLong(1)).max
        val raw = leBuf(new Array[Byte](24 + 12 * items.size))
        raw.putInt(cid).putInt(items.head.getLong(0).toInt)
          .putInt(maxEnd.toInt)
          .putInt(0).putInt(0).put(1.toByte).put(0.toByte).putShort(items.size.toShort)
        items.foreach { r =>
          val (s, e) = (r.getLong(0), r.getLong(1))
          require(e <= 0xffffffffL, s"bigWig coordinates are u32: $s-$e")
          raw.putInt(s.toInt).putInt(e.toInt).putFloat(r.getDouble(2).toFloat)
        }
        val defl = new java.util.zip.Deflater()
        defl.setInput(raw.array())
        defl.finish()
        val zbuf = new Array[Byte](raw.array().length + 64)
        val zlen = defl.deflate(zbuf)
        require(defl.finished(), "section deflate did not fit scratch buffer")
        defl.end()
        (java.util.Arrays.copyOf(zbuf, zlen), items.head.getLong(0), maxEnd)
      }
      val cidDf = spark.createDataFrame(names.zipWithIndex.map { case (n, i) =>
        (n, i) }).toDF(Chrom, "_cid")
      val sections = secAgg
        .join(broadcast(cidDf), Seq(Chrom))
        .select(col("_cid"), col("_sec"),
          compressSection(col("_cid"), col("_items")).as("_blk"),
          col("_nb"), col("_mn"), col("_mx"), col("_sd"), col("_sq"))
        // the zoom path's measured lesson applied to the MAIN sections
        // (round-17): toLocalIterator runs one job per post-shuffle
        // partition, and at bench scale those per-job round trips
        // dominated the drain — collapse the final range exchange to ONE
        // partition when the INPUT is small (leaf-bytes gate, the
        // Sizing.fanOutSmallScan threshold: a 256 MB input yields well
        // under a million ~60 B section tuples, trivially one task);
        // large inputs keep the full range-partitioned width. The
        // aggregation/compression stages keep full parallelism either
        // way — only the tiny post-shuffle merge is single-task.
        // The gate reads the same conf as fanOutSmallScan (round-17
        // ADVICE): leafScanBytes underestimates checkpointed/synthetic
        // frames ~14x, and an underestimated BIG input collapsed to one
        // partition would buffer its whole compressed payload on the
        // driver — the conf makes the collapse tunable (and 0 disables
        // it outright, restoring full width) without a code change.
        .repartitionByRange(
          if (graft.core.Sizing.leafScanBytes(df) <=
              org.apache.spark.sql.internal.SQLConf.get
                .getConfString(graft.core.Sizing.FanoutKey,
                  (256L << 20).toString).toLong) 1
          else spark.conf.get("spark.sql.shuffle.partitions", "200").toInt,
          col("_cid"), col("_sec"))
        .sortWithinPartitions(col("_cid"), col("_sec"))
        .toLocalIterator() // stream: driver holds ONE PARTITION's compressed
                           // sections at a time (toLocalIterator runs one job
                           // per partition and buffers that partition), not
                           // the whole file — the range partitioning is
                           // fetched in order, so write order is preserved
                           // with driver memory bounded by the largest
                           // partition (the r3 collect() materialized the
                           // entire payload)
      var nBases = 0L
      var minV = Double.PositiveInfinity
      var maxV = Double.NegativeInfinity
      var sumData = 0.0
      var sumSq = 0.0
      sections.forEachRemaining { r =>
        val cid = r.getInt(0)
        val blk = r.getStruct(2)
        val z = blk.getAs[Array[Byte]](0)
        val off = out.getFilePointer
        out.write(z)
        leaves += ((cid, blk.getLong(1), cid, blk.getLong(2), off, z.length.toLong))
        nBases += r.getLong(3)
        minV = math.min(minV, r.getDouble(4))
        maxV = math.max(maxV, r.getDouble(5))
        sumData += r.getDouble(6)
        sumSq += r.getDouble(7)
      }

      mark("sections drain")
      // free the run table before the zoom pass re-reads the input —
      // at scale the two cached frames together would double storage
      secAgg.unpersist()

      // ---- R-tree index over the data sections ----
      val fullIndexOff = writeRTree(out, leaves.toSeq, itemsPerSlot)
      val n = leaves.size
      mark("main rtree")

      // ---- zoom levels (round-5): per-level fixed-width bucket
      // summaries so external display clients get real multi-resolution
      // data instead of rebuilding it. ALL levels ride ONE Spark
      // pipeline (a per-level pass cost ~8 s on the sf0.1 roundtrip
      // bench): each run cross-joins the 6-row level table, explodes
      // into its buckets at every reduction, and a single shuffle
      // aggregates / sections / compresses everything; orderBy puts the
      // stream in level order so the driver writes levels sequentially,
      // closing each level's R-tree when the next begins. ZoomData
      // record (spec): chromId, chromStart, chromEnd, validCount (u32s)
      // + min/max/sumData/sumSquares (f32s). ----
      val zoomHeaders = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      if (zoomReds.nonEmpty && n > 0) {
        val compressZoom = udf { (cid: Int, items: Seq[Row]) =>
          val raw = leBuf(new Array[Byte](32 * items.size))
          items.foreach { r =>
            raw.putInt(cid).putInt(r.getLong(0).toInt).putInt(r.getLong(1).toInt)
              .putInt(r.getLong(2).toInt)
              .putFloat(r.getDouble(3).toFloat).putFloat(r.getDouble(4).toFloat)
              .putFloat(r.getDouble(5).toFloat).putFloat(r.getDouble(6).toFloat)
          }
          val defl = new java.util.zip.Deflater()
          defl.setInput(raw.array())
          defl.finish()
          val zbuf = new Array[Byte](raw.array().length + 64)
          val zlen = defl.deflate(zbuf)
          require(defl.finished(), "zoom deflate did not fit scratch buffer")
          defl.end()
          (java.util.Arrays.copyOf(zbuf, zlen), items.head.getLong(0),
            items.map(_.getLong(1)).max, items.size)
        }
        val levelsDf = spark.createDataFrame(zoomReds.zipWithIndex).toDF("_red", "_lvl")
        val sizeDf = spark.createDataFrame(names.zip(sizes)).toDF(Chrom, "_csize")
        // runs explode ONLY at the finest reduction (zoomReds always
        // starts at the 64 floor); every coarser level is a 4->1 rollup
        // of the finest buckets — valid/sumData/sumSquares are additive
        // and min/max compose, and finest buckets never straddle a
        // coarser boundary (reductions are aligned powers of 4). The
        // explode fan-out is paid once, not once per level.
        val fine = zoomReds.head
        def fdiv(c: org.apache.spark.sql.Column) =
          floor(c.cast("double") / fine).cast("long") // exact: coords < 2^32
        val lo = fdiv(col(Start))
        val fineBuckets = typed
          .withColumn("_zb", explode(sequence(lo,
            greatest(lo, fdiv(col(End) - 1))))) // clamp: End <= Start explodes to 1 bucket
          .withColumn("_fzs", col("_zb") * fine)
          .join(broadcast(sizeDf), Seq(Chrom))
          .withColumn("_fze", least(col("_fzs") + fine, col("_csize")))
          .withColumn("_ov", least(col(End), col("_fze")) - greatest(col(Start), col("_fzs")))
          .groupBy(col(Chrom), col("_csize"), col("_fzs"), col("_fze"))
          .agg(sum(col("_ov")).as("_valid"), min(col("_v")).as("_mn"),
            max(col("_v")).as("_mx"), sum(col("_v") * col("_ov")).as("_sd"),
            sum(col("_v") * col("_v") * col("_ov")).as("_sq"))
        val zsections = fineBuckets
          .crossJoin(broadcast(levelsDf))
          .withColumn("_zs",
            (floor(col("_fzs").cast("double") / col("_red")).cast("long")) * col("_red"))
          .withColumn("_ze", least(col("_zs") + col("_red"), col("_csize")))
          .groupBy(col("_lvl"), col("_red"), col(Chrom), col("_zs"), col("_ze"))
          .agg(sum(col("_valid")).as("_valid"), min(col("_mn")).as("_mn"),
            max(col("_mx")).as("_mx"), sum(col("_sd")).as("_sd"),
            sum(col("_sq")).as("_sq"))
          // buckets are fixed-width, so the itemsPerSlot sectioning is
          // pure arithmetic (consecutive slot-sized coordinate ranges,
          // <= itemsPerSlot buckets each; sparse ranges just yield
          // smaller sections) — no row_number window, one less
          // shuffle+sort stage
          .withColumn("_sec",
            floor(col("_zs").cast("double") / (col("_red") * itemsPerSlot)).cast("long"))
          .groupBy(col("_lvl"), col(Chrom), col("_sec"))
          .agg(sort_array(collect_list(struct(col("_zs"), col("_ze"), col("_valid"),
            col("_mn"), col("_mx"), col("_sd"), col("_sq")))).as("_items"))
          .join(broadcast(cidDf), Seq(Chrom))
          .select(col("_lvl"), col("_cid"), col("_sec"),
            compressZoom(col("_cid"), col("_items")).as("_blk"))
          // zoom volume is bounded by the coordinate span (known from
          // the chrom sizes, no job needed): below ~4M fine buckets the
          // whole stream fits one range partition, and toLocalIterator
          // then runs ONE job instead of one per shuffle partition (the
          // per-job overhead dominated the write at bench scale); the
          // aggregation/compression stages keep full parallelism either
          // way. Only the tiny post-shuffle merge is single-task.
          .repartitionByRange(
            if (sizes.map(_ / zoomReds.head + 1).sum < (1L << 22)) 1
            else spark.conf.get("spark.sql.shuffle.partitions", "200").toInt,
            col("_lvl"), col("_cid"), col("_sec"))
          .sortWithinPartitions(col("_lvl"), col("_cid"), col("_sec"))
          .toLocalIterator()

        val zleaves = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Int, Long, Long, Long)]
        var curLvl = -1
        var dataOff = 0L
        var zcount = 0L
        def finishLevel(): Unit = if (curLvl >= 0) {
          val indexOff = writeRTree(out, zleaves.toSeq, itemsPerSlot)
          val endOff = out.getFilePointer
          out.seek(dataOff)
          out.write(leBuf(new Array[Byte](4)).putInt(zcount.toInt).array())
          out.seek(endOff)
          zoomHeaders += ((zoomReds(curLvl), dataOff, indexOff))
        }
        zsections.forEachRemaining { r =>
          val lvl = r.getInt(0)
          if (lvl != curLvl) {
            finishLevel()
            curLvl = lvl
            zleaves.clear()
            zcount = 0L
            dataOff = out.getFilePointer
            out.write(new Array[Byte](4)) // u32 zoom record count, backpatched
          }
          val cid = r.getInt(1)
          val blk = r.getStruct(3)
          val z = blk.getAs[Array[Byte]](0)
          val off = out.getFilePointer
          out.write(z)
          zleaves += ((cid, blk.getLong(1), cid, blk.getLong(2), off, z.length.toLong))
          zcount += blk.getInt(3)
        }
        finishLevel()
        // every run emits >= 1 bucket at every level, so a non-empty
        // input fills all zoomReds.size levels
        mark("zoom drain")
        require(zoomHeaders.size == zoomReds.size,
          s"zoom levels written ${zoomHeaders.size} != planned ${zoomReds.size}")
      }

      // ---- backpatch header + zoom headers + summary + section count ----
      val head = leBuf(new Array[Byte](64 + 24 * zoomReds.size + 40))
      head.putInt(BigWigMagic).putShort(4.toShort)
        .putShort(zoomReds.size.toShort)
        .putLong(chromTreeOff).putLong(fullDataOff).putLong(fullIndexOff)
        .putShort(0.toShort).putShort(0.toShort).putLong(0L)
        .putLong(64L + 24L * zoomReds.size) // totalSummaryOffset after zoom headers
        .putInt(math.max(24 + 12 * itemsPerSlot, 32 * itemsPerSlot)) // uncompressBufSize
        .putLong(0L)
      zoomHeaders.foreach { case (red, doff, ioff) =>
        head.putInt(red.toInt).putInt(0).putLong(doff).putLong(ioff)
      }
      head.putLong(nBases)
      if (n == 0) { head.putDouble(0).putDouble(0).putDouble(0).putDouble(0) }
      else head.putDouble(minV).putDouble(maxV).putDouble(sumData).putDouble(sumSq)
      out.seek(0)
      out.write(head.array())
      out.seek(fullDataOff)
      val cnt = leBuf(new Array[Byte](8)).putLong(n.toLong)
      out.write(cnt.array())
      ok = true
    } finally {
      if (out != null) {
        try out.close() catch { case scala.util.control.NonFatal(_) => () }
      }
      typed.unpersist()
      // idempotent (already unpersisted on the success path right
      // after the drain); covers mid-write failures
      if (secAgg != null) secAgg.unpersist()
      if (!ok) new java.io.File(path).delete()
    }
  }
}
