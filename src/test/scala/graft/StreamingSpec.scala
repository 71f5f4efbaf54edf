package graft

import graft.core.Cols
import graft.ml.Multimodal
import graft.streaming.StreamingOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Structured-Streaming interval ops + multimodal plumbing. */
class StreamingSpec extends AnyFunSuite {
  import Cols._

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    // tsNanos' NTZ->timestamp cast must see UTC regardless of host tz
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streamingMerge folds a start-sorted stream into islands incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamingOps.InInterval]
    val q = StreamingOps.streamingMerge(in.toDS())
      .writeStream.format("memory").queryName("islands")
      .outputMode("append").start()
    // batch 1: two overlapping + one far -> first island closable later
    in.addData(StreamingOps.InInterval("c", 1, 5), StreamingOps.InInterval("c", 4, 9))
    q.processAllAvailable()
    assert(spark.table("islands").count() == 0)  // island still open
    in.addData(StreamingOps.InInterval("c", 50, 60))  // beyond -> closes [1,9)
    q.processAllAvailable()
    val closed = spark.table("islands").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(closed.toSet == Set(("c", 1L, 9L, 2L)))
    q.stop()
  }

  test("checkpoint restart: file-sink resume is exactly-once across two runs") {
    // every other streaming test is one uninterrupted pass; production
    // streams RESTART, and exactly-once across a restart rests on the
    // offset log + file-sink commit log in the checkpoint. Two
    // sequential AvailableNow runs share one checkpoint; files added
    // in between must be processed exactly once and earlier files not
    // reprocessed.
    val base = java.nio.file.Files.createTempDirectory("graft_restart_").toString
    val src = s"$base/src"; val sink = s"$base/sink"; val chk = s"$base/chk"
    val docs = Tables.pq(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .localCheckpoint()
    docs.where(col("doc_id") % 2 === 0).write.parquet(s"$src/p=a")
    val schema = spark.read.parquet(s"$src/p=a").schema
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(s"$src/p=*")
        .withColumn("toks", size(graft.ml.TextOps.tokens(col("text"))))
        .select(col("doc_id"), col("toks"))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    val afterFirst = spark.read.parquet(sink).count()
    docs.where(col("doc_id") % 2 =!= 0).write.parquet(s"$src/p=b")
    runOnce()
    val got = spark.read.parquet(sink)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val want = docs
      .withColumn("toks", size(graft.ml.TextOps.tokens(col("text"))))
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSeq
    assert(afterFirst == want.size / 2 + want.size % 2)
    assert(got.size == want.size, s"exactly-once violated: ${got.size} vs ${want.size}")
    assert(got.toSet == want.toSet)
  }

  test("checkpoint restart: flatMapGroupsWithState recovers open-island state") {
    // the stateful analog: an island left OPEN by run 1 lives only in
    // the state store; run 2 (same checkpoint) must close it from
    // recovered state when a later interval arrives. Losing state
    // silently drops the island — the classic restart bug this pins.
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_restate_").toString
    val src = s"$base/src"; val sink = s"$base/sink"; val chk = s"$base/chk"
    Seq(StreamingOps.InInterval("c", 1, 5), StreamingOps.InInterval("c", 4, 9))
      .toDS().write.parquet(s"$src/p=a")
    val schema = spark.read.parquet(s"$src/p=a").schema
    def runOnce(): Unit = {
      val in = spark.readStream.schema(schema).parquet(s"$src/p=*")
        .as[StreamingOps.InInterval]
      val q = StreamingOps.streamingMerge(in)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(sink).count() == 0)  // [1,9) still open, in state
    Seq(StreamingOps.InInterval("c", 50, 60), StreamingOps.InInterval("c", 100, 110))
      .toDS().write.parquet(s"$src/p=b")
    runOnce()
    val closed = spark.read.parquet(sink).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // run 2 closes BOTH the recovered [1,9) island (n=2) and [50,60)
    // (n=1, closed by 100's arrival); [100,110) stays open
    assert(closed == Set(("c", 1L, 9L, 2L), ("c", 50L, 60L, 1L)),
      s"state not recovered across restart: $closed")
  }

  test("tileCoverage compiles to a streaming windowed agg and runs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long, Long, java.sql.Timestamp)]
    val df = in.toDF().toDF(Chrom, Start, End, "ts")
    val q = StreamingOps.tileCoverage(df, 10, "ts", "0 seconds", "1 minute")
      .writeStream.format("memory").queryName("cov")
      .outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:30")
    in.addData(("c", 5L, 25L, t0))
    q.processAllAvailable()
    // advance watermark far so the window finalizes
    in.addData(("c", 5L, 6L, java.sql.Timestamp.valueOf("2026-01-01 01:00:00")))
    q.processAllAvailable()
    val rows = spark.table("cov").collect()
    // interval [5,25) covers tiles 0,10,20
    assert(rows.map(r => r.getLong(1)).toSet == Set(0L, 10L, 20L))
    q.stop()
  }

  test("streamingDedupExact drops within-watermark duplicate documents") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val df = in.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingOps.streamingDedupExact(df, "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    val t = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    in.addData((1L, "same text", t), (2L, "same text", t), (3L, "other", t))
    q.processAllAvailable()
    // one survivor per distinct content hash
    assert(spark.table("dedup").select("text").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("other", "same text"))
    q.stop()
  }

  test("streamStaticIntervalJoin enriches a stream against a broadcast range dim") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("a", 1L, 0L, 10L), ("a", 2L, 10L, 20L), ("b", 9L, 0L, 100L))
      .toDF("k", "win_id", "ws", "we")
    val in = MemoryStream[(String, Long, Double)]
    val stream = in.toDF().toDF("k", "pos", "v")
    val q = StreamingOps.streamStaticIntervalJoin(
        stream, dim, Seq("k"), "pos", "ws", "we")
      .writeStream.format("memory").queryName("ssij")
      .outputMode("append").start()
    in.addData(("a", 5L, 1.0), ("a", 10L, 2.0), ("a", 25L, 3.0),
      ("b", 99L, 4.0), ("c", 5L, 5.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssij").select("k", "pos", "win_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // half-open containment: pos 10 lands in [10,20) not [0,10); pos 25
    // and the unknown key drop (inner join)
    assert(got == Set(("a", 5L, 1L), ("a", 10L, 2L), ("b", 99L, 9L)))
    // the static key column is dropped; the stream's survives once
    assert(spark.table("ssij").columns.count(_ == "k") == 1)
  }

  test("readStream on the driver's events parquet drives tileCoverage end-to-end") {
    // events as intervals over user-id space (Chromosome = event_type),
    // event-time = the real ts column: the parquet-file streaming source
    // path, not MemoryStream.
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file streaming source wants a directory: stage the file into one
    val stage = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("part-0.parquet"))
    val batchSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // tsNanos absorbs the fixture vintage (nanos long vs timestamp[us])
    val stream = graft.Tables.tsNanos(spark.readStream.schema(batchSchema)
        .parquet(stage.toString))
      .select(col("event_type").as(Chrom),
        col("user_id").as(Start), (col("user_id") + 5).as(End),
        timestamp_micros((col("ts") / 1000).cast("long")).as("evt"))
    val q = StreamingOps.tileCoverage(stream, 100, "evt", "1 hour", "1 day")
      .writeStream.format("memory").queryName("evcov")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    // append mode only emits watermark-closed windows; with one batch the
    // aggregation state exists but may not flush — assert the query ran
    // and the plan was streaming.
    assert(spark.table("evcov").columns.contains("n_intervals"))
    val q2count = spark.read.parquet(s"$dir/events.parquet").count()
    assert(q2count > 0)
  }

  test("multimodal: meta struct, size balancing, deterministic stub features, frame sampling") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefgh".getBytes), (2L, "aaaabbbbccccdddd".getBytes))
      .toDF("media_id", "payload")
    val withMeta = Multimodal.withMediaMeta(docs)
    val m = withMeta.filter(col("media_id") === 1).select("meta.*").head
    assert(m.getAs[Long]("nBytes") == 8L)
    val feats = Multimodal.extractFeatures(docs, dim = 4)
    assert(feats.count() == 2)
    val f1a = feats.filter(col("media_id") === 1).head.getSeq[Float](1)
    val f1b = Multimodal.extractFeatures(docs, dim = 4)
      .filter(col("media_id") === 1).head.getSeq[Float](1)
    assert(f1a.toList == f1b.toList)        // deterministic
    assert(math.abs(f1a.sum - 1.0f) < 1e-5) // normalized histogram
    val frames = Multimodal.sampleFrames(docs, frameBytes = 4, everyN = 2)
    // 8 bytes -> frames 0,1 -> sampled 0; 16 bytes -> frames 0..3 -> 0,2
    assert(frames.groupBy("media_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 1L), (2L, 2L)))
    assert(Multimodal.balanceBySize(docs).count() == 2)
    // resize: every 4th byte kept, meta recomputed from the new payload
    val resized = Multimodal.resize(docs, factor = 4)
    val r2 = resized.filter(col("media_id") === 2).head
    assert(r2.getAs[Array[Byte]]("payload").toSeq == "abcd".getBytes.toSeq)
    assert(resized.filter(col("media_id") === 2)
      .select("meta.nBytes").head.getLong(0) == 4L)
  }

  test("multimodal: real javax.imageio decode of BMP and PNG, honest -1 on junk") {
    import spark.implicits._
    def pix(x: Int, y: Int): (Int, Int, Int) = (x * 10 % 256, y * 20 % 256, (x + y) % 256)
    // known checksums for 3x2: sum over pixels of r+g+b and (x+1)(y+1)(r+g+b)
    val exp = (for { y <- 0 until 2; x <- 0 until 3 } yield {
      val (r, g, b) = pix(x, y); (r + g + b).toLong
    }).sum
    val expW = (for { y <- 0 until 2; x <- 0 until 3 } yield {
      val (r, g, b) = pix(x, y); (x + 1).toLong * (y + 1) * (r + g + b)
    }).sum
    val rows = Seq(
      (1L, Multimodal.encodeBmp(3, 2, pix)),
      (2L, Multimodal.encodePng(3, 2, pix)),
      (3L, "not an image at all".getBytes),            // unknown magic
      (4L, Multimodal.encodePng(3, 2, pix).take(10)))  // truncated png
      .toDF("media_id", "payload")
    val got = Multimodal.decodeImageInfo(rows).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got(1L) == (("bmp", 3, 2, exp, expW)))
    assert(got(2L) == (("png", 3, 2, exp, expW)))
    assert(got(3L) == (("unknown", -1, -1, -1L, -1L)))
    assert(got(4L) == (("png", -1, -1, -1L, -1L)))
  }

  test("resize: real nearest-neighbor image downsample, decimation only for non-images") {
    import spark.implicits._
    def pix(x: Int, y: Int): (Int, Int, Int) = (x * 31 % 256, y * 47 % 256, (x * 7 + y * 3) % 256)
    val rows = Seq(
      (1L, Multimodal.encodeBmp(6, 4, pix)),
      (2L, "plain text payload".getBytes))
      .toDF("media_id", "payload")
    val resized = Multimodal.resize(rows, factor = 2)
    // image payload: re-encoded PNG at halved dims, pixels sampled at
    // (2x, 2y) — closed-form checksums through the real decoder
    val info = Multimodal.decodeImageInfo(resized)
      .filter(col("media_id") === 1).head
    assert(info.getString(1) == "png")
    assert((info.getInt(2), info.getInt(3)) == ((3, 2)))
    val exp = (for { y <- 0 until 2; x <- 0 until 3 } yield {
      val (r, g, b) = pix(2 * x, 2 * y); (r + g + b).toLong
    }).sum
    val expW = (for { y <- 0 until 2; x <- 0 until 3 } yield {
      val (r, g, b) = pix(2 * x, 2 * y); (x + 1).toLong * (y + 1) * (r + g + b)
    }).sum
    assert((info.getLong(4), info.getLong(5)) == ((exp, expW)))
    // non-image payload: labeled decimation stub (every 2nd byte)
    val t = resized.filter(col("media_id") === 2).head.getAs[Array[Byte]]("payload")
    assert(t.toSeq == "pantx ala".getBytes.toSeq)
  }

  test("sampleVideoFrames walks a real AVI container and frames decode exactly") {
    import spark.implicits._
    def pix(f: Int, x: Int, y: Int): (Int, Int, Int) =
      ((f * 50 + x * 10) % 256, (y * 20 + f) % 256, (f + x + y * 3) % 256)
    val avi = Multimodal.encodeAviDib(3, 2, 5, pix)
    val rows = Seq((1L, avi), (2L, "not a container".getBytes))
      .toDF("media_id", "payload")
    // header meta via column expressions: canonical avih offsets
    val m = Multimodal.withMediaMeta(rows).filter(col("media_id") === 1)
      .select("meta.*").head
    assert((m.getString(0), m.getInt(1), m.getInt(2)) == (("avi", 3, 2)))
    // real chunk walk: every 2nd of 5 frames -> 0, 2, 4; junk -> nothing
    val frames = Multimodal.sampleVideoFrames(rows, everyN = 2)
    assert(frames.select("media_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet ==
      Set((1L, 0), (1L, 2), (1L, 4)))
    // each emitted frame is a standalone BMP whose decoded pixels match
    // the generator closed-form (bottom-up row order must round-trip)
    val dec = Multimodal.decodeImageInfo(
        frames.select((col("media_id") * 10 + col("frame_idx")).as("media_id"),
          col("payload")))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5)))).toMap
    for (f <- Seq(0, 2, 4)) {
      val exp = (for { y <- 0 until 2; x <- 0 until 3 } yield {
        val (r, g, b) = pix(f, x, y); (r + g + b).toLong
      }).sum
      val expW = (for { y <- 0 until 2; x <- 0 until 3 } yield {
        val (r, g, b) = pix(f, x, y); (x + 1).toLong * (y + 1) * (r + g + b)
      }).sum
      assert(dec(10L + f) == (("bmp", 3, 2, exp, expW)), s"frame $f")
    }
  }

  test("resampleAudio decimates PCM frames and halves the rate, channels intact") {
    import spark.implicits._
    // stereo, 7 frames: interleaved samples s_j = 100*j - 300
    val samples = Array.tabulate[Short](14)(j => (100 * j - 300).toShort)
    val rows = Seq((1L, Multimodal.encodeWav(8000, 2, samples)),
      (2L, "not audio".getBytes)).toDF("media_id", "payload")
    val res = Multimodal.resampleAudio(rows, factor = 2)
    val got = Multimodal.decodeAudioInfo(res).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // frames 0,2,4,6 kept -> 4 frames at 4000 Hz; both channels of each
    // kept frame survive in order: new stream j' maps to old j = 4*(j'/2)+(j'%2)
    val kept = (0 until 8).map(j2 => samples(4 * (j2 / 2) + j2 % 2).toLong)
    val expSum = kept.map(math.abs).sum
    val expW = kept.zipWithIndex.map { case (v, j2) => (j2 + 1) * math.abs(v) }.sum
    assert(got(1L) == (("wav", 4000, 2, 4L, expSum, expW)))
    // non-audio payloads pass through untouched
    val p2 = res.filter(col("media_id") === 2).head.getAs[Array[Byte]]("payload")
    assert(p2.toSeq == "not audio".getBytes.toSeq)
  }

  test("imageFeatures: real per-cell luminance grid, feeds ANN end to end") {
    import spark.implicits._
    // 4x2 image, 2x1 grid: cell 0 = columns 0-1, cell 1 = columns 2-3
    def pix(x: Int, y: Int): (Int, Int, Int) = (40 * x, 10 * y, 5)
    val img = Multimodal.encodeBmp(4, 2, pix)
    // near-duplicate (one pixel nudged) and a very different image
    def pixDup(x: Int, y: Int): (Int, Int, Int) =
      if (x == 0 && y == 0) (41, 0, 5) else pix(x, y)
    def pixOther(x: Int, y: Int): (Int, Int, Int) = (200, 200, (x + y) % 7)
    val rows = Seq(
      (1L, img), (2L, Multimodal.encodeBmp(4, 2, pixDup)),
      (3L, Multimodal.encodeBmp(4, 2, pixOther)),
      (4L, "not an image".getBytes))
      .toDF("media_id", "payload")
    val feats = Multimodal.imageFeatures(rows, gridW = 2, gridH = 1)
    val f1 = feats.filter(col("media_id") === 1).head.getSeq[Float](1)
    // closed form: cell means of (r+g+b)/3, then L2-normalized (the
    // ANN kernels' unit-vector contract)
    def cellMean(xs: Seq[Int]): Double = {
      val vals = for { y <- 0 until 2; x <- xs } yield {
        val (r, g, b) = pix(x, y); r + g + b
      }
      vals.sum.toDouble / (vals.size * 3)
    }
    val (m0, m1) = (cellMean(Seq(0, 1)), cellMean(Seq(2, 3)))
    val nrm = math.sqrt(m0 * m0 + m1 * m1)
    assert(math.abs(f1(0) - m0 / nrm) < 1e-4)
    assert(math.abs(f1(1) - m1 / nrm) < 1e-4)
    // the pixel features drive ANN: 1's nearest neighbor is its near-dup
    val nn = graft.ml.Similarity.bruteForceTopK(
        feats.withColumnRenamed("media_id", "vec_id")
          .withColumnRenamed("feature", "embedding"), k = 1)
      .filter(col("vec_id") === 1).head
    assert(nn.getAs[Long]("nb") == 2L)
  }

  test("mp3Info/oggInfo walk real frame/page structure, resync past junk") {
    import spark.implicits._
    // mp3: 4 MPEG-1 Layer III frames (idx 9 = 128 kbps, sr idx 0 =
    // 44100) with alternating padding, preceded by junk bytes the
    // parser must resync over
    val mp3 = "garbage!".getBytes ++
      Multimodal.encodeMp3Frames(4, 9, 0, f => f % 2)
    val ogg = Multimodal.encodeOggPages(7, 3, p => 10 * (p + 1), p => 100L * (p + 1))
    val rows = Seq((1L, mp3), (2L, ogg), (3L, "neither".getBytes))
      .toDF("media_id", "payload")
    val m = Multimodal.mp3Info(rows).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(m(1L) == (("mp3", 128, 44100, 4L, 4L * 1152 * 1000 / 44100)))
    assert(m(3L) == (("unknown", -1, -1, -1L, -1L)))
    val o = Multimodal.oggInfo(rows).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(o(2L) == (("ogg", 7L, 3L, 300L, 60L)))
    assert(o(3L) == (("unknown", -1L, -1L, -1L, -1L)))
  }

  test("videoFeatures: demux -> per-frame features -> mean-pool, unit norm") {
    import spark.implicits._
    // video A: constant frames == a still image; video B: different
    def pixA(f: Int, x: Int, y: Int): (Int, Int, Int) = (20 * x, 30 * y, 10)
    def pixB(f: Int, x: Int, y: Int): (Int, Int, Int) = (200, 5 * f, x + y)
    val rows = Seq(
      (1L, Multimodal.encodeAviDib(4, 4, 3, pixA)),
      (2L, Multimodal.encodeAviDib(4, 4, 3, pixB)),
      (3L, "junk".getBytes))
      .toDF("media_id", "payload")
    val vf = Multimodal.videoFeatures(rows, everyN = 1, gridW = 2, gridH = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(!vf.contains(3L)) // nothing decodable -> no row
    // constant frames: pooled vector == the single-frame image feature
    val still = Multimodal.imageFeatures(
        Seq((1L, Multimodal.encodeBmp(4, 4, (x, y) => pixA(0, x, y))))
          .toDF("media_id", "payload"), 2, 2)
      .head.getSeq[Float](1)
    vf(1L).zip(still).foreach { case (a, b) => assert(math.abs(a - b) < 1e-4) }
    // unit norm
    val n2 = vf(2L).map(v => v.toDouble * v).sum
    assert(math.abs(n2 - 1.0) < 1e-4)
  }

  test("multimodal parsers survive corrupt blobs: random bytes, truncations, nulls") {
    import spark.implicits._
    // the 100 TB contract: one corrupt payload must degrade, not kill
    // the stage. Seeded random junk, real payloads truncated at every
    // byte-ish boundary class, empty and null blobs — through EVERY
    // parser/decoder in one pass.
    val rnd = new scala.util.Random(42)
    val avi = Multimodal.encodeAviDib(3, 2, 2, (f, x, y) => (x, y, f))
    val mp3 = Multimodal.encodeMp3Frames(3, 9, 0, _ => 0)
    val ogg = Multimodal.encodeOggPages(5, 2, _ => 10, p => p)
    val wav = Multimodal.encodeWav(8000, 1, Array[Short](1, 2, 3))
    val bmp = Multimodal.encodeBmp(2, 2, (_, _) => (1, 2, 3))
    val blobs: Seq[Array[Byte]] =
      (1 to 20).map(i => Array.fill(rnd.nextInt(100))(rnd.nextInt.toByte)) ++
      Seq(avi, mp3, ogg, wav, bmp).flatMap(b =>
        Seq(b.take(1), b.take(7), b.take(b.length / 2), b.take(b.length - 1))) ++
      Seq(Array.empty[Byte], null)
    val rows = blobs.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("media_id", "payload")
    val n = blobs.length.toLong
    // every stage must complete; unknowns degrade to -1s / passthrough
    assert(Multimodal.withMediaMeta(rows).count() == n)
    assert(Multimodal.decodeImageInfo(rows).count() == n)
    assert(Multimodal.decodeAudioInfo(rows).count() == n)
    assert(Multimodal.mp3Info(rows).count() == n)
    assert(Multimodal.oggInfo(rows).count() == n)
    assert(Multimodal.resize(rows, 2).count() == n)
    assert(Multimodal.resampleAudio(rows, 2).count() == n)
    assert(Multimodal.imageFeatures(rows, 2, 2).count() == n)
    // frame sampling may legitimately emit nothing — it just must not throw
    Multimodal.sampleVideoFrames(rows, 2).count()
  }

  test("withMediaMeta parses real container headers via column expressions") {
    import spark.implicits._
    // hand-built GIF89a logical screen descriptor: 300x77, LE shorts
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte]((300 & 0xff).toByte, (300 >> 8).toByte, 77, 0, 0, 0, 0)
    val rows = Seq(
      (1L, Multimodal.encodeBmp(640, 3, (_, _) => (1, 2, 3))),
      (2L, Multimodal.encodePng(19, 1000, (_, _) => (0, 0, 0))),
      (3L, gif),
      (4L, Multimodal.encodeWav(44100, 2, Array.tabulate[Short](8)(_.toShort))),
      (5L, Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)),
      (6L, "just some text bytes".getBytes),
      (7L, Multimodal.encodePng(19, 1000, (_, _) => (0, 0, 0)).take(12)))
      .toDF("media_id", "payload")
    val got = Multimodal.withMediaMeta(rows)
      .select(col("media_id"), col("meta.format"), col("meta.width"),
        col("meta.height")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(got(1L) == (("bmp", 640, 3)))
    assert(got(2L) == (("png", 19, 1000)))
    assert(got(3L) == (("gif", 300, 77)))
    assert(got(4L) == (("wav", 44100, 2)))   // width:=rate, height:=channels
    assert(got(5L) == (("jpeg", -1, -1)))    // format only; dims need a SOF walk
    assert(got(6L) == (("unknown", -1, -1)))
    assert(got(7L) == (("png", -1, -1)))     // truncated header degrades, no error
  }

  test("withMediaMeta preserves BMP top-down sign and the wav frame fields") {
    import spark.implicits._
    // hand-built BITMAPINFOHEADER with height = -7 (top-down BMP): the
    // little-endian parse must come back signed through the int cast
    val buf = java.nio.ByteBuffer.allocate(54)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
    buf.putInt(40).putInt(9).putInt(-7).putShort(1).putShort(24)
    val rows = Seq((1L, buf.array())).toDF("media_id", "payload")
    val m = Multimodal.withMediaMeta(rows).select("meta.*").head
    assert(m.getAs[String]("format") == "bmp")
    assert(m.getAs[Int]("width") == 9 && m.getAs[Int]("height") == -7)
  }

  test("real WAV decode recovers format, frame count, and sample checksums") {
    import spark.implicits._
    // stereo, 5 frames -> 10 interleaved samples with known values
    val samples = Array.tabulate[Short](10)(j => ((j - 5) * 100).toShort)
    val expSum = samples.map(s => math.abs(s.toLong)).sum
    val expW = samples.zipWithIndex.map { case (s, j) =>
      (j + 1).toLong * math.abs(s.toLong) }.sum
    val rows = Seq(
      (1L, Multimodal.encodeWav(16000, 2, samples)),
      (2L, "RIFFgarbage!".getBytes),                 // RIFF but not WAVE
      (3L, Multimodal.encodeWav(8000, 1, samples).take(20))) // truncated
      .toDF("media_id", "payload")
    val got = Multimodal.decodeAudioInfo(rows).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got(1L) == (("wav", 16000, 2, 5L, expSum, expW)))
    assert(got(2L) == (("unknown", -1, -1, -1L, -1L, -1L)))
    assert(got(3L) == (("wav", -1, -1, -1L, -1L, -1L)))
  }

  test("streaming ANN probe equals the batch probe at k=1") {
    import graft.ml.{AnnIndex, Similarity}
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.pq(spark, dir, "embeddings")
    val cm = Similarity.ivfCentroids(8, 64)
    val db = TestDbs.perRun(spark, "graft_sann_")
    AnnIndex.writeIvf(emb, s"$db.ivf", cm, buckets = 4)
    val schema = spark.read.parquet(s"$dir/embeddings.parquet").schema
    val src = spark.readStream.schema(schema).parquet(s"$dir/embeddings.parq*")
    val best = AnnIndex.probeStreamBest(spark, s"$db.ivf", src,
      nProbe = 2, centroids = cm)
    val name = s"sann_${System.nanoTime}"
    val q = best.writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table(name).collect().map(_.toSeq).toSet
    val batch = AnnIndex.probeIvf(spark, s"$db.ivf", emb,
        k = 1, nProbe = 2, centroids = cm)
      .select(col("vec_id"), col("nb"), col("dot"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming ADC serve equals the batch ADC probe at k=1, and rejects codes-free indexes") {
    import graft.ml.{AnnIndex, Pq, Similarity}
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.pq(spark, dir, "embeddings")
    val cm = Similarity.ivfCentroids(8, 64)
    val db = TestDbs.perRun(spark, "graft_spq_")
    AnnIndex.writeIvf(emb, s"$db.pq", cm, buckets = 4,
      codebooks = Pq.pqCodebooks(4, 8, 16))
    val schema = spark.read.parquet(s"$dir/embeddings.parquet").schema
    val src = spark.readStream.schema(schema).parquet(s"$dir/embeddings.parq*")
    val best = AnnIndex.probeStreamBestAdc(spark, s"$db.pq", src, nProbe = 2)
    val name = s"spq_${System.nanoTime}"
    val q = best.writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table(name).collect().map(_.toSeq).toSet
    val batch = AnnIndex.probeIvfAdc(spark, s"$db.pq", emb, k = 1, nProbe = 2)
      .select(col("vec_id"), col("nb"), col("score"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty)
    AnnIndex.writeIvf(emb, s"$db.bare", cm, buckets = 4)
    intercept[IllegalArgumentException] {
      AnnIndex.probeStreamBestAdc(spark, s"$db.bare", src, nProbe = 2)
    }
  }

  test("semanticFilterStream: streamed survivors equal the batch anti-join, " +
    "the gate actually drops, and null vectors pass through") {
    import graft.ml.{SemDedup, Similarity}
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.pq(spark, dir, "embeddings")
    val cm = Similarity.ivfCentroids(8, 64)
    val refs = emb.where(col("vec_id") % 3 === 0)
    val schema = spark.read.parquet(s"$dir/embeddings.parquet").schema
    val src = spark.readStream.schema(schema)
      .parquet(s"$dir/embeddings.parq*").where(col("vec_id") % 3 =!= 0)
    val kept = SemDedup.semanticFilterStream(src, refs, cm, 15)
    val name = s"semf_${System.nanoTime}"
    val q = kept.writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table(name).collect().map(_.toSeq).toSet
    // the operator is a plain stream-static plan: applied to the same
    // rows as a batch frame it must produce the identical survivor set
    val batch = SemDedup.semanticFilterStream(
      emb.where(col("vec_id") % 3 =!= 0), refs, cm, 15)
      .collect().map(_.toSeq).toSet
    val nIn = emb.where(col("vec_id") % 3 =!= 0).count()
    assert(streamed == batch && streamed.nonEmpty)
    assert(streamed.size < nIn, "the gate dropped nothing at t=15")
    // a NULL-vector row has no similarity evidence: kept, with the
    // batch audit convention's cell = -1 (an invalid vector must not
    // argmin its way into a real cell — round-13 ADVICE)
    import spark.implicits._
    val withNull = emb.select(col("vec_id"), col("embedding")).unionByName(
      Seq((9999L, null.asInstanceOf[Array[Float]]),
        (9998L, Array.empty[Float])).toDF("vec_id", "embedding"))
    val nulled = SemDedup.semanticFilterStream(withNull, refs, cm, 100)
      .where(col("vec_id") >= 9998L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nulled == Set((9999L, -1L), (9998L, -1L)))
  }

  test("SemIndex.filterStream: streamed survivors equal the batch probe, " +
    "and the serve needs no caller-supplied centroids or threshold") {
    import graft.ml.{SemIndex, Similarity}
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.pq(spark, dir, "embeddings")
    val cm = Similarity.ivfCentroids(8, 64)
    val db = TestDbs.perRun(spark, "graft_semst_")
    SemIndex.write(emb.where(col("vec_id") % 3 === 0), s"$db.sem", cm,
      thresholdPct = 15, buckets = 4)
    val schema = spark.read.parquet(s"$dir/embeddings.parquet").schema
    val src = spark.readStream.schema(schema)
      .parquet(s"$dir/embeddings.parq*").where(col("vec_id") % 3 =!= 0)
    val kept = SemIndex.filterStream(spark, s"$db.sem", src)
    val name = s"semix_${System.nanoTime}"
    val q = kept.writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table(name).collect().map(_.toSeq).toSet
    // batch probe over the same rows: identical survivor set
    val batch = SemIndex.probe(spark, s"$db.sem",
        emb.where(col("vec_id") % 3 =!= 0))
      .where(col("kept")).select(col("vec_id"), col("cell"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty)
    // and both equal the raw stream-static operator against the same
    // survivor refs (the index is a cache of exactly that state)
    val refIds = graft.ml.SemDedup.semanticDedup(
        emb.where(col("vec_id") % 3 === 0), cm, 15)
      .where(col("kept")).select(col("vec_id"))
    val refs = refIds.join(emb, Seq("vec_id"))
    val raw = graft.ml.SemDedup.semanticFilterStream(
        emb.where(col("vec_id") % 3 =!= 0), refs, cm, 15)
      .collect().map(_.toSeq).toSet
    assert(streamed == raw)
  }

  test("SubstrIndex.serve: the hot set is derived once — the probe plan " +
    "carries NO index scan, a multi-trigger serve equals the per-call " +
    "probe, and handle mutations invalidate the pinned set") {
    import spark.implicits._
    import graft.ml.SubstrIndex
    implicit val sqlCtx = spark.sqlContext
    val db = TestDbs.perRun(spark, "graft_subsrv_")
    val boiler = "w1 w2 w3 w4 w5 w6 w7 w8"
    val ref = Seq((1L, s"$boiler unique one"), (2L, s"prefix $boiler"),
      (3L, "totally unrelated reference text")).toDF("doc_id", "text")
    SubstrIndex.write(ref, s"$db.sub", minMatchTokens = 8, minOcc = 2,
      buckets = 2)
    val handle = SubstrIndex.serve(spark, s"$db.sub")
    val probeDocs = Seq((10L, s"$boiler tail tokens here"),
      (11L, "no overlap at all"),
      (12L, "a1 a2 a3 a4 a5 a6 a7 a8 xyz")).toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSet
    // the serve-handle probe == the per-call probe (same hot set)
    val served = handle.probe(probeDocs)
    assert(rows(served) == rows(SubstrIndex.probe(spark, s"$db.sub",
      probeDocs)))
    // ... and the boiler span actually vanished (the set is real)
    assert(served.where(col("doc_id") === 10L).head().getLong(3) == 8L)
    // PLAN PIN (VERDICT r15 item #2): the handle's probe plan carries
    // NO scan of the index table — the hot side is the checkpointed
    // in-memory set — while the per-call probe re-scans (and
    // re-aggregates) the index every invocation
    assert(!served.queryExecution.executedPlan.toString.contains("graft_subsrv"),
      "serve-handle probe plan still scans the index table")
    assert(SubstrIndex.probe(spark, s"$db.sub", probeDocs)
      .queryExecution.executedPlan.toString.contains("graft_subsrv"))
    // multi-trigger serve: two micro-batches through the handle union
    // to the one-shot batch probe (membership-only + pinned set)
    val in = MemoryStream[(Long, String)]
    val outPath = s"/tmp/${db}_served"
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        handle.probe(batch).write.mode("overwrite")
          .parquet(s"$outPath/b$bid")
      }
      .start()
    in.addData((10L, s"$boiler tail tokens here"))
    q.processAllAvailable()
    in.addData((11L, "no overlap at all"), (12L, "a1 a2 a3 a4 a5 a6 a7 a8 xyz"))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.option("recursiveFileLookup", "true")
      .schema("doc_id LONG, text STRING, n_tokens LONG, n_removed LONG")
      .parquet(outPath)
    assert(rows(streamed) == rows(served))
    // mutation THROUGH the handle invalidates: appending two docs that
    // make the a1..a8 gram hot must change the next probe — doc 12
    // kept everything before, loses the span after
    handle.append(Seq((20L, "a1 a2 a3 a4 a5 a6 a7 a8 first"),
      (21L, "again a1 a2 a3 a4 a5 a6 a7 a8")).toDF("doc_id", "text"))
    val after = handle.probe(probeDocs)
    assert(after.where(col("doc_id") === 12L).head().getLong(3) == 8L)
    assert(rows(after) == rows(SubstrIndex.probe(spark, s"$db.sub",
      probeDocs)))
    // compact folds partials without changing serve results, and the
    // refreshed plan is still index-scan-free
    handle.compact()
    val post = handle.probe(probeDocs)
    assert(rows(post) == rows(after))
    assert(!post.queryExecution.executedPlan.toString.contains("graft_subsrv"))
  }

  test("semanticFilterTextStream: the text serve twin of semanticDedupText — " +
    "anchor-dropped docs are re-dropped against the batch survivors, fresh " +
    "docs pass, and streamed == the batch spelling") {
    import spark.implicits._
    import graft.ml.{SemDedup, Similarity}
    implicit val sqlCtx = spark.sqlContext
    // 3 template families x 6 paraphrases (share ~10/13 shingles ->
    // cosine ~0.77) + 2 unrelated singletons
    val fams = for { f <- 0 until 3; i <- 0 until 6 } yield
      ((f * 100 + i).toLong,
        s"family $f shared template tokens alpha beta gamma delta " +
          s"epsilon zeta eta theta iota kappa lambda mu variant token$i")
    val solos = Seq(
      (900L, "completely different words entirely unrelated content one"),
      (901L, "nothing shared here either some other standalone text two"))
    val docs = (fams ++ solos).toDF("doc_id", "text").localCheckpoint()
    val cm = Similarity.trainIvfCentroids(
      graft.ml.TextOps.hashedNgramEmbedding(docs), 8, sampleFraction = 1.0)
    // ANCHOR mode: a dropped doc's killer (the cell anchor) is kept by
    // construction, so replaying the dropped set against the survivors
    // must admit nothing — the serve-time guarantee the scaladoc states
    val out = SemDedup.semanticDedupText(docs, cm, 60, mode = "anchor")
      .localCheckpoint()
    val dropped = out.where(!col("kept")).select("doc_id")
    assert(dropped.count() > 0, "corpus produced no drops at t=60")
    val refDocs = docs.join(out.where(col("kept")).select("doc_id"),
      Seq("doc_id"))
    val droppedDocs = docs.join(dropped, Seq("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val fresh = (999L,
      "a wholly novel subject matter sentence about volcanoes and tea")
    val in = MemoryStream[(Long, String)]
    val kept = SemDedup.semanticFilterTextStream(
      in.toDF().toDF("doc_id", "text"), refDocs, cm, 60)
    val name = s"semtextf_${System.nanoTime}"
    val q = kept.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    in.addData(droppedDocs: _*)
    in.addData(fresh)
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name).collect().map(_.getLong(0)).toSet
    assert(got == Set(999L),
      s"expected only the fresh doc to survive, got $got")
    // the operator is a plain stream-static plan: batch spelling over
    // the same rows produces the identical survivor set
    val batch = SemDedup.semanticFilterTextStream(
      (droppedDocs :+ fresh).toDF("doc_id", "text"), refDocs, cm, 60)
      .collect().map(_.getLong(0)).toSet
    assert(got == batch)
  }

  test("semanticFilterTextStream pins the reference side: a multi-trigger " +
    "serve embeds the survivors ONCE — the executed plan's static side is " +
    "the checkpointed frame, not a re-embed (VERDICT r16 item #2)") {
    import spark.implicits._
    import graft.ml.{SemDedup, Similarity}
    implicit val sqlCtx = spark.sqlContext
    val refDocs = (0 until 12).map(i =>
      (i.toLong, s"reference doc number $i with some shared words " +
        s"alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val cm = Similarity.ivfCentroids(4, 64)
    val in = MemoryStream[(Long, String)]
    val kept = SemDedup.semanticFilterTextStream(
      in.toDF().toDF("doc_id", "text"), refDocs, cm, 80)
    val name = s"semtextpin_${System.nanoTime}"
    val q = kept.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    in.addData((100L, "a first probe document about something else"))
    q.processAllAvailable()
    in.addData((101L, "a second probe document across another trigger"))
    q.processAllAvailable()
    val plan = q.asInstanceOf[org.apache.spark.sql.execution.streaming
      .runtime.StreamingQueryWrapper].streamingQuery.lastExecution
      .executedPlan.toString
    q.stop()
    // exactly ONE hashed-n-gram embed in the per-trigger plan — the
    // incoming batch's projection; the survivor side shows up as the
    // materialized checkpoint (an RDD scan), embedded zero times.
    // AQE's toString prints Final AND Initial plan sections — count
    // within the final section only (the whole string when no AQE)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val embeds = "(?i)hashedngramembed".r.findAllIn(finalPlan).size
    assert(embeds == 1,
      s"expected exactly 1 embed (the probe side), found $embeds in:\n$plan")
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
      s"static side is not the checkpointed frame:\n$plan")
    assert(spark.table(name).collect().map(_.getLong(0)).toSet ==
      Set(100L, 101L))
  }

  test("SemIndex text twins: writeText stamps the embedder spec, " +
    "probeText/filterTextStream replay it, results match the raw text " +
    "operators, and a vector-built index fails fast on text serve") {
    import spark.implicits._
    import graft.ml.{SemDedup, SemIndex, Similarity}
    implicit val sqlCtx = spark.sqlContext
    val fams = for { f <- 0 until 3; i <- 0 until 5 } yield
      ((f * 100 + i).toLong,
        s"family $f template words alpha$f beta gamma delta epsilon " +
          s"zeta eta theta iota kappa variant token$i")
    val solos = Seq((900L, "entirely different standalone text one"),
      (901L, "another unrelated standalone document two"))
    val docs = (fams ++ solos).toDF("doc_id", "text").localCheckpoint()
    val cm = Similarity.trainIvfCentroids(
      graft.ml.TextOps.hashedNgramEmbedding(docs), 6, sampleFraction = 1.0)
    val db = TestDbs.perRun(spark, "graft_semtx_")
    SemIndex.writeText(docs, s"$db.sem", cm, 60, mode = "anchor",
      buckets = 2)
    assert(SemIndex.storedEmbedder(spark, s"$db.sem") ==
      ((3, 64, "xxhash64", true)))
    // batch probe == the audit semantics: a doc the build DROPPED is
    // re-dropped (anchor mode — its killer is stored), fresh docs keep
    val audit = SemDedup.semanticDedupText(docs, cm, 60, mode = "anchor")
    val droppedIds = audit.where(!col("kept")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(droppedIds.nonEmpty, "no drops at t=60 — corpus too easy")
    val probed = SemIndex.probeText(spark, s"$db.sem", docs)
    val probedDropped = probed.where(!col("kept")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(droppedIds.subsetOf(probedDropped),
      s"build-dropped $droppedIds not re-dropped by probeText " +
        s"($probedDropped)")
    // streaming serve == the in-memory text filter over the SAME
    // survivor documents (the index stores exactly the kept rows)
    val refDocs = docs.join(audit.where(col("kept")).select("doc_id"),
      Seq("doc_id"))
    val probeDocs = (droppedIds.toSeq.sorted.map(i =>
        (i, docs.where(col("doc_id") === i).head().getString(1))) :+
      (999L, "a wholly novel sentence about volcanoes and tea"))
    val in = MemoryStream[(Long, String)]
    val served = SemIndex.filterTextStream(spark, s"$db.sem",
      in.toDF().toDF("doc_id", "text"))
    val name = s"semtxidx_${System.nanoTime}"
    val q = served.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    in.addData(probeDocs: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name).collect().map(_.getLong(0)).toSet
    val raw = SemDedup.semanticFilterTextStream(
      probeDocs.toDF("doc_id", "text"), refDocs, cm, 60)
      .collect().map(_.getLong(0)).toSet
    assert(got == raw, s"index serve $got != raw text filter $raw")
    assert(got.contains(999L) && !got.exists(droppedIds.contains),
      s"dropped docs must not pass the index serve: $got")
    // a VECTOR-built index must refuse text serve (no embedder spec)
    val emb = Tables.pq(spark, "/root/testdata/sf0.001", "embeddings")
    SemIndex.write(emb, s"$db.vec", Similarity.ivfCentroids(4, 64), 60,
      buckets = 2)
    val e = intercept[IllegalArgumentException] {
      SemIndex.probeText(spark, s"$db.vec",
        Seq((1L, "text")).toDF("doc_id", "text"))
    }
    assert(e.getMessage.contains("graft.sem.text"))
  }

  test("streaming serve picks up an index delete on the next trigger (takedown)") {
    import graft.ml.{AnnIndex, Similarity}
    import org.apache.spark.sql.functions.col
    // the operational shape: a takedown lands between serve triggers —
    // deleteByIds rewrites the table (crash-safe swap), and the NEXT
    // AvailableNow run re-resolves the catalog table, so retired ids
    // must vanish; the stored centroid matrix must survive the rewrite
    // (the probe passes none)
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.pq(spark, dir, "embeddings")
    val cm = Similarity.ivfCentroids(8, 64)
    val db = TestDbs.perRun(spark, "graft_sdel_")
    AnnIndex.writeIvf(emb, s"$db.ivf", cm, buckets = 4)
    val schema = spark.read.parquet(s"$dir/embeddings.parquet").schema
    def serve(): Set[Seq[Any]] = {
      val src = spark.readStream.schema(schema).parquet(s"$dir/embeddings.parq*")
      val best = AnnIndex.probeStreamBest(spark, s"$db.ivf", src, nProbe = 2)
      val name = s"sdel_${System.nanoTime}"
      val q = best.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(name).collect().map(_.toSeq).toSet
    }
    val before = serve()
    assert(before.exists(r => r(1).asInstanceOf[Long] % 3 == 0),
      "precondition: some pre-delete neighbor ids are % 3 == 0")
    AnnIndex.deleteByIds(spark, s"$db.ivf",
      emb.where(col("vec_id") % 3 === 0).select(col("vec_id")))
    val after = serve()
    assert(after.nonEmpty &&
      !after.exists(r => r(1).asInstanceOf[Long] % 3 == 0),
      "retired ids must not surface after the delete")
    val batch = AnnIndex.probeIvf(spark, s"$db.ivf", emb, k = 1, nProbe = 2)
      .select(col("vec_id"), col("nb"), col("dot"))
      .collect().map(_.toSeq).toSet
    assert(after == batch)
  }

  test("streaming LSH dedup probe: band hits aggregate to the batch answer") {
    import graft.ml.DedupIndex
    import org.apache.spark.sql.functions._
    // append-mode STATELESS band hits from the stream; the downstream
    // batch aggregation over the sink must equal probeLsh exactly
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.pq(spark, dir, "documents")
    val db = TestDbs.perRun(spark, "graft_slsh_")
    DedupIndex.writeLsh(docs.where(col("doc_id") % 3 =!= 0), s"$db.lsh",
      buckets = 4)
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val src = spark.readStream.schema(schema)
      .parquet(s"$dir/documents.parq*")
      .where(col("doc_id") % 3 === 0)
    val hits = DedupIndex.probeStream(spark, s"$db.lsh", src)
    val name = s"slsh_${System.nanoTime}"
    val q = hits.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table(name)
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_bands"),
        max(col("ns_a")).as("ns_a"), max(col("ns_b")).as("ns_b"))
      .collect().map(_.toSeq).toSet
    val batch = DedupIndex.probeLsh(spark, s"$db.lsh",
        docs.where(col("doc_id") % 3 === 0))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("q120 streaming curation chain equals the batch-composed equivalent") {
    import graft.ml.{Dedup, DedupIndex}
    import org.apache.spark.sql.functions._
    // the full serve path (persisted index -> stream probe ->
    // foreachBatch jaccard verify -> keeper) must equal the same chain
    // composed batch-side from probeLsh + pairJaccard
    val dir = "/root/testdata/sf0.001"
    val streamed = SparkEntry.queries("q120_stream_curation")(spark, dir)
      .collect().map(_.toSeq).toSet
    val docs = Tables.pq(spark, dir, "documents")
    val db = TestDbs.perRun(spark, "graft_s120_")
    DedupIndex.writeLsh(docs.where(length(col("source")) > 4), s"$db.lsh")
    val incoming = docs.where(length(col("source")) === 4)
    val cand = DedupIndex.probeLsh(spark, s"$db.lsh", incoming)
      .select(col("a"), col("b"))
    val verdicts = Dedup.pairJaccard(docs, cand)
    val perDoc = verdicts.groupBy(col("a"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("n_intersect") * 100 >= col("n_union") * 50, 1L)
          .otherwise(0L)).as("n_dups"))
    val batch = incoming.select(col("doc_id"))
      .join(perDoc, col("doc_id") === col("a"), "left")
      .select(col("doc_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"))
      .withColumn("kept", when(col("n_dups") === 0, 1L).otherwise(0L))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("paragraphFilterStream drops hot paragraphs stream-static, equals the batch anti-join") {
    import spark.implicits._
    import graft.ml.Dedup
    implicit val sqlCtx = spark.sqlContext
    // hot set = paragraphs seen in the "reference" corpus >= 2 docs
    val ref = Seq((100L, "BOILER\nunique ref"), (101L, "BOILER\nother ref"))
      .toDF("doc_id", "text")
    val hot = Dedup.splitParagraphs(ref)
      .groupBy(col("_p")).agg(countDistinct(col("doc_id")).as("_df"))
      .where(col("_df") > 1).select(col("_p"))
    val in = MemoryStream[(Long, String)]
    val survivors = Dedup.paragraphFilterStream(
      in.toDF().toDF("doc_id", "text"), hot)
    val q = survivors.writeStream.format("memory").queryName("paras")
      .outputMode("append").start()
    in.addData((1L, "alpha\nBOILER\nomega"), (2L, "BOILER"), (3L, "solo"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("paras").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    // BOILER vanishes everywhere (incl. doc 2 entirely); positions are
    // the ORIGINAL ones, so reassembly keeps source order
    assert(got == Set((1L, 0, "alpha"), (1L, 2, "omega"), (3L, 0, "solo")))
    // and the streamed rows equal the batch spelling of the same filter
    val batchRows = Dedup.splitParagraphs(
        Seq((1L, "alpha\nBOILER\nomega"), (2L, "BOILER"), (3L, "solo"))
          .toDF("doc_id", "text"))
      .join(hot, Seq("_p"), "left_anti")
      .select(col("doc_id"), col("_i"), col("_p"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got == batchRows)
    // reassembly of the streamed survivors restores in-order text
    val re = Dedup.reassembleParagraphs(spark.table("paras"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(re == Set((1L, "alpha\nomega", 2L), (3L, "solo", 1L)))
  }

  test("q138 streaming substring serve equals the batch removeSubstrings chain") {
    import graft.ml.Dedup
    // the full q138 lifecycle (hot-gram build -> AvailableNow stream ->
    // foreachBatch removeSubstrings) must equal the one-shot batch
    // spelling over the same splits: micro-batch boundaries cannot
    // change a membership-only filter
    val dir = "/root/testdata/sf0.001"
    val streamed = SparkEntry.queries("q138_stream_substring")(spark, dir)
      .collect().map(_.toSeq).toSet
    val docs = Tables.pq(spark, dir, "documents")
    val hot = Dedup.hotSubstrings(docs.where(length(col("source")) > 4),
      "text", "doc_id", minMatchTokens = 8)
    val batch = Dedup.removeSubstrings(docs.where(length(col("source")) === 4),
        hot, "text", "doc_id", minMatchTokens = 8)
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        md5(col("text")).as("clean_md5"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("SubstrIndex streaming serve (foreachBatch probe) equals the batch probe") {
    import graft.ml.SubstrIndex
    import org.apache.spark.sql.DataFrame
    // the persisted-index edition of the q138 serve: the hot side comes
    // off the bucketed gram table (zero index-side exchange, pinned in
    // PlanContractSpec) and micro-batch boundaries cannot change a
    // membership-only filter
    val dir = "/root/testdata/sf0.001"
    val db = TestDbs.perRun(spark, "graft_subs_")
    val docs = Tables.pq(spark, dir, "documents")
    SubstrIndex.write(docs.where(col("doc_id") % 3 =!= 0), s"$db.sub",
      buckets = 4)
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val outPath = s"/tmp/${db}_serve"
    new java.io.File(outPath).mkdirs()
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/documents.parq*")
      .where(col("doc_id") % 3 === 0)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        SubstrIndex.probe(spark, s"$db.sub", batch)
          .write.mode("overwrite").parquet(s"$outPath/b$bid")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.read
      .schema("doc_id LONG, text STRING, n_tokens LONG, n_removed LONG")
      .option("recursiveFileLookup", "true").parquet(outPath)
      .collect().map(_.toSeq).toSet
    val batchAns = SubstrIndex.probe(spark, s"$db.sub",
        docs.where(col("doc_id") % 3 === 0))
      .collect().map(_.toSeq).toSet
    assert(streamed == batchAns && streamed.nonEmpty)
  }
}
