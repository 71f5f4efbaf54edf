package graft

import graft.ml.Flac
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM FLAC codec: encoder/decoder round-trips over the
  * fixture subset (CONSTANT/FIXED-1/rice, multi-frame), hand-crafted
  * streams for the decoder paths the fixture encoder does not emit
  * (LPC subframes, mid/side decorrelation), CRC tamper detection, and
  * the DataFrame kernel's checksum/degradation contract. */
class FlacSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def roundTrip(rate: Int, ch: Int, samples: Array[Short],
                        blockSize: Int = 4096): Unit = {
    val enc = Flac.encodeFlac(rate, ch, samples, blockSize)
    val dec = Flac.decodeFlacPcm(enc)
    assert(dec.sampleRate == rate && dec.channels == ch && dec.bps == 16)
    assert(dec.samples.toSeq == samples.map(_.toInt).toSeq,
      s"rate=$rate ch=$ch bs=$blockSize")
  }

  test("encode/decode round-trip: constant, varying, negative, mono/stereo, multi-frame") {
    roundTrip(44100, 1, Array.fill[Short](64)(123))
    roundTrip(44100, 1, Array.fill[Short](64)(-777))
    roundTrip(8000, 1, Array.tabulate[Short](100)(i => ((i * 37) % 2048 - 1024).toShort))
    roundTrip(16000, 2, Array.tabulate[Short](120)(i => ((i * i * 13) % 4000 - 2000).toShort))
    // tiny block size forces multiple frames incl. a short last frame
    roundTrip(12000, 2, Array.tabulate[Short](110)(i => ((i * 97) % 3000 - 1500).toShort),
      blockSize = 16)
    // extreme values survive the 16-bit paths
    roundTrip(48000, 1, Array[Short](Short.MinValue, Short.MaxValue, 0, -1, 1, Short.MinValue))
  }

  test("blocks over 256 samples use the 16-bit blocksize header (no silent truncation)") {
    // single frame bs=1000 at the DEFAULT blockSize — the shape
    // resampleAudio emits for any real-length audio
    roundTrip(44100, 1, Array.tabulate[Short](1000)(i => ((i * 53) % 5000 - 2500).toShort))
    // multi-frame: full frames of 512 (16-bit code) + short tail of 76 (8-bit code)
    roundTrip(22050, 2, Array.tabulate[Short](2 * 588)(i => ((i * 29) % 3000 - 1500).toShort),
      blockSize = 512)
    // exact boundary: bs=256 still fits the 8-bit form, bs=257 must not
    roundTrip(8000, 1, Array.tabulate[Short](256)(i => (i - 128).toShort), blockSize = 256)
    roundTrip(8000, 1, Array.tabulate[Short](257)(i => (i - 128).toShort), blockSize = 257)
  }

  test("resampleAudio on a long FLAC blob survives the re-encode (regression: 8-bit blocksize truncation)") {
    import spark.implicits._
    val n = 3000 // decimated output 1500 frames > 256 -> encoder must use 16-bit code
    val samples = Array.tabulate[Short](n)(i => ((i * 17) % 2000 - 1000).toShort)
    val blob = Flac.encodeFlac(16000, 1, samples, blockSize = 4096)
    val out = graft.ml.Multimodal
      .resampleAudio(Seq((1L, blob)).toDF("media_id", "payload"), factor = 2)
      .collect().head.getAs[Array[Byte]](1)
    val dec = Flac.decodeFlacPcm(out)
    assert(dec.samples.toSeq == (0 until n by 2).map(i => samples(i).toInt))
  }

  test("decoder rejects reserved channel assignments 11-15") {
    val bytes = streamInfo(8000, 2, 2, 4096) ++
      frame(chanAsg = 11, bs = 2) { f =>
        f.put(0L, 1); f.put(1L, 6); f.put(0L, 1)
        f.put(1L, 16); f.put(2L, 16)
        f.put(0L, 1); f.put(1L, 6); f.put(0L, 1)
        f.put(3L, 16); f.put(4L, 16)
      }
    intercept[IllegalArgumentException](Flac.decodeFlacPcm(bytes))
  }

  test("decoder handles rice escape-to-raw partitions (hand-crafted stream)") {
    // FIXED order 0: residuals ARE the samples. Escape partition: rice
    // param 0xf, then 5-bit raw width, then raw signed values.
    val samples = Array(1234, -2048, 7, -1)
    val bytes = streamInfo(8000, 1, samples.length, 4096) ++
      frame(chanAsg = 0, bs = samples.length) { f =>
        f.put(0L, 1); f.put(8L, 6); f.put(0L, 1)  // FIXED order 0
        f.put(0L, 2)                              // method 0: 4-bit rice params
        f.put(0L, 4)                              // partition order 0
        f.put(0xfL, 4)                            // ESCAPE
        f.put(13L, 5)                             // raw width 13 bits
        samples.foreach(v => f.put(v.toLong & 0x1fffL, 13))
      }
    val dec = Flac.decodeFlacPcm(bytes)
    assert(dec.samples.toSeq == samples.toSeq)
  }

  test("resampleAudio passes non-16-bit FLAC through unchanged (no wrap-to-short corruption)") {
    import spark.implicits._
    // 20-bit stream: VERBATIM samples outside the 16-bit range
    val samples = Array(100000, -200000, 55555)
    val blob = streamInfo(8000, 1, samples.length, 4096, bps = 20) ++
      frame(chanAsg = 0, bs = samples.length, ssCode = 5) { f =>
        f.put(0L, 1); f.put(1L, 6); f.put(0L, 1)
        samples.foreach(v => f.put(v.toLong & 0xfffffL, 20))
      }
    // sanity: the decoder really reads it as 20-bit
    assert(Flac.decodeFlacPcm(blob).samples.toSeq == samples.toSeq)
    val out = graft.ml.Multimodal
      .resampleAudio(Seq((1L, blob)).toDF("media_id", "payload"), factor = 2)
      .collect().head.getAs[Array[Byte]](1)
    assert(out.toSeq == blob.toSeq)
  }

  test("resampleAudio passes 24-bit FLAC through byte-equal (bps guard, not wrap)") {
    import spark.implicits._
    // 24-bit stream: VERBATIM samples outside even the 20-bit range, so
    // a wrap-through-Short (or through 20-bit) would visibly corrupt
    val samples = Array(4000000, -7000000, 8388607, -8388608)
    val blob = streamInfo(8000, 1, samples.length, 4096, bps = 24) ++
      frame(chanAsg = 0, bs = samples.length, ssCode = 6) { f =>
        f.put(0L, 1); f.put(1L, 6); f.put(0L, 1)
        samples.foreach(v => f.put(v.toLong & 0xffffffL, 24))
      }
    // sanity: a well-formed 24-bit stream the decoder fully understands
    val dec = Flac.decodeFlacPcm(blob)
    assert(dec.bps == 24 && dec.samples.toSeq == samples.toSeq)
    val out = graft.ml.Multimodal
      .resampleAudio(Seq((1L, blob)).toDF("media_id", "payload"), factor = 2)
      .collect().head.getAs[Array[Byte]](1)
    assert(out.toSeq == blob.toSeq)
  }

  test("decoder rejects tampered frames via CRC") {
    val enc = Flac.encodeFlac(8000, 1,
      Array.tabulate[Short](50)(i => (i * 31 - 700).toShort))
    // flip a bit in the frame payload (past the 4 + 38 byte header area)
    val bad = enc.clone()
    bad(bad.length - 5) = (bad(bad.length - 5) ^ 0x10).toByte
    intercept[IllegalArgumentException](Flac.decodeFlacPcm(bad))
  }

  private def streamInfo(rate: Int, ch: Int, nSamples: Long,
                         blockSize: Int, bps: Int = 16): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("fLaC".getBytes("US-ASCII"))
    val w = new Flac.BitWriter
    w.put(1L, 1); w.put(0L, 7); w.put(34L, 24)
    w.put(blockSize.toLong, 16); w.put(blockSize.toLong, 16)
    w.put(0L, 24); w.put(0L, 24)
    w.put(rate.toLong, 20); w.put((ch - 1).toLong, 3); w.put((bps - 1).toLong, 5)
    w.put(nSamples, 36); w.put(0L, 64); w.put(0L, 64)
    bos.write(w.bytes)
    bos.toByteArray
  }

  private def frame(chanAsg: Int, bs: Int, ssCode: Int = 4)(build: Flac.BitWriter => Unit): Array[Byte] = {
    val hdr = new Flac.BitWriter
    hdr.put(0x3ffe, 14); hdr.put(0L, 1); hdr.put(0L, 1)
    hdr.put(6L, 4); hdr.put(0L, 4); hdr.put(chanAsg.toLong, 4)
    hdr.put(ssCode.toLong, 3); hdr.put(0L, 1)
    hdr.put(0L, 8)            // frame number 0 (1-byte UTF-8)
    hdr.put((bs - 1).toLong, 8)
    val hb = hdr.bytes
    val f = new Flac.BitWriter
    hb.foreach(b => f.put(b & 0xffL, 8))
    f.put(Flac.crc8(hb, 0, hb.length).toLong, 8)
    build(f)
    f.align()
    val fb = f.bytes
    val c = Flac.crc16(fb, 0, fb.length)
    fb ++ Array(((c >> 8) & 0xff).toByte, (c & 0xff).toByte)
  }

  test("decoder handles LPC subframes (hand-crafted stream)") {
    // order-1 LPC with coef 16, shift 4 -> prediction == previous
    // sample, so the rice residuals are first differences
    val samples = Array(100, 103, 97, 105)
    val bytes = streamInfo(8000, 1, samples.length, 4096) ++
      frame(chanAsg = 0, bs = samples.length) { f =>
        f.put(0L, 1); f.put(32L, 6); f.put(0L, 1) // LPC order 1
        f.put(samples(0).toLong & 0xffffL, 16)    // warmup
        f.put(5L, 4)                              // precision-1 = 5 -> 6 bits
        f.put(4L, 5)                              // shift 4
        f.put(16L, 6)                             // coef = 16
        f.put(0L, 2); f.put(0L, 4)                // rice, 1 partition
        val res = (1 until samples.length).map(i => samples(i) - samples(i - 1))
        val zig = res.map(e => if (e >= 0) 2L * e else -2L * e - 1)
        val k = 2
        f.put(k.toLong, 4)
        zig.foreach { u => f.putUnary((u >> k).toInt); f.put(u & ((1L << k) - 1), k) }
      }
    val dec = Flac.decodeFlacPcm(bytes)
    assert(dec.samples.toSeq == samples.toSeq)
  }

  test("decoder reconstructs mid/side stereo (hand-crafted stream)") {
    val l = Array(1000, -200, 35)
    val r = Array(998, -300, 40)
    val mid = l.indices.map(i => (l(i) + r(i)) >> 1)
    val side = l.indices.map(i => l(i) - r(i))
    val bytes = streamInfo(16000, 2, l.length, 4096) ++
      frame(chanAsg = 10, bs = l.length) { f =>
        f.put(0L, 1); f.put(1L, 6); f.put(0L, 1) // VERBATIM mid (16 bit)
        mid.foreach(v => f.put(v.toLong & 0xffffL, 16))
        f.put(0L, 1); f.put(1L, 6); f.put(0L, 1) // VERBATIM side (17 bit)
        side.foreach(v => f.put(v.toLong & 0x1ffffL, 17))
      }
    val dec = Flac.decodeFlacPcm(bytes)
    val got = dec.samples.grouped(2).toSeq
    assert(got.map(_(0)) == l.toSeq && got.map(_(1)) == r.toSeq)
  }

  test("resampleAudio decimates FLAC losslessly (decode -> keep every factor-th frame -> re-encode)") {
    import spark.implicits._
    val ch = 2
    val samples = Array.tabulate[Short](60 * ch)(j => ((j * 61) % 2200 - 1100).toShort)
    val blob = Flac.encodeFlac(24000, ch, samples, blockSize = 16)
    val out = graft.ml.Multimodal
      .resampleAudio(Seq((1L, blob)).toDF("media_id", "payload"), factor = 3)
      .collect().head.getAs[Array[Byte]](1)
    val dec = Flac.decodeFlacPcm(out)
    assert(dec.sampleRate == 8000 && dec.channels == ch)
    val expect = (0 until 60 by 3).flatMap(f => Seq(samples(f * ch), samples(f * ch + 1)))
    assert(dec.samples.toSeq == expect.map(_.toInt))
  }

  test("decodeAudioInfo routes FLAC blobs through the codec (format-agnostic path)") {
    import spark.implicits._
    val ch = 2
    val samples = Array.tabulate[Short](40 * ch)(j => ((j * 91) % 1800 - 900).toShort)
    val blob = Flac.encodeFlac(16000, ch, samples, blockSize = 16)
    val r = graft.ml.Multimodal
      .decodeAudioInfo(Seq((5L, blob)).toDF("media_id", "payload"))
      .collect().head
    assert(r.getString(1) == "flac" && r.getInt(2) == 16000 &&
      r.getInt(3) == ch && r.getLong(4) == 40L)
    val absVals = samples.map(s => math.abs(s.toLong))
    assert(r.getLong(5) == absVals.sum &&
      r.getLong(6) == absVals.zipWithIndex.map { case (v, j) => (j + 1) * v }.sum)
  }

  test("decoder terminates and degrades on fuzzed garbage (no hang, no wrong samples)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val blobs = (1L to 40L).map { id =>
      val n = 8 + rnd.nextInt(200)
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      // half get the magic so they enter the real parse paths
      if (id % 2 == 0) { b(0) = 'f'; b(1) = 'L'; b(2) = 'a'; b(3) = 'C' }
      (id, b)
    }
    val rowsOut = Flac.decodeFlacInfo(blobs.toDF("media_id", "payload"))
      .collect()
    assert(rowsOut.length == 40)
    // every fuzzed blob must degrade (CRC/structure rejects it), never
    // emit a positive sample count
    assert(rowsOut.forall(_.getLong(5) == -1L))
  }

  test("decodeFlacInfo: closed-form checksums; corrupt blobs degrade to -1") {
    import spark.implicits._
    def mk(id: Long): (Long, Array[Byte]) = {
      val ch = (id % 2).toInt + 1
      val nf = (id % 30).toInt + 5
      val samples = Array.tabulate[Short](nf * ch)(j => ((id * 7 + j * 13) % 512 - 256).toShort)
      (id, Flac.encodeFlac(8000, ch, samples, blockSize = 16))
    }
    val rows = (1L to 6L).map(mk) :+ (99L, Array[Byte](1, 2, 3, 4, 5))
    val got = Flac.decodeFlacInfo(rows.toDF("media_id", "payload"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    for (id <- 1L to 6L) {
      val ch = (id % 2).toInt + 1
      val nf = (id % 30).toInt + 5
      val s = Array.tabulate(nf * ch)(j => math.abs((id * 7 + j * 13) % 512 - 256))
      val (fmt, rate, n, amp, ampW) = got(id)
      assert(fmt == "flac" && rate == 8000 && n == nf * ch)
      assert(amp == s.sum && ampW == s.zipWithIndex.map { case (v, j) => (j + 1) * v }.sum)
    }
    assert(got(99L)._3 == -1L && got(99L)._2 == -1)
  }
}
