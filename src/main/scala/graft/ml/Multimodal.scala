package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque binary payload + typed metadata struct, with
  * decode / feature-extract / frame-sample stages shaped for executor-
  * side batch processing.
  *
  * Image decode (PNG/BMP/JPEG/GIF via javax.imageio), audio decode and
  * resample (WAV/PCM via javax.sound.sampled), nearest-neighbor image
  * resize, and AVI video demux (RIFF chunk walk, uncompressed DIB
  * frames) are REAL — all pure JDK, so they work offline. Only codecs
  * with no JDK implementation (mp4/compressed video, mp3/ogg) remain
  * STUBS — deterministic fakes clearly marked below — while everything
  * Spark-side is real:
  * schemas, partition balancing by payload bytes, per-partition batch
  * iteration (the same shape a Pandas-UDF/mapInPandas or JNI decoder
  * plugs into), and downstream feature columns that feed
  * Similarity/Dedup.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int, nBytes: Long)
  case class MediaFeature(media_id: Long, feature: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Big-endian unsigned int read from a binary column (1-based byte
    * offset), as pure column arithmetic: hex of the slice, parsed base-16.
    * Codegen'd end to end — no UDF. */
  private def beInt(p: Column, off1: Int, len: Int): Column =
    conv(hex(substring(p, off1, len)), 16, 10).cast("long")

  /** Little-endian unsigned int: per-byte hex slices concatenated in
    * reverse significance order, parsed base-16. */
  private def leInt(p: Column, off1: Int, len: Int): Column =
    conv(concat((0 until len).reverse.map(i =>
      hex(substring(p, off1 + i, 1))): _*), 16, 10).cast("long")

  /** Reinterpret a [0, 2^32) value as signed 32-bit: ANSI mode rejects
    * an overflowing long->int cast, and BMP heights are genuinely signed
    * (negative = top-down row order). */
  private def signed32(v: Column): Column =
    when(v >= (1L << 31), v - (1L << 32)).otherwise(v)

  /** Attach a typed metadata struct parsed from REAL container headers —
    * pure column expressions over the leading bytes, whole-stage-codegen
    * friendly (no UDF, no decode):
    *   - PNG: IHDR width/height, 4-byte big-endian at offsets 16/20
    *   - BMP: BITMAPINFOHEADER width/height, 4-byte little-endian at
    *     18/22 (signed — negative height means top-down; the int cast
    *     preserves the sign bit)
    *   - GIF: logical screen descriptor width/height, 2-byte LE at 6/8
    *   - WAV: fmt chunk — width:=sample rate (4 LE at 24), height:=
    *     channels (2 LE at 22); a container with no pixel grid reports
    *     its own natural "dimensions"
    *   - AVI: avih main header dwWidth/dwHeight, 4-byte LE at the
    *     canonical 64/68 (RIFF + hdrl LIST + avih headers are
    *     fixed-size; the full chunk walk lives in sampleVideoFrames)
    *   - JPEG: format only, -1 dims (SOF frame headers sit at variable
    *     offsets behind a segment walk — use decodeImageInfo for dims)
    * Unknown/truncated payloads degrade to (-1, -1), never error. */
  def withMediaMeta(df: DataFrame, blobCol: String = "payload",
                    metaCol: String = "meta"): DataFrame = {
    val p = col(blobCol)
    val nb = length(p).cast("long")
    val isPng = hex(substring(p, 1, 8)) === "89504E470D0A1A0A"
    val isBmp = hex(substring(p, 1, 2)) === "424D"
    val isGif = hex(substring(p, 1, 3)) === "474946"
    val isJpeg = hex(substring(p, 1, 2)) === "FFD8"
    val isWav = hex(substring(p, 1, 4)) === "52494646" &&
      hex(substring(p, 9, 4)) === "57415645" &&
      hex(substring(p, 13, 4)) === "666D7420"
    val isAvi = hex(substring(p, 1, 4)) === "52494646" &&
      hex(substring(p, 9, 4)) === "41564920"
    val width =
      when(isPng && nb >= 24, beInt(p, 17, 4))
        .when(isBmp && nb >= 26, signed32(leInt(p, 19, 4)))
        .when(isGif && nb >= 10, leInt(p, 7, 2))
        .when(isWav && nb >= 28, signed32(leInt(p, 25, 4)))
        .when(isAvi && nb >= 68, signed32(leInt(p, 65, 4)))
        .otherwise(lit(-1L))
    val height =
      when(isPng && nb >= 24, beInt(p, 21, 4))
        .when(isBmp && nb >= 26, signed32(leInt(p, 23, 4)))
        .when(isGif && nb >= 10, leInt(p, 9, 2))
        .when(isWav && nb >= 24, leInt(p, 23, 2))
        .when(isAvi && nb >= 72, signed32(leInt(p, 69, 4)))
        .otherwise(lit(-1L))
    df.withColumn(metaCol, struct(
      when(isPng, "png").when(isBmp, "bmp").when(isGif, "gif")
        .when(isWav, "wav").when(isAvi, "avi").when(isJpeg, "jpeg")
        .otherwise("unknown").as("format"),
      width.cast("int").as("width"),
      height.cast("int").as("height"),
      nb.as("nBytes")))
  }

  /** Balance partitions by cumulative payload size so one task doesn't
    * get all the large blobs — range-partition on byte size. */
  def balanceBySize(df: DataFrame, blobCol: String = "payload",
                    partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
            else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartitionByRange(n, length(col(blobCol)))
  }

  /** Decode + feature-extract: per-partition batch loop over payloads
    * producing a fixed-dim Float feature vector.
    * CONTENT features: a byte histogram (deterministic, format-blind) —
    * for decoded PIXEL features use [[imageFeatures]], which falls back
    * to this histogram on non-image payloads. */
  def extractFeatures(df: DataFrame, idCol: String = "media_id",
                      blobCol: String = "payload", dim: Int = 16): DataFrame = {
    val src = df.select(col(idCol).cast("long"), col(blobCol))
    src.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        val f = new Array[Float](dim)
        if (bytes != null) {
          var i = 0
          while (i < bytes.length) {
            f(java.lang.Byte.toUnsignedInt(bytes(i)) % dim) += 1.0f
            i += 1
          }
          // normalize by length so feature is scale-free
          if (bytes.length > 0) {
            var j = 0
            while (j < dim) { f(j) /= bytes.length; j += 1 }
          }
        }
        MediaFeature(id, f)
      }
    }(Encoders.product[MediaFeature])
      .toDF(idCol, "feature")
  }

  /** REAL image feature extraction: decode with javax.imageio,
    * partition the pixel grid into gridW x gridH cells, emit per-cell
    * mean luminance ((r+g+b)/3, averaged over the cell) as the feature
    * vector — the classic tiny-thumbnail embedding, deterministic and
    * pure JDK, feeding [[Similarity]]'s cosine/LSH/IVF ANN directly —
    * vectors are L2-normalized, matching the unit-vector contract of
    * the dot-product kernels. Non-image payloads fall back to a byte
    * histogram of the same dimension, ALSO L2-normalized here (unlike
    * [[extractFeatures]], whose histogram is count-normalized and not
    * unit-length), so a mixed corpus embeds into one space.
    *
    * `normalize = false` emits the RAW per-cell luminance SUMS (and the
    * raw histogram counts on the fallback path) instead: exact
    * integers, which stay exact through Float (cell sums are bounded
    * far below 2^24) and through the ANN layer's floor(x*1000)
    * quantization in BOTH engines — the engine-exact variant an
    * external SQL oracle can replay bit-for-bit (q124). The cost is
    * scale sensitivity (a bright image dots higher), so keep the
    * default for similarity semantics. */
  def imageFeatures(df: DataFrame, gridW: Int = 4, gridH: Int = 4,
                    idCol: String = "media_id",
                    blobCol: String = "payload",
                    normalize: Boolean = true): DataFrame = {
    require(gridW >= 1 && gridH >= 1)
    val dim = gridW * gridH
    val src = df.select(col(idCol).cast("long"), col(blobCol))
    src.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        val fmt = if (bytes == null) "unknown" else sniffFormat(bytes)
        val img =
          if (fmt == "unknown" || fmt == "wav" || fmt == "avi") null
          else readImage(bytes)
        val f = new Array[Float](dim)
        if (img != null) {
          val w = img.getWidth
          val h = img.getHeight
          val px = rgbRows(img)
          val sums = new Array[Long](dim)
          val counts = new Array[Long](dim)
          var y = 0
          while (y < h) {
            val cy = math.min(gridH - 1, y * gridH / h)
            var x = 0
            while (x < w) {
              val cx = math.min(gridW - 1, x * gridW / w)
              val rgb = px(y * w + x)
              val luma = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              val c = cy * gridW + cx
              sums(c) += luma
              counts(c) += 3L
              x += 1
            }
            y += 1
          }
          var c = 0
          while (c < dim) {
            f(c) = if (!normalize) sums(c).toFloat
              else if (counts(c) > 0) sums(c).toFloat / counts(c) else 0f
            c += 1
          }
        } else if (bytes != null) {
          // content fallback: the byte-histogram features, same dim
          var i = 0
          while (i < bytes.length) {
            f(java.lang.Byte.toUnsignedInt(bytes(i)) % dim) += 1.0f
            i += 1
          }
        }
        if (normalize) {
          // unit-normalize: the ANN kernels rank by dot product
          var nrm = 0.0
          var j = 0
          while (j < dim) { nrm += f(j).toDouble * f(j); j += 1 }
          if (nrm > 0) {
            val inv = (1.0 / math.sqrt(nrm)).toFloat
            j = 0
            while (j < dim) { f(j) *= inv; j += 1 }
          }
        }
        MediaFeature(id, f)
      }
    }(Encoders.product[MediaFeature])
      .toDF(idCol, "feature")
  }

  case class ImageInfo(media_id: Long, format: String, width: Int,
                       height: Int, px_sum: Long, px_weighted: Long)

  /** Decode an in-memory image WITHOUT the ImageIO disk cache
    * (round-17): `ImageIO.read(InputStream)` consults the global
    * use-cache flag and, at its default, wraps every blob in a
    * FileCacheImageInputStream — one temp-FILE create/write/delete per
    * decoded image. On a media corpus that is a hidden disk round-trip
    * per row (and a /tmp dependency executors may not want); wrapping
    * the blob in a MemoryCacheImageInputStream ourselves skips it with
    * no global state touched. Decoded pixels are identical — only the
    * stream plumbing changes. Returns null on undecodable input (the
    * callers' honest-partial contract). */
  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    try javax.imageio.ImageIO.read(
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => null }

  /** Bulk default-RGB pixel fetch: one array per image instead of one
    * ColorModel conversion call per PIXEL (`getRGB(x, y)` in a 2-D
    * loop). Values are bit-identical — both entry points convert the
    * same raster through the same default color model. */
  private def rgbRows(img: java.awt.image.BufferedImage): Array[Int] =
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)

  /** PNG-encode to memory WITHOUT the ImageIO disk cache — the write
    * twin of [[readImage]]: `ImageIO.write(img, fmt, OutputStream)`
    * consults the same global use-cache flag and spools every encode
    * through a temp file at its default. Encoded bytes are identical
    * (same JDK PNG writer, same defaults). */
  private[ml] def encodePngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    javax.imageio.ImageIO.write(img, "png", ios)
    ios.close()
    bos.toByteArray
  }

  /** Detect the container from magic bytes (JVM-side twin of the
    * column-expression sniff in withMediaMeta, for mapPartitions
    * kernels). */
  def sniffFormat(bytes: Array[Byte]): String =
    if (bytes == null || bytes.length < 4) "unknown"
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
      bytes(3) == 'G') "png"
    else if (bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F') "gif"
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
      bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') "wav"
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'A' &&
      bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' ') "avi"
    else if (bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' &&
      bytes(3) == 'C') "flac"
    else "unknown"

  /** REAL image decode (round-3): PNG/BMP/JPEG/GIF payloads are decoded
    * executor-side with the JDK's javax.imageio (offline-safe — ships in
    * the JDK; no external codec). Emits per-image dimensions plus two
    * pixel checksums: px_sum = Σ(r+g+b) and the position-weighted
    * px_weighted = Σ(x+1)(y+1)(r+g+b), which catches orientation /
    * channel-order decode bugs the unweighted sum can't. Unsupported or
    * undecodable payloads keep their sniffed format with -1 dimensions
    * (honest partial, not a crash — one corrupt blob in 100 TB must not
    * kill the stage). Same mapPartitions batch shape as the stub kernels,
    * so a JNI/Pandas decoder swaps in without plan changes. */
  def decodeImageInfo(df: DataFrame, idCol: String = "media_id",
                      blobCol: String = "payload"): DataFrame = {
    val src = df.select(col(idCol).cast("long"), col(blobCol))
    src.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        val fmt = sniffFormat(bytes)
        val img = if (fmt == "unknown") null else readImage(bytes)
        if (img == null) ImageInfo(id, fmt, -1, -1, -1L, -1L)
        else {
          val w = img.getWidth
          val h = img.getHeight
          val px = rgbRows(img)
          var s = 0L
          var sw = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = px(y * w + x)
              val v = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              s += v
              sw += (x + 1).toLong * (y + 1) * v
              x += 1
            }
            y += 1
          }
          ImageInfo(id, fmt, w, h, s, sw)
        }
      }
    }(Encoders.product[ImageInfo])
      .toDF(idCol, "format", "width", "height", "px_sum", "px_weighted")
  }

  /** Minimal 24-bit uncompressed BMP encoder (bottom-up BGR rows, 4-byte
    * row padding) — deterministic test/data-gen payload source for the
    * decode path above. */
  def encodeBmp(width: Int, height: Int,
                pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = (width * 3 + 3) & ~3
    val dataSize = rowBytes * height
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // bottom-up
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pix(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var p = width * 3
      while (p < rowBytes) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** PNG bytes for the same pixel function, via the JDK encoder. */
  def encodePng(width: Int, height: Int,
                pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pix(x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    encodePngBytes(img)
  }

  case class AudioInfo(media_id: Long, format: String, sample_rate: Int,
                       channels: Int, n_frames: Long, amp_sum: Long,
                       amp_weighted: Long)

  /** REAL audio decode (round-3): WAV/PCM payloads are decoded
    * executor-side with the JDK's javax.sound.sampled (offline-safe, same
    * rationale as decodeImageInfo). Emits container metadata (sample
    * rate, channels, frame count) plus two sample checksums over the
    * interleaved 16-bit PCM stream: amp_sum = Σ|s_j| and the
    * position-weighted amp_weighted = Σ(j+1)|s_j|, which catches
    * byte-order / channel-interleave decode bugs. Undecodable payloads
    * and non-16-bit encodings degrade to -1 fields instead of failing
    * the stage. Compressed codecs (mp3/ogg) have no JDK decoder — they
    * stay stubbed by the generic feature kernel. */
  def decodeAudioInfo(df: DataFrame, idCol: String = "media_id",
                      blobCol: String = "payload"): DataFrame = {
    val src = df.select(col(idCol).cast("long"), col(blobCol))
    src.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        val fmt = sniffFormat(bytes)
        if (fmt == "flac") {
          // route through the pure-JVM codec; same checksum contract
          // (n_frames = per-channel count, sums over the interleaved
          // stream), so the generic audio path is format-agnostic
          val viaFlac = try {
            val pcm = Flac.decodeFlacPcm(bytes)
            var s = 0L; var sw = 0L
            var j = 0
            while (j < pcm.samples.length) {
              val v = math.abs(pcm.samples(j).toLong)
              s += v; sw += (j + 1) * v
              j += 1
            }
            AudioInfo(id, "flac", pcm.sampleRate, pcm.channels,
              pcm.samples.length.toLong / pcm.channels, s, sw)
          } catch { case _: Exception => AudioInfo(id, "flac", -1, -1, -1L, -1L, -1L) }
          viaFlac
        } else {
        val parsed =
          if (fmt != "wav") None
          else try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val f = ais.getFormat
            val nFrames = ais.getFrameLength
            val pcm16 = f.getSampleSizeInBits == 16 &&
              f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            val data = ais.readAllBytes()
            ais.close()
            Some((f.getSampleRate.toInt, f.getChannels, nFrames, pcm16,
              f.isBigEndian, data))
          } catch { case _: Exception => None }
        parsed match {
          case None => AudioInfo(id, fmt, -1, -1, -1L, -1L, -1L)
          case Some((rate, ch, nFrames, pcm16, bigEndian, data)) =>
            if (!pcm16) AudioInfo(id, fmt, rate, ch, nFrames, -1L, -1L)
            else {
              val n = data.length / 2
              var s = 0L
              var sw = 0L
              var j = 0
              while (j < n) {
                val lo = if (bigEndian) data(2 * j + 1) else data(2 * j)
                val hi = if (bigEndian) data(2 * j) else data(2 * j + 1)
                val v = math.abs(((hi << 8) | (lo & 0xff)).toShort.toLong)
                s += v
                sw += (j + 1) * v
                j += 1
              }
              AudioInfo(id, fmt, rate, ch, nFrames, s, sw)
            }
        }
        }
      }
    }(Encoders.product[AudioInfo])
      .toDF(idCol, "format", "sample_rate", "channels", "n_frames",
        "amp_sum", "amp_weighted")
  }

  /** Minimal PCM16LE mono/stereo WAV encoder (44-byte RIFF header) —
    * deterministic payload source for the decode path above. */
  def encodeWav(sampleRate: Int, channels: Int,
                samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Resize stage: per-partition batch loop producing a reduced payload
    * + updated meta. Image payloads (PNG/BMP/GIF/JPEG — anything
    * javax.imageio decodes) get a REAL resize: deterministic
    * nearest-neighbor downsample — out(x,y) = in(x*factor, y*factor),
    * no AWT rendering-hint variance — re-encoded as PNG by the JDK
    * encoder. Non-image / undecodable payloads keep the labeled
    * byte-decimation STUB (every `factor`-th byte): audio/video
    * resampling has no JDK codec, but the partition-preserving batch
    * shape, payload rewrite, and meta update are shared with the real
    * path, so a codec swaps in without plan changes. */
  def resize(df: DataFrame, factor: Int, idCol: String = "media_id",
             blobCol: String = "payload"): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val src = df.select(col(idCol).cast("long"), col(blobCol))
    val out = src.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        val fmt = if (bytes == null) "unknown" else sniffFormat(bytes)
        val img =
          if (fmt == "unknown" || fmt == "wav" || fmt == "avi") null
          else readImage(bytes)
        val res =
          if (img != null) {
            val sw = img.getWidth
            val w = math.max(1, sw / factor)
            val h = math.max(1, img.getHeight / factor)
            val px = rgbRows(img)
            val outPx = new Array[Int](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                outPx(y * w + x) = px(y * factor * sw + x * factor)
                x += 1
              }
              y += 1
            }
            val outImg = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            outImg.setRGB(0, 0, w, h, outPx, 0, w)
            encodePngBytes(outImg)
          } else if (bytes == null) Array.empty[Byte]
          else {
            val n = (bytes.length + factor - 1) / factor
            val r = new Array[Byte](n)
            var i = 0
            while (i < n) { r(i) = bytes(i * factor); i += 1 }
            r
          }
        (id, res)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF(idCol, blobCol)
    withMediaMeta(out, blobCol)
  }

  /** REAL audio resample for WAV/PCM16 payloads: decode with
    * javax.sound.sampled, keep every `factor`-th FRAME (all channels of
    * it, preserving interleave), re-encode as PCM16LE WAV at
    * rate/factor — the audio twin of the image resize's deterministic
    * nearest-neighbor sampling (plain decimation, no low-pass: simple,
    * exact, oracle-checkable; an anti-aliased kernel drops into the
    * same frame loop). Non-WAV / non-16-bit payloads pass through
    * UNCHANGED — this stage only claims formats it really decodes. */
  def resampleAudio(df: DataFrame, factor: Int, idCol: String = "media_id",
                    blobCol: String = "payload"): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val src = df.select(col(idCol).cast("long"), col(blobCol))
    src.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        val out =
          if (sniffFormat(bytes) == "flac") try {
            // REAL FLAC resample: pure-JVM decode, frame decimation
            // (same keep-every-factor-th rule as the WAV branch),
            // re-encode losslessly
            val pcm = Flac.decodeFlacPcm(bytes)
            // 20/24-bit streams would wrap through .toShort and get
            // re-stamped bps=16 — those pass through unchanged instead
            require(pcm.bps == 16, s"non-16-bit FLAC (bps=${pcm.bps})")
            val ch = pcm.channels
            val nFrames = pcm.samples.length / ch
            val nOut = (nFrames + factor - 1) / factor
            val samples = new Array[Short](nOut * ch)
            var o = 0
            while (o < nOut) {
              var c = 0
              while (c < ch) {
                samples(o * ch + c) = pcm.samples(o * factor * ch + c).toShort
                c += 1
              }
              o += 1
            }
            Flac.encodeFlac(math.max(1, pcm.sampleRate / factor), ch, samples)
          } catch { case _: Exception => bytes }
          else if (sniffFormat(bytes) != "wav") bytes
          else try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val f = ais.getFormat
            val pcm16 = f.getSampleSizeInBits == 16 &&
              f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            val data = ais.readAllBytes()
            ais.close()
            if (!pcm16) bytes
            else {
              val ch = f.getChannels
              val big = f.isBigEndian
              val nFrames = data.length / (2 * ch)
              val nOut = (nFrames + factor - 1) / factor
              val samples = new Array[Short](nOut * ch)
              var o = 0
              while (o < nOut) {
                val base = o * factor * 2 * ch
                var c = 0
                while (c < ch) {
                  val lo = if (big) data(base + 2 * c + 1) else data(base + 2 * c)
                  val hi = if (big) data(base + 2 * c) else data(base + 2 * c + 1)
                  samples(o * ch + c) = (((hi << 8) | (lo & 0xff))).toShort
                  c += 1
                }
                o += 1
              }
              encodeWav(math.max(1, f.getSampleRate.toInt / factor), ch, samples)
            }
          } catch { case _: Exception => bytes }
        (id, out)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF(idCol, blobCol)
  }

  case class Mp3Info(media_id: Long, format: String, bitrate_kbps: Int,
                     sample_rate: Int, n_frames: Long, duration_ms: Long)

  /** MPEG-1 Layer III bitrate (kbps) and sample-rate tables, by header
    * index — the public ISO 11172-3 values. */
  private val Mp3Bitrate = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
    160, 192, 224, 256, 320, 0)
  private val Mp3SampleRate = Array(44100, 48000, 32000, 0)

  /** REAL MP3 container metadata via an MPEG frame-header WALK — no PCM
    * decode (the JDK has no MP3 codec; this parses what a demuxer
    * parses): resync to the 11-bit sync word, read version/layer/
    * bitrate/sample-rate/padding from each 4-byte header, hop
    * frameLen = 144*bitrate/sampleRate + padding bytes to the next
    * frame. Emits first-frame bitrate/rate, the frame count, and the
    * derived duration (1152 samples per MPEG-1 Layer III frame).
    * Payloads with no parseable frame report -1s. */
  def mp3Info(df: DataFrame, idCol: String = "media_id",
              blobCol: String = "payload"): DataFrame = {
    val src = df.select(col(idCol).cast("long"), col(blobCol))
    src.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val b = row.getAs[Array[Byte]](1)
        var pos = 0
        var n = 0L
        var firstBr = -1
        var firstSr = -1
        val len = if (b == null) 0 else b.length
        while (pos + 4 <= len) {
          val h0 = b(pos) & 0xff
          val h1 = b(pos + 1) & 0xff
          // MPEG-1 (version bits 11) Layer III (layer bits 01): header
          // 0xFF 0b111 1101 1 => second byte 0xFA or 0xFB
          if (h0 == 0xff && (h1 | 0x01) == 0xfb) {
            val brIdx = (b(pos + 2) & 0xf0) >>> 4
            val srIdx = (b(pos + 2) & 0x0c) >>> 2
            val pad = (b(pos + 2) & 0x02) >>> 1
            val br = Mp3Bitrate(brIdx)
            val sr = Mp3SampleRate(srIdx)
            if (br > 0 && sr > 0) {
              val flen = 144 * br * 1000 / sr + pad
              if (pos + flen <= len) {
                if (n == 0L) { firstBr = br; firstSr = sr }
                n += 1
                pos += flen
              } else pos = len // truncated tail frame: stop
            } else pos += 1 // bad indices: resync
          } else pos += 1 // junk: resync byte by byte
        }
        if (n == 0L) Mp3Info(id, "unknown", -1, -1, -1L, -1L)
        else Mp3Info(id, "mp3", firstBr, firstSr, n,
          n * 1152L * 1000L / firstSr)
      }
    }(Encoders.product[Mp3Info])
      .toDF(idCol, "format", "bitrate_kbps", "sample_rate", "n_frames",
        "duration_ms")
  }

  /** Deterministic MPEG-1 Layer III frame-stream generator (valid
    * headers, zeroed audio payload — [[mp3Info]] reads only headers):
    * frame f uses padding = padBit(f). */
  def encodeMp3Frames(nFrames: Int, bitrateIdx: Int, srIdx: Int,
                      padBit: Int => Int): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14 && srIdx >= 0 && srIdx <= 2)
    val br = Mp3Bitrate(bitrateIdx)
    val sr = Mp3SampleRate(srIdx)
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      val pad = padBit(f) & 1
      val flen = 144 * br * 1000 / sr + pad
      val frame = new Array[Byte](flen)
      frame(0) = 0xff.toByte
      frame(1) = 0xfb.toByte // MPEG-1, Layer III, no CRC
      frame(2) = ((bitrateIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
      frame(3) = 0
      out.write(frame)
      f += 1
    }
    out.toByteArray
  }

  case class OggInfo(media_id: Long, format: String, serial: Long,
                     n_pages: Long, final_granule: Long, payload_bytes: Long)

  /** REAL Ogg container metadata via a page WALK (RFC 3533 layout — no
    * codec decode): each 'OggS' capture pattern starts a 27-byte header
    * (version, type flags, 64-bit granule position, serial, sequence,
    * crc, segment count) followed by the segment table; the payload is
    * the sum of segment sizes. Emits the stream serial, page count,
    * final granule position (the duration carrier for Vorbis/Opus), and
    * total payload bytes. CRCs are not verified. */
  def oggInfo(df: DataFrame, idCol: String = "media_id",
              blobCol: String = "payload"): DataFrame = {
    val src = df.select(col(idCol).cast("long"), col(blobCol))
    src.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val b = row.getAs[Array[Byte]](1)
        val len = if (b == null) 0 else b.length
        val bb = if (len > 0) java.nio.ByteBuffer.wrap(b)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN) else null
        var pos = 0
        var pages = 0L
        var granule = -1L
        var serial = -1L
        var payload = 0L
        while (pos + 27 <= len) {
          if (b(pos) == 'O' && b(pos + 1) == 'g' && b(pos + 2) == 'g' &&
            b(pos + 3) == 'S' && b(pos + 4) == 0) {
            val nSeg = b(pos + 26) & 0xff
            if (pos + 27 + nSeg <= len) {
              var sz = 0
              var i = 0
              while (i < nSeg) { sz += b(pos + 27 + i) & 0xff; i += 1 }
              if (pos + 27 + nSeg + sz <= len) {
                granule = bb.getLong(pos + 6)
                serial = (bb.getInt(pos + 14) & 0xffffffffL)
                pages += 1
                payload += sz
                pos += 27 + nSeg + sz
              } else pos = len // truncated page: stop
            } else pos = len
          } else pos += 1 // resync
        }
        if (pages == 0L) OggInfo(id, "unknown", -1L, -1L, -1L, -1L)
        else OggInfo(id, "ogg", serial, pages, granule, payload)
      }
    }(Encoders.product[OggInfo])
      .toDF(idCol, "format", "serial", "n_pages", "final_granule",
        "payload_bytes")
  }

  /** Deterministic Ogg page-stream generator (RFC 3533 headers, zeroed
    * codec payload, CRC 0 — [[oggInfo]] reads structure only). Page p
    * carries `segs(p)` single segments of `segLen(p)` bytes and granule
    * position `granule(p)`. */
  def encodeOggPages(serial: Int, nPages: Int, segLen: Int => Int,
                     granule: Int => Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var p = 0
    while (p < nPages) {
      val sz = segLen(p)
      require(sz >= 0 && sz <= 255, "single-segment generator: 0..255")
      val hdr = java.nio.ByteBuffer.allocate(27 + 1)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      hdr.put("OggS".getBytes("US-ASCII")).put(0.toByte)
        .put((if (p == 0) 2 else if (p == nPages - 1) 4 else 0).toByte)
        .putLong(granule(p)).putInt(serial).putInt(p).putInt(0)
        .put(1.toByte).put(sz.toByte)
      out.write(hdr.array())
      out.write(new Array[Byte](sz))
      p += 1
    }
    out.toByteArray
  }

  /** Minimal AVI writer with uncompressed DIB ('00db') video frames —
    * the standard RIFF layout (hdrl LIST with avih/strh/strf, movi LIST
    * of frame chunks, idx1 index), 24-bit BI_RGB bottom-up rows exactly
    * like [[encodeBmp]]'s pixel array. Deterministic payload source for
    * the REAL container walk in [[sampleVideoFrames]]; `pix(f, x, y)`
    * colors frame f. */
  def encodeAviDib(width: Int, height: Int, nFrames: Int,
                   pix: (Int, Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = (width * 3 + 3) & ~3
    val frameBytes = rowBytes * height
    val strlSize = 4 + 64 + 48
    val hdrlSize = 4 + 64 + (8 + strlSize)
    val moviSize = 4 + nFrames * (8 + frameBytes)
    val idxSize = 16 * nFrames
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idxSize)
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); buf.putInt(riffSize); fourcc("AVI ")
    fourcc("LIST"); buf.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(40000).putInt(frameBytes * 25).putInt(0).putInt(0x10)
      .putInt(nFrames).putInt(0).putInt(1).putInt(frameBytes)
      .putInt(width).putInt(height).putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); buf.putInt(strlSize); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("DIB "); buf.putInt(0).putInt(0)
      .putInt(0).putInt(1).putInt(25).putInt(0).putInt(nFrames)
      .putInt(frameBytes).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
    fourcc("strf"); buf.putInt(40)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(frameBytes).putInt(2835).putInt(2835).putInt(0).putInt(0)
    fourcc("LIST"); buf.putInt(moviSize); fourcc("movi")
    var f = 0
    while (f < nFrames) {
      fourcc("00db"); buf.putInt(frameBytes)
      var y = height - 1 // bottom-up
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val (r, g, b) = pix(f, x, y)
          buf.put(b.toByte).put(g.toByte).put(r.toByte)
          x += 1
        }
        var p = width * 3
        while (p < rowBytes) { buf.put(0.toByte); p += 1 }
        y -= 1
      }
      f += 1
    }
    fourcc("idx1"); buf.putInt(idxSize)
    f = 0
    while (f < nFrames) {
      fourcc("00db"); buf.putInt(0x10)
        .putInt(4 + f * (8 + frameBytes)).putInt(frameBytes)
      f += 1
    }
    buf.array()
  }

  /** REAL video frame sampling for AVI payloads: walks the RIFF chunk
    * tree (LIST recursion, word alignment, declared sizes — not fixed
    * offsets), captures the stream format (strf BITMAPINFOHEADER), and
    * emits every `everyN`-th '..db' frame chunk re-wrapped as a
    * standalone BMP (14-byte file header + the captured info header +
    * the chunk's pixel array) so each frame feeds [[decodeImageInfo]]
    * or any downstream image stage directly. Compressed ('..dc') frames
    * and truncated/non-AVI payloads emit nothing — same corrupt-blob
    * tolerance as the decoders. */
  def sampleVideoFrames(df: DataFrame, everyN: Int,
                        idCol: String = "media_id",
                        blobCol: String = "payload"): DataFrame = {
    require(everyN >= 1, "everyN must be >= 1")
    val src = df.select(col(idCol).cast("long"), col(blobCol))
    src.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        if (sniffFormat(bytes) != "avi") Iterator.empty
        else try {
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          def cc(pos: Int): String =
            new String(bytes, pos, 4, "US-ASCII")
          val end = math.min(bytes.length.toLong, 8L + bb.getInt(4)).toInt
          var strf: Array[Byte] = null
          var frameIdx = 0
          // copy ONLY the sampled frames during the walk — an unsampled
          // frame never leaves the source buffer, so peak extra heap is
          // ~1/everyN of the movi payload, not a second full copy
          val sampled = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
          def walk(from: Int, to: Int): Unit = {
            var pos = from
            while (pos + 8 <= to) {
              val fid = cc(pos)
              val sz = bb.getInt(pos + 4)
              if (sz < 0 || pos + 8 + sz > to) return
              if (fid == "LIST" && sz >= 4) {
                walk(pos + 12, pos + 8 + sz)
              } else if (fid == "strf" && sz >= 40) {
                strf = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 48)
              } else if (fid.endsWith("db") && strf != null) {
                if (frameIdx % everyN == 0)
                  sampled += ((frameIdx,
                    java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + sz)))
                frameIdx += 1
              }
              pos += 8 + sz + (sz & 1)
            }
          }
          walk(12, end)
          val hdr = strf
          if (hdr == null) Iterator.empty
          else sampled.iterator.map { case (fi, data) =>
            val out = java.nio.ByteBuffer.allocate(54 + data.length)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            out.put('B'.toByte).put('M'.toByte).putInt(54 + data.length)
              .putInt(0).putInt(54).put(hdr).put(data)
            Frame(id, fi, out.array())
          }
        } catch { case _: Exception => Iterator.empty }
      }
    }(Encoders.product[Frame])
      .toDF(idCol, "frame_idx", "payload")
  }

  /** Video embedding: REAL AVI demux -> per-frame pixel features ->
    * mean-pool across the sampled frames -> re-L2-normalize. The
    * composition is fully distributed (frame explode, shuffle-free
    * per-frame decode, one aggregation per video) and lands in the same
    * unit-vector space as [[imageFeatures]], so videos, images, and
    * byte-content payloads ANN-join against each other. Videos with no
    * decodable frames emit nothing. */
  def videoFeatures(df: DataFrame, everyN: Int = 1, gridW: Int = 4,
                    gridH: Int = 4, idCol: String = "media_id",
                    blobCol: String = "payload"): DataFrame = {
    val dim = gridW * gridH
    val frames = sampleVideoFrames(df, everyN, idCol, blobCol)
    // pack frame identity so the per-frame extractor keeps one row per
    // frame, then mean-pool per video position-wise
    val packed = frames.select(
      (col(idCol) * 1000000L + col("frame_idx")).as(idCol), col(blobCol))
    val perFrame = imageFeatures(packed, gridW, gridH, idCol, blobCol)
    val pooled = perFrame
      .select(expr(s"$idCol div 1000000").as(idCol),
        posexplode(col("feature")).as(Seq("_p", "_v")))
      .groupBy(col(idCol), col("_p")).agg(avg(col("_v")).as("_m"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("_p"), col("_m")))).as("_s"))
      .select(col(idCol), transform(col("_s"), s => s.getField("_m"))
        .as("_mean"))
    val nrm = sqrt(aggregate(col("_mean"), lit(0.0d),
      (acc, x) => acc + x * x))
    pooled.select(col(idCol),
      transform(col("_mean"), v =>
        when(nrm > 0d, v / nrm).otherwise(lit(0.0d)).cast("float"))
        .as("feature"))
  }

  /** Frame sampling for RAW byte-stream payloads: one output row per
    * sampled chunk of `frameBytes`, every `everyN`-th frame. For real
    * containers use [[sampleVideoFrames]] (AVI walk); this slicer is the
    * labeled STUB shape for codecs with no JDK demuxer (mp4 etc.). */
  def sampleFrames(df: DataFrame, frameBytes: Int, everyN: Int,
                   idCol: String = "media_id",
                   blobCol: String = "payload"): DataFrame = {
    val src = df.select(col(idCol).cast("long"), col(blobCol))
    src.mapPartitions { it =>
      it.flatMap { row =>
        val id = row.getLong(0)
        val bytes = row.getAs[Array[Byte]](1)
        if (bytes == null) Iterator.empty
        else {
          val nFrames = bytes.length / frameBytes
          (0 until nFrames by everyN).iterator.map { fi =>
            Frame(id, fi, java.util.Arrays.copyOfRange(bytes,
              fi * frameBytes, (fi + 1) * frameBytes))
          }
        }
      }
    }(Encoders.product[Frame])
      .toDF(idCol, "frame_idx", "payload")
  }
}
