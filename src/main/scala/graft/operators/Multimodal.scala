package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support: media as opaque
  * `binary` columns with typed metadata structs, processed by
  * partition-batched transforms.
  *
  * Image, audio AND video decode are REAL, JDK-only codecs: PNG/JPEG/
  * BMP via `javax.imageio.ImageIO`, WAV (RIFF/PCM) via
  * `javax.sound.sampled.AudioSystem`, and MJPEG-AVI video via
  * [[MjpegAvi]] (RIFF chunk demux + ImageIO per-frame JPEG decode).
  * No third-party media library is needed. Containers the JDK cannot
  * demux (H.264 in MP4, ...) fall back to the clearly-marked
  * [[FakeCodec.sampleFrames]] byte-slice stand-in.
  *
  * Scale design: `mapPartitions` over an iterator (the Scala analogue of
  * mapInPandas batches) keeps memory bounded to one row's media buffer at
  * a time; media bytes never pass through a shuffle — derived features
  * (small structs) do. Partition sizing: media tables should be written
  * with `maxRecordsPerFile` tuned so one file ≈ one task's worth of
  * bytes.
  */
object Multimodal {

  /** Typed metadata carried next to every media column. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType), // image/audio/video
    StructField("format", StringType), // jpeg/png/wav/mp4…
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("sample_rate", IntegerType)))

  /** Canonical multimodal row: id + content + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", mediaMetaSchema)))

  /** Real JDK-only codecs. Every function is total: undecodable or empty
    * bytes yield zeroed stats rather than a task failure, so one corrupt
    * file can't kill a 100 TB scan (filter `width = 0` downstream to
    * quarantine).
    */
  object JdkCodec {
    // ImageIO defaults to a disk-backed stream cache; per-call temp files
    // would dominate decode cost for KB-sized images.
    ImageIO.setUseCache(false)

    /** Decode an image with ImageIO (PNG/JPEG/BMP/GIF): returns
      * (width, height, px_sum, mean_luma) where px_sum is the EXACT
      * integer sum over pixels of (r+g+b)/3 — an oracle-friendly
      * lossless-roundtrip witness — and mean_luma = px_sum/(w*h*255).
      */
    /** Null on empty/undecodable bytes instead of throwing — the
      * quarantine invariant every decode path shares.
      */
    def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
      if (bytes == null || bytes.isEmpty) null
      else
        try ImageIO.read(new ByteArrayInputStream(bytes))
        catch { case _: Exception => null }

    /** Constant-gray RGB image — shared by the image and video fixture
      * generators so their planted pixel semantics stay in sync.
      */
    def grayImage(w: Int, h: Int, g: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      img
    }

    /** dHash (difference hash): the standard perceptual image
      * fingerprint for near-dup detection (LAION-style multimodal
      * curation dedups crawled images exactly this way) — decode,
      * box-average the luma plane onto a 9×8 grid, and emit one bit
      * per horizontally adjacent cell pair: bit `y*8+x` is set iff
      * `cell(x,y) < cell(x+1,y)`. Gradient structure survives
      * re-encoding, resizing, and mild noise, so near-identical images
      * land within a few bits of hamming distance; 64 bits feed the
      * same pigeonhole banding machinery as text simhash.
      *
      * The downscale is an explicit integer box average (NOT
      * Graphics2D, whose interpolation is hint/platform-dependent):
      * deterministic everywhere, and exact on block-constant images —
      * the fixture/oracle lever. Images narrower than the grid sample
      * nearest pixels. Undecodable/empty bytes → null (the quarantine
      * convention).
      */
    def dHash64(bytes: Array[Byte]): java.lang.Long = {
      val img = readImage(bytes)
      if (img == null) null
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val cells = new Array[Double](9 * 8)
        var cy = 0
        while (cy < 8) {
          var cx = 0
          while (cx < 9) {
            val x0 = math.min(cx * w / 9, w - 1)
            val x1 = math.max(x0 + 1, (cx + 1) * w / 9)
            val y0 = math.min(cy * h / 8, h - 1)
            val y1 = math.max(y0 + 1, (cy + 1) * h / 8)
            var sum = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = px(y * w + x)
                sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
                x += 1
              }
              y += 1
            }
            cells(cy * 9 + cx) = sum.toDouble / ((x1 - x0).toLong * (y1 - y0))
            cx += 1
          }
          cy += 1
        }
        var fp = 0L
        var i = 0
        while (i < 64) {
          val cyy = i / 8; val cxx = i % 8
          if (cells(cyy * 9 + cxx) < cells(cyy * 9 + cxx + 1))
            fp |= 1L << i
          i += 1
        }
        java.lang.Long.valueOf(fp)
      }
    }

    /** Render a 64-bit code as a PNG whose [[dHash64]] is exactly that
      * code — the fixture side of the perceptual-dedup oracle gate
      * (the BiffFixture posture: bytes the reader didn't produce).
      * Each grid row walks luma from 128 by ±8 per planted bit
      * (set = brighter to the right = the dHash bit), rendered as
      * `sx`×`sy` constant blocks so the box average recovers cell
      * values exactly at any block scale.
      */
    def encodeCodedPng(code: Long, sx: Int, sy: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        9 * sx, 8 * sy, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var cy = 0
      while (cy < 8) {
        var luma = 128
        var cx = 0
        while (cx < 9) {
          val rgb = (luma << 16) | (luma << 8) | luma
          var y = cy * sy
          while (y < (cy + 1) * sy) {
            var x = cx * sx
            while (x < (cx + 1) * sx) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          if (cx < 8)
            luma += (if (((code >>> (cy * 8 + cx)) & 1L) == 1L) 8 else -8)
          cx += 1
        }
        cy += 1
      }
      encodePng(img)
    }

    def encodeJpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }

    def decodeImage(bytes: Array[Byte]): (Int, Int, Long, Double) = {
      val img = readImage(bytes)
      if (img == null) (0, 0, 0L, 0.0)
      else {
        val w = img.getWidth
        val h = img.getHeight
        // one bulk getRGB: the per-pixel accessor pays a ColorModel
        // conversion per call — ~10× slower on real-sized photos
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var pxSum = 0L
        var i = 0
        while (i < px.length) {
          val rgb = px(i)
          pxSum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
          i += 1
        }
        (w, h, pxSum, pxSum.toDouble / (w.toLong * h * 255))
      }
    }

    /** Decode a WAV (RIFF/PCM16 mono LE) with javax.sound: returns
      * (duration_ms, sample_rate, abs_sum, rms). abs_sum is the EXACT
      * integer sum of |sample| (oracle witness); rms is normalized to
      * [0,1] by full scale (32768).
      */
    def decodeAudio(bytes: Array[Byte]): (Long, Int, Long, Double) = {
      if (bytes == null || bytes.length < 44) (0L, 0, 0L, 0.0)
      else
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(bytes))
          try {
            val fmt = in.getFormat
            // the sample loop below reinterprets raw bytes as 16-bit
            // signed LE; any other valid WAV flavor (8/24-bit, float,
            // big-endian) must quarantine as zeroed, not emit
            // plausible-looking garbage stats
            if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16 || fmt.isBigEndian)
              return (0L, 0, 0L, 0.0)
            val rate = fmt.getSampleRate.toInt
            val durationMs =
              if (rate > 0) in.getFrameLength * 1000L / rate else 0L
            val data = in.readAllBytes()
            var i = 0
            var absSum = 0L
            var sq = 0.0
            var n = 0
            while (i + 1 < data.length) {
              val s = (((data(i) & 0xff) | (data(i + 1) << 8)).toShort).toInt
              absSum += math.abs(s)
              sq += s.toDouble * s
              n += 1
              i += 2
            }
            val rms = if (n == 0) 0.0 else math.sqrt(sq / n) / 32768.0
            (durationMs, rate, absSum, rms)
          } finally in.close()
        } catch { case _: Exception => (0L, 0, 0L, 0.0) }
    }

    /** Audio perceptual fingerprint — the waveform sibling of
      * [[dHash64]] (the chromaprint/echoprint family's core move:
      * hash the SIGN of energy deltas, not the energies): decode
      * PCM16 WAV, box-average the |sample| envelope onto 65 equal
      * windows, and emit one bit per adjacent window pair — bit `i`
      * is set iff `env(i) < env(i+1)`. Sign-of-delta is invariant to
      * uniform gain and robust to mild noise, so re-encoded /
      * re-leveled copies land within a few hamming bits; 64 bits feed
      * the same pigeonhole banding as text simhash and image dHash.
      * Non-PCM16/undecodable/too-short (< 65 samples) audio → null
      * (the quarantine convention).
      */
    def audioHash64(bytes: Array[Byte]): java.lang.Long = {
      val data = pcm16Samples(bytes)
      if (data == null) null else envHash64(data, 0, data.length / 2)
    }

    /** Decode to raw little-endian PCM16 sample bytes, or null for
      * non-PCM16/undecodable input (the quarantine convention).
      */
    private def pcm16Samples(bytes: Array[Byte]): Array[Byte] = {
      if (bytes == null || bytes.length < 44) return null
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) return null
          in.readAllBytes()
        } finally in.close()
      } catch { case _: Exception => null }
    }

    /** The 65-window sign-of-delta energy hash over samples
      * `[sampleOff, sampleOff + n)` of a PCM16 byte array; null when
      * the range is too short to carry 65 windows.
      */
    private def envHash64(
        data: Array[Byte], sampleOff: Int, n: Int): java.lang.Long = {
      if (n < 65) return null
      val env = new Array[Double](65)
      var w = 0
      while (w < 65) {
        val i0 = sampleOff + (w.toLong * n / 65).toInt
        val i1 = math.max(i0 + 1, sampleOff + ((w + 1).toLong * n / 65).toInt)
        var sum = 0L
        var i = i0
        while (i < i1) {
          val s = (((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort).toInt
          sum += math.abs(s)
          i += 1
        }
        env(w) = sum.toDouble / (i1 - i0)
        w += 1
      }
      var fp = 0L
      var b = 0
      while (b < 64) {
        if (env(b) < env(b + 1)) fp |= 1L << b
        b += 1
      }
      java.lang.Long.valueOf(fp)
    }

    /** Windowed variant of [[audioHash64]] for LONG clips: one energy
      * hash per FIXED-length segment of `segSamples` samples (first
      * `maxSegments` full segments; a clip shorter than one segment
      * but ≥ 65 samples yields a single whole-clip segment, so short
      * clips keep an identity). Fixed-duration anchoring is the point:
      * a copy with an appended/padded tail shares every complete
      * leading segment, where the whole-clip hash (65 windows
      * stretched over the new length) shifts entirely. Returns
      * (segment index, fp) pairs; empty for quarantined audio.
      */
    def audioHash64Windows(
        bytes: Array[Byte], segSamples: Int,
        maxSegments: Int): Seq[(Int, Long)] = {
      require(segSamples >= 65, "segSamples must be >= 65")
      require(maxSegments > 0, "maxSegments must be positive")
      val data = pcm16Samples(bytes)
      if (data == null) return Seq.empty
      val n = data.length / 2
      val full = math.min(maxSegments, n / segSamples)
      if (full == 0)
        Option(envHash64(data, 0, n)).map(fp => (0, fp.longValue())).toSeq
      else (0 until full).flatMap { s =>
        Option(envHash64(data, s * segSamples, segSamples))
          .map(fp => (s, fp.longValue()))
      }
    }

    /** Render a 64-bit code as a WAV whose [[audioHash64]] is exactly
      * that code (the [[encodeCodedPng]] posture for audio): 65
      * windows of `winLen` samples, each a ±A square wave whose
      * amplitude walks ×/÷1.05 per planted bit from 1000 — a
      * MULTIPLICATIVE walk, because 64 additive steps either overflow
      * int16 or cross zero (where the |sample| envelope stops tracking
      * the bits); 1000·1.05^±64 stays in [44, 22800] and each step
      * moves the envelope by ≥ 2 counts, far above rounding.
      */
    def encodeCodedWav(code: Long, sampleRate: Int, winLen: Int): Array[Byte] = {
      val samples = new Array[Short](65 * winLen)
      var amp = 1000.0
      var w = 0
      while (w < 65) {
        val a = math.round(amp).toInt
        var i = 0
        while (i < winLen) {
          // alternate sign every 4 samples: a square wave, not DC
          val sign = if ((i / 4) % 2 == 0) 1 else -1
          samples(w * winLen + i) = (a * sign).toShort
          i += 1
        }
        if (w < 64) amp *= (if (((code >>> w) & 1L) == 1L) 1.05 else 1 / 1.05)
        w += 1
      }
      encodeWav(sampleRate, samples)
    }

    /** Render a SEQUENCE of 64-bit codes as one WAV of concatenated
      * equal-length coded segments (65·`winLen` samples each), so
      * [[audioHash64Windows]] at `segSamples = 65 * winLen` recovers
      * exactly `codes(i)` for segment `i` — the planted-truth fixture
      * for windowed audio dedup.
      */
    def encodeCodedWavSegments(
        codes: Seq[Long], sampleRate: Int, winLen: Int): Array[Byte] = {
      val seg = 65 * winLen
      val samples = new Array[Short](codes.length * seg)
      codes.zipWithIndex.foreach { case (code, s) =>
        var amp = 1000.0
        var w = 0
        while (w < 65) {
          val a = math.round(amp).toInt
          var i = 0
          while (i < winLen) {
            val sign = if ((i / 4) % 2 == 0) 1 else -1
            samples(s * seg + w * winLen + i) = (a * sign).toShort
            i += 1
          }
          if (w < 64) amp *= (if (((code >>> w) & 1L) == 1L) 1.05 else 1 / 1.05)
          w += 1
        }
      }
      encodeWav(sampleRate, samples)
    }

    /** Real feature extraction: a d-bin luma histogram of the decoded
      * image, L1-normalized — the classic pre-neural image descriptor.
      * Undecodable bytes yield the zero vector.
      */
    def featurize(bytes: Array[Byte], d: Int): Array[Float] = {
      val out = new Array[Float](d)
      val img =
        if (bytes == null || bytes.isEmpty) null
        else
          try ImageIO.read(new ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
      if (img != null) {
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w) // bulk: see decodeImage
        var i = 0
        while (i < px.length) {
          val rgb = px(i)
          val luma = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
          out(luma * d / 256) += 1f
          i += 1
        }
        val n = (w.toLong * h).toFloat
        var j = 0
        while (j < d) { out(j) /= n; j += 1 }
      }
      out
    }

    /** Real resize: Graphics2D bilinear scale, re-encoded as PNG.
      * Undecodable input yields an empty buffer (quarantine downstream).
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val img =
        if (bytes == null || bytes.isEmpty) null
        else
          try ImageIO.read(new ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
      if (img == null) Array.emptyByteArray
      else {
        val dst = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        encodePng(dst)
      }
    }

    /** Encode a BufferedImage as PNG bytes (lossless). */
    def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Build a real PCM16 mono LE WAV file byte-for-byte (RIFF header +
      * fmt + data chunks) — AudioSystem reads it back.
      */
    def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val buf = java.nio.ByteBuffer
        .allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2) // byte rate
        .putShort(2) // block align
        .putShort(16) // bits/sample
      buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
      buf.array()
    }
  }

  /** ======= STUB: non-MJPEG video stand-in =======
    * MJPEG-AVI demuxes for real ([[MjpegAvi]]); every OTHER container
    * (H.264/MP4, VP9/WebM, ...) has no JDK demuxer, so for those
    * frame sampling falls back to this deterministic fake (byte-range
    * slices standing in for decoded frames). A production build swaps
    * ONLY this object for an ffmpeg-backed one; the distributed shape
    * (flatMap, one row per frame) is real either way.
    */
  object FakeCodec {
    /** "Sample frames": k deterministic offsets into a video buffer. */
    def sampleFrames(bytes: Array[Byte], k: Int): Seq[Array[Byte]] = {
      if (bytes == null || bytes.isEmpty) Seq.fill(k)(Array.emptyByteArray)
      else (0 until k).map { i =>
        val start = (bytes.length.toLong * i / k).toInt
        val end = (bytes.length.toLong * (i + 1) / k).toInt
        java.util.Arrays.copyOfRange(bytes, start, math.max(end, start + 1))
      }
    }
  }

  /** Ingest a directory of media files as the canonical schema: each
    * file row (from the binaryFile source) becomes (media_id from a
    * path hash, content, metadata shell). The decode/featurize stages
    * fill in the typed metadata.
    *
    * media_id is xxhash64(path): at ~1e9 files the 64-bit birthday
    * collision odds reach the low percents — corpora at that scale
    * should key joins on `path` itself (carry it through) or widen the
    * id to a 128-bit digest pair.
    */
  def fromBinaryFiles(spark: SparkSession, path: String, mediaType: String = "image",
      globFilter: Option[String] = None): DataFrame =
    graft.ingest.Readers.binaryFiles(spark, path, globFilter)
      .select(
        xxhash64(col("path")).as("media_id"),
        col("content"),
        struct(
          lit(mediaType).as("media_type"),
          lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)).as("format"),
          lit(null).cast("int").as("width"),
          lit(null).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms"),
          lit(null).cast("int").as("sample_rate")).as("meta"))

  /** Build an opaque synthetic media table from any id-bearing table —
    * deterministic pseudo-bytes from the id. Used as the VIDEO stand-in
    * (frame sampling slices raw bytes); for image/audio use
    * [[syntheticImages]]/[[syntheticAudio]], which emit real encodings.
    */
  def syntheticMedia(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame =
    ids.select(
      col(idCol).cast("long").as("media_id"),
      // deterministic pseudo-bytes: sha2 of the id, repeated
      to_binary(repeat(sha2(col(idCol).cast("string"), 256), 4), lit("hex")).as("content"),
      struct(
        lit("video").as("media_type"),
        lit("fake").as("format"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit(null).cast("int").as("sample_rate")).as("meta"))

  /** Deterministic REAL-PNG media table: per id, a (4 + id%13) ×
    * (3 + id%11) image filled with constant gray (id%256), encoded by
    * ImageIO. The closed-form dims/pixel-sum make decode gates
    * integer-exact and DuckDB-expressible:
    * px_sum = (4 + id%13) * (3 + id%11) * (id%256).
    */
  def syntheticImages(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.row(mediaSchema)
    ids.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          // floorMod: Scala % preserves sign — a negative id would ask
          // BufferedImage for negative dims and kill the task
          val w = 4 + java.lang.Math.floorMod(id, 13L).toInt
          val h = 3 + java.lang.Math.floorMod(id, 11L).toInt
          val g = java.lang.Math.floorMod(id, 256L).toInt
          Row(id, JdkCodec.encodePng(JdkCodec.grayImage(w, h, g)),
            Row("image", "png", w, h, null, null))
        }
      }(enc)
  }

  /** Deterministic REAL-WAV media table: per id, a PCM16 mono square
    * wave — rate ∈ {8000,16000,44100} by id%3, 100 + id%2000 samples,
    * amplitude 1000 + id%5000. Closed-form witnesses for the oracle:
    * duration_ms = n*1000 // rate, abs_sum = n * amplitude.
    */
  def syntheticAudio(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.row(mediaSchema)
    ids.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val rate = java.lang.Math.floorMod(id, 3L) match { // floorMod: sign-safe
            case 0 => 8000
            case 1 => 16000
            case _ => 44100
          }
          val n = 100 + java.lang.Math.floorMod(id, 2000L).toInt
          val amp = (1000 + java.lang.Math.floorMod(id, 5000L)).toShort
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = if (i % 2 == 0) amp else (-amp).toShort
            i += 1
          }
          Row(id, JdkCodec.encodeWav(rate, samples),
            Row("audio", "wav", null, null, n * 1000L / rate, rate))
        }
      }(enc)
  }

  private val decodedSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("px_sum", LongType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)))

  /** Decode pass: binary → (width, height, px_sum, mean_luma), real
    * ImageIO decode, partition-batched. The mapPartitions body sees an
    * iterator — constant memory per task regardless of partition row
    * count. Undecodable rows come back zeroed (width = 0), never failed.
    */
  def decodeImages(media: DataFrame): DataFrame = {
    val enc = Encoders.row(decodedSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, pxSum, luma) = JdkCodec.decodeImage(bytes)
          Row(id, w, h, pxSum, luma)
        }
      }(enc)
  }

  private val fingerprintSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("fp", LongType, nullable = true)))

  /** Perceptual fingerprint pass: `(media_id, content)` →
    * `(id, fp)` 64-bit [[JdkCodec.dHash64]] per image; undecodable
    * bytes fingerprint as null (quarantine — they join nothing
    * downstream). Narrow scan-bound work, one decode per image.
    */
  def imageFingerprints(media: DataFrame): DataFrame = {
    val enc = Encoders.row(fingerprintSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { it =>
        it.map { r =>
          Row(r.getLong(0), JdkCodec.dHash64(r.getAs[Array[Byte]](1)))
        }
      }(enc)
  }

  /** Image near-dup pairs — the LAION-style multimodal dedup step:
    * [[imageFingerprints]] (dHash) + the SAME pigeonhole hamming
    * banding as text simhash ([[Dedup.simhashPairs]]: fingerprints
    * within hamming `maxHamming` must share one of `maxHamming + 1`
    * equal 64/(k+1)-bit chunks — exact, never all-pairs). Emits
    * `(id_a, id_b, hamming)`; compose with [[Dedup.clusters]] for
    * transitive survivor selection. Undecodable images never pair.
    *
    * Scale: one decode scan + the banded self-join on chunk buckets —
    * the identical shuffle shape as text simhash dedup, with the same
    * flood guards ([[Dedup.simhashPairs]]'s identity pre-collapse and
    * bucket valve): distinct solid-color images all dHash to one
    * constant, so identical-fingerprint floods are endemic on natural
    * crawls — oversized identity groups emit star edges instead of the
    * clique, hot chunk buckets drop. No cache here: simhashPairs
    * caches its identity-annotated frame, so each image decodes once.
    */
  def imageNearDups(media: DataFrame, maxHamming: Int = 3): DataFrame =
    Dedup.simhashPairs(
      imageFingerprints(media).filter(col("fp").isNotNull),
      maxHamming)

  /** Audio perceptual fingerprint pass — [[JdkCodec.audioHash64]] per
    * clip; non-PCM16/undecodable audio fingerprints as null.
    */
  def audioFingerprints(media: DataFrame): DataFrame = {
    val enc = Encoders.row(fingerprintSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { it =>
        it.map { r =>
          Row(r.getLong(0), JdkCodec.audioHash64(r.getAs[Array[Byte]](1)))
        }
      }(enc)
  }

  /** Audio near-dup pairs — [[imageNearDups]]' waveform sibling: one
    * decode scan + the SAME pigeonhole hamming banding
    * ([[Dedup.simhashPairs]]); re-encoded / re-leveled copies of a
    * clip pair, structurally different audio doesn't. Emits
    * `(id_a, id_b, hamming)`; compose [[Dedup.clusters]] for
    * survivors. Flood guards apply (the [[imageNearDups]] note): every
    * silent / near-silent clip energy-hashes to the sign-of-zero-delta
    * constant, so the identity pre-collapse is what keeps a quiet-clip
    * flood linear.
    */
  def audioNearDups(media: DataFrame, maxHamming: Int = 3): DataFrame =
    Dedup.simhashPairs(
      audioFingerprints(media).filter(col("fp").isNotNull),
      maxHamming)

  private val audioSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("abs_sum", LongType, nullable = false),
    StructField("rms", DoubleType, nullable = false)))

  /** Audio decode pass: binary → (duration_ms, sample_rate, abs_sum,
    * rms) via javax.sound WAV parsing — the waveform-stats stage of an
    * audio pipeline (language/quality filters key off duration and
    * loudness before any transcription).
    */
  def decodeAudio(media: DataFrame): DataFrame = {
    val enc = Encoders.row(audioSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { it =>
        it.map { r =>
          val (d, sr, absSum, rms) = JdkCodec.decodeAudio(r.getAs[Array[Byte]](1))
          Row(r.getLong(0), d, sr, absSum, rms)
        }
      }(enc)
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Feature-extraction pass: binary → embedding array<float> (real
    * luma-histogram descriptor). The output feeds
    * graft.operators.Similarity directly.
    */
  def featurize(media: DataFrame, dim: Int = 16): DataFrame = {
    val enc = Encoders.row(featureSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { it =>
        it.map { r =>
          Row(r.getLong(0), JdkCodec.featurize(r.getAs[Array[Byte]](1), dim).toIndexedSeq)
        }
      }(enc)
  }

  /** Resize pass: content replaced by the re-encoded PNG at (w,h),
    * metadata updated — a real binary-in/binary-out stage.
    */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val enc = Encoders.row(mediaSchema)
    media.select(col("media_id"), col("content"), col("meta"))
      .mapPartitions { it =>
        it.map { r =>
          val resized = JdkCodec.resize(r.getAs[Array[Byte]](1), w, h)
          // meta is nullable in mediaSchema — build a fresh shell then
          val meta = r.getStruct(2)
          val newMeta =
            if (meta == null) Row(null, "png", w, h, null, null)
            else Row(meta.get(0), "png", w, h, meta.get(4), meta.get(5))
          Row(r.getLong(0), resized, newMeta)
        }
      }(enc)
  }

  private val frameSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** Frame-sampling pass: one row per sampled frame (flatMap shape).
    * MJPEG-AVI content demuxes for REAL ([[MjpegAvi.frames]]: RIFF
    * chunk walk, each frame a whole ImageIO-decodable JPEG), sampled
    * at k evenly-spaced stream positions floor(n·i/k).
    *
    * Other containers have no JDK demuxer: by default they raise a
    * typed unsupported-container error — a user must never mistake the
    * [[FakeCodec]] byte-slice stand-in for decoded frames on real
    * data. `allowStandIn = true` is the explicit opt-in for tests and
    * synthetic pipelines that knowingly process fake media bytes.
    */
  def sampleFrames(media: DataFrame, k: Int,
      allowStandIn: Boolean = false): DataFrame = {
    val enc = Encoders.row(frameSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val sampled =
            if (MjpegAvi.isAvi(bytes)) {
              val all = MjpegAvi.frames(bytes)
              val n = all.length
              // n <= k: every frame (a k-divisor would re-pick frame 0
              // and silently drop the tail); n > k: k evenly spaced
              if (n <= k) all
              else (0 until k).map(i => all((n.toLong * i / k).toInt))
            } else if (allowStandIn) {
              FakeCodec.sampleFrames(bytes, k) // explicit stand-in opt-in
            } else {
              throw new UnsupportedOperationException(
                s"unsupported video container for media_id=$id: only MJPEG-AVI " +
                  "(RIFF 'AVI ') demuxes on a bare JVM. Transcode to MJPEG-AVI, " +
                  "or pass allowStandIn = true to substitute deterministic " +
                  "byte-slice stand-in frames (synthetic pipelines/tests only).")
            }
          sampled.zipWithIndex.map { case (f, i) => Row(id, i, f) }
        }
      }(enc)
  }

  /** Deterministic REAL-VIDEO media table: per id, an MJPEG AVI with
    * 3 + id%5 frames of (4 + id%13) × (3 + id%11) gray JPEGs. The
    * frame COUNT and DIMENSIONS are closed-form (container metadata +
    * JPEG headers decode exactly), which is what the oracle checks;
    * pixel values go through lossy JPEG and are spec-checked only.
    */
  def syntheticVideos(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.row(mediaSchema)
    ids.select(col(idCol).cast("long").as("media_id"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val w = 4 + java.lang.Math.floorMod(id, 13L).toInt
          val h = 3 + java.lang.Math.floorMod(id, 11L).toInt
          val g = java.lang.Math.floorMod(id, 256L).toInt
          val nFrames = 3 + java.lang.Math.floorMod(id, 5L).toInt
          // frames are identical per id — encode once, the container
          // copies the bytes per chunk anyway
          val jpeg = JdkCodec.encodeJpeg(JdkCodec.grayImage(w, h, g))
          val frames = Seq.fill(nFrames)(jpeg)
          Row(id, MjpegAvi.encode(frames, w, h),
            Row("video", "avi", w, h, nFrames * 100L, null))
        }
      }(enc)
  }

  /** Per-frame dimension decode: sampled frames → (media_id,
    * frame_idx, width, height) via ImageIO JPEG header decode — the
    * integer-exact witnesses the q104 oracle re-derives in closed
    * form.
    */
  def decodeFrameDims(frames: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    val enc = Encoders.row(schema)
    frames.mapPartitions { it =>
      it.flatMap { r =>
        // JdkCodec.readImage: null (frame skipped), never a thrown
        // decode error — one malformed frame can't kill a 100 TB scan
        val img = JdkCodec.readImage(r.getAs[Array[Byte]](2))
        if (img == null) None
        else Some(Row(r.getLong(0), r.getInt(1), img.getWidth, img.getHeight))
      }
    }(enc)
  }

  private val videoFpSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = true)))

  /** Per-video perceptual fingerprint pass: demux ([[MjpegAvi.frames]])
    * → sample k evenly spaced frames (the [[sampleFrames]] positions)
    * → [[JdkCodec.dHash64]] per frame → `(media_id, frame_idx, fp)`.
    * One narrow scan: demux + decode + hash fuse into a single
    * mapPartitions pass; no intermediate frame blobs shuffle anywhere.
    *
    * QUARANTINE posture (deliberately unlike [[sampleFrames]]' typed
    * non-AVI error): this feeds DEDUP, where the correct treatment of
    * an undemuxable container or undecodable frame is "no perceptual
    * identity — never pairs, always admitted", same as null text /
    * undecodable images. A crawl shard with one broken file must not
    * kill the scan. `allowStandIn = true` substitutes the documented
    * byte-slice stand-in frames for non-AVI bytes (synthetic
    * pipelines/tests only).
    */
  def videoFingerprints(
      media: DataFrame, k: Int = 8, allowStandIn: Boolean = false): DataFrame = {
    require(k > 0, "k must be positive")
    val enc = Encoders.row(videoFpSchema)
    // stable per-(k, allowStandIn) function INSTANCE (round 20): a
    // per-call lambda makes every invocation's MapPartitions node
    // compare unequal (plan equality includes the function
    // reference), defeating ProbeMemo/CacheManager reuse across
    // repeated constructions of the same pipeline
    val fn = videoFpFns.computeIfAbsent((k, allowStandIn),
      _ => new VideoFpFn(k, allowStandIn))
    media.select(col("media_id"), col("content")).mapPartitions(fn)(enc)
  }

  private final class VideoFpFn(k: Int, allowStandIn: Boolean)
      extends (Iterator[Row] => Iterator[Row]) with Serializable {
    def apply(it: Iterator[Row]): Iterator[Row] =
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val sampled: Seq[Array[Byte]] =
          if (MjpegAvi.isAvi(bytes)) {
            val all = MjpegAvi.frames(bytes)
            val n = all.length
            if (n <= k) all
            else (0 until k).map(i => all((n.toLong * i / k).toInt))
          } else if (allowStandIn) FakeCodec.sampleFrames(bytes, k)
          else Seq.empty // quarantine: no frames, no pairs
        sampled.iterator.zipWithIndex.flatMap { case (f, i) =>
          Option(JdkCodec.dHash64(f)).map(fp => Row(id, i, fp.longValue()))
        }
      }
  }

  private val videoFpFns =
    new java.util.concurrent.ConcurrentHashMap[(Int, Boolean), VideoFpFn]()

  /** Video perceptual near-dup pairs — the frame-evidence composition
    * of the image path: two videos pair when at least `minMatches` of
    * their sampled frames pair within `maxHamming` (re-encodes,
    * rescales, and re-containered copies share most frames; unrelated
    * videos share none). Pipeline: [[videoFingerprints]] → the SAME
    * pigeonhole hamming banding as image/text
    * ([[Dedup.simhashPairs]] over composite `media_id·k + frame_idx`
    * keys — exact, never all-pairs) → per-video-pair evidence count.
    * Emits `(id_a, id_b, n_matched)`, `id_a < id_b`; compose
    * [[Dedup.clusters]] for transitive survivor selection.
    *
    * Scale: one demux+decode+hash scan, the chunk-bucket self-join
    * (the simhash hot-bucket reasoning applies per FRAME), then a
    * groupBy on video pairs whose input is already pair-pruned by the
    * banding — the evidence aggregation shuffles only qualifying
    * frame pairs, never the frame population. `maxFrameDf` is the
    * boilerplate-frame guard (see [[frameEvidencePairs]]): fade-to-
    * black and solid-color frames are shared by unbounded numbers of
    * DISTINCT videos on natural crawls and carry no dup evidence;
    * `maxBucket` is the chunk-bucket flood valve of the banding (the
    * [[Dedup.simhashPairs]] knob and default).
    * Requires `0 ≤ media_id ≤ Long.MaxValue / k` (the composite key is
    * `media_id * k + frame_idx`; out-of-range ids raise).
    */
  def videoNearDups(
      media: DataFrame,
      k: Int = 8,
      maxHamming: Int = 3,
      minMatches: Int = 2,
      allowStandIn: Boolean = false,
      maxFrameDf: Int = 100,
      maxBucket: Int = 2000): DataFrame = {
    require(k > 0, "k must be positive")
    frameEvidencePairs(
      videoFingerprints(media, k, allowStandIn), k.toLong,
      maxHamming, minMatches, maxFrameDf, maxBucket)
  }

  /** The shared frame/segment-evidence near-dup core: `(media_id,
    * frame_idx, fp)` rows → document-frequency frame cap →
    * pigeonhole-banded hamming pairs over composite
    * `media_id·stride + frame_idx` keys → per-media-pair evidence
    * count ≥ `minMatches`. `stride` must exceed every `frame_idx`;
    * composite `id_a < id_b` with distinct media ids implies
    * `id_a < id_b` on the media ids (frame_idx < stride), so the
    * emitted pairs keep the `id_a < id_b` convention.
    *
    * COMPOSITE-KEY CONTRACT: requires `0 ≤ media_id ≤
    * Long.MaxValue / stride` — a larger id would overflow the
    * composite key and silently scramble the banding and the
    * `id_a < id_b` / media-division invariants, so out-of-range ids
    * RAISE (a codegen'd guard in the composite projection, not a
    * silent wrap).
    *
    * BOILERPLATE-FRAME GUARD (`maxFrameDf`): a fingerprint carried by
    * more than `maxFrameDf` DISTINCT media is structure, not dup
    * evidence — fade-to-black frames, solid title cards, silence
    * segments appear across unbounded numbers of unrelated items, and
    * counting them as evidence both floods the pair join (quadratic in
    * the flood size) and mis-links unrelated media. Frames over the
    * cap are dropped before banding (the stopword rationale of
    * [[Dedup.minhashCandidates]]' `maxBucket`). `maxBucket` is the
    * chunk-bucket flood valve, the same knob (and default) as
    * [[Dedup.simhashPairs]] — a corpus with unusual frame-fingerprint
    * concentration tunes it here instead of editing code. Below the
    * df cap the
    * evidence count stays EXACT: the df bound caps every identity
    * group at `maxFrameDf · stride` rows, so [[Dedup.simhashPairs]]'
    * identity pre-collapse (which would undercount evidence) stays
    * OFF — it could never engage on surviving frames. Pass
    * `Int.MaxValue` to disable the df cap itself. The df cap and the
    * bucket-valve census are FUSED into one bounded probe job (see
    * the body comment); like [[Dedup.simhashPairs]], this operator is
    * mildly eager.
    */
  private[graft] def frameEvidencePairs(
      frames: DataFrame,
      stride: Long,
      maxHamming: Int,
      minMatches: Int,
      maxFrameDf: Int = 100,
      maxBucket: Int = 2000): DataFrame = {
    require(minMatches > 0, "minMatches must be positive")
    require(maxFrameDf >= 1, "maxFrameDf must be positive")
    require(maxBucket >= 1, "maxBucket must be positive")
    // cache: the frame table feeds both the guard probe and the pair
    // path; uncached, every item demuxes+decodes twice (caller
    // releases via Caches.release())
    val f = graft.ops.Caches.owned(
      frames.select(col("media_id"), col("frame_idx"), col("fp")))
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    val mask = if (bitsPer == 64) -1L else (1L << bitsPer) - 1
    // FUSED GUARD PROBE (round 18): the df cap and the bucket-valve
    // census ride ONE aggregate job — each frame row emits its
    // fingerprint key (distinct-media df) plus its `chunks` chunk keys
    // (raw bucket census) into a single groupBy, and the driver
    // corrects each raw-hot bucket to its post-cap population by
    // subtracting the over-cap fingerprints' rows (removal only
    // shrinks counts, so raw-hot is a superset — the correction is
    // exact). Previously the cap (count_distinct + semi-join) and the
    // census (inside simhashPairs) were separate jobs, each a fixed
    // ~0.5-1 s of stages per call. The identity window stays OFF
    // (maxIdentity could never engage: the df cap bounds every
    // surviving identity group at maxFrameDf·stride).
    val spark = f.sparkSession
    import spark.implicits._
    val fpKey = struct(lit(0).as("k"), lit(-1).as("c"), col("fp").as("v"))
    val chunkKeys = (0 until chunks).map(c =>
      struct(lit(1).as("k"), lit(c).as("c"),
        call_function("shiftrightunsigned", col("fp"), lit(c * bitsPer))
          .bitwiseAND(lit(mask)).as("v")))
    val keys =
      if (maxFrameDf == Int.MaxValue) chunkKeys else fpKey +: chunkKeys
    // probe result memoized per (frame plan, knobs) for the process
    // (round 20, the simhashPairs posture — see ProbeMemo's contract):
    // bench reps and repeated passes over one frame corpus re-used to
    // pay the probe job each call
    val (overFps, hotBuckets): (Seq[(Long, Long)], Seq[(Int, Long)]) =
      graft.ops.ProbeMemo.cached(
        f, s"frameEvidence:$stride:$maxHamming:$maxFrameDf:$maxBucket") {
      val probe = f
        .select(col("media_id"), explode(array(keys: _*)).as("kk"))
        .groupBy(col("kk.k").as("k"), col("kk.c").as("c"), col("kk.v").as("v"))
        .agg(count(lit(1)).as("_n"),
          count_distinct(when(col("kk.k") === 0, col("media_id"))).as("_dm"))
        .filter((col("k") === 0 && col("_dm") > maxFrameDf) ||
          (col("k") === 1 && col("_n") > maxBucket))
        .collect()
      // (fp, total rows) of every over-cap boilerplate fingerprint
      val over = probe.filter(_.getInt(0) == 0)
        .map(r => (r.getLong(2), r.getLong(3))).toSeq
      val hot = probe.filter(_.getInt(0) == 1).flatMap { r =>
        val c = r.getInt(1); val v = r.getLong(2); val raw = r.getLong(3)
        val removed = over.iterator
          .filter { case (fp, _) => ((fp >>> (c * bitsPer)) & mask) == v }
          .map(_._2).sum
        if (raw - removed > maxBucket) Some((c, v)) else None
      }.toSeq
      (over, hot)
    }
    val capped =
      if (overFps.isEmpty) f
      else f.join(broadcast(overFps.map(_._1).toDF("fp")),
        Seq("fp"), "left_anti")
    val composite = compositeFrameKeys(capped, stride)
    // composite is a cheap projection of the cached f — both self-join
    // sides read through the cache, no second materialization needed
    Dedup.bandedPairsFromGuards(composite, maxHamming, Nil, hotBuckets)
      .select(
        expr(s"id_a DIV $stride").as("vid_a"),
        expr(s"id_b DIV $stride").as("vid_b"))
      // same-media frame matches are internal structure, not dups
      .filter(col("vid_a") =!= col("vid_b"))
      .groupBy(col("vid_a").as("id_a"), col("vid_b").as("id_b"))
      .agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") >= minMatches)
      .select(col("id_a"), col("id_b"), col("n_matched"))
  }

  /** The boilerplate-frame guard shared by the batch
    * ([[frameEvidencePairs]]) and streaming
    * ([[graft.streaming.Streams]] frame-evidence admission) paths:
    * drops `(media_id, frame_idx, fp)` rows whose fingerprint is
    * carried by more than `maxFrameDf` DISTINCT media (see the
    * [[frameEvidencePairs]] scaladoc for why such frames are structure,
    * not evidence). The cap runs as one EAGER bounded probe job
    * (round 18; previously a lazy semi-join against the kept set —
    * but "kept" is nearly every distinct fingerprint, so that join
    * shuffled the whole frame table per consumer, and the lazy
    * aggregate re-ran under every downstream action): the OVER-cap
    * set — the tiny boilerplate inventory, ≤ total-rows/maxFrameDf
    * entries by the df bound — is collected once and re-applied as a
    * local-relation map-side anti-join; on healthy frames it is EMPTY
    * and the frame passes through with zero plan overhead. NULL-fp
    * rows are DROPPED when the cap is enabled (the pre-r18 semi-join
    * form did this implicitly — null never matches a semi-join — and
    * the anti-join form would silently flip it to "kept", so the drop
    * is now explicit; no internal producer emits null fp, this pins
    * the contract against future ones). `Int.MaxValue` disables the
    * cap without even the probe. Callers
    * should hand in a cached/persisted frame (both of this file's
    * call sites do) so the probe doesn't re-run the decode scan.
    */
  private[graft] def frameDfCap(frames: DataFrame, maxFrameDf: Int): DataFrame = {
    require(maxFrameDf >= 1, "maxFrameDf must be positive")
    if (maxFrameDf == Int.MaxValue) frames
    else {
      val spark = frames.sparkSession
      import spark.implicits._
      val nonNull = frames.filter(col("fp").isNotNull)
      // memoized per (frame plan, cap) — the simhashPairs posture
      val over: Seq[Long] = graft.ops.ProbeMemo.cached(
          nonNull, s"frameDfCap:$maxFrameDf") {
        nonNull.groupBy(col("fp"))
          .agg(count_distinct(col("media_id")).as("_df"))
          .filter(col("_df") > maxFrameDf)
          .select(col("fp")).as[Long].collect().toSeq
      }
      if (over.isEmpty) nonNull
      else nonNull.join(broadcast(over.toDF("fp")), Seq("fp"), "left_anti")
    }
  }

  /** Guarded composite-key projection shared by the batch and
    * streaming frame-evidence paths: `(media_id, frame_idx, fp)` →
    * `(id = media_id·stride + frame_idx, fp)`, RAISING on any
    * `media_id` outside `[0, Long.MaxValue / stride]` — an
    * out-of-range id would overflow the composite key and silently
    * scramble the banding and the `id_a < id_b` / media-division
    * invariants, so the contract is enforced in the projection itself
    * (a codegen'd `when`/`raise_error`, zero cost on valid rows).
    */
  private[graft] def compositeFrameKeys(frames: DataFrame, stride: Long): DataFrame = {
    require(stride > 0, "stride must be positive")
    // bound covers the WHOLE composite: media_id·stride + (stride−1)
    // must not wrap — Long.MaxValue/stride alone still overflows when
    // frame_idx exceeds Long.MaxValue mod stride (e.g. stride 10,
    // media_id = Long.MaxValue/10, frame_idx 9). frame_idx is part of
    // the same contract: outside [0, stride) it would scramble the
    // media-division invariant even without overflow, so it raises in
    // the same guarded projection.
    val maxId = (Long.MaxValue - (stride - 1)) / stride
    frames.select(
      when(col("media_id") < 0 || col("media_id") > maxId,
        raise_error(concat(
          lit(s"media_id out of composite-key range [0, $maxId] " +
            s"for stride $stride: "), col("media_id").cast("string"))
        ).cast("long"))
        .when(col("frame_idx") < 0 || col("frame_idx") >= stride,
          raise_error(concat(
            lit(s"frame_idx out of [0, $stride) for stride $stride: "),
            col("frame_idx").cast("string"))
          ).cast("long"))
        .otherwise(col("media_id") * stride + col("frame_idx"))
        .as("id"),
      col("fp"))
  }

  /** Per-segment energy fingerprints of LONG audio —
    * [[JdkCodec.audioHash64Windows]] over the `(media_id, content)`
    * frame, one decode pass, emitting `(media_id, frame_idx, fp)`
    * rows. Fixed-duration segments (not an equal split of the clip)
    * are the point: a copy with an appended or padded tail shares
    * every complete leading segment, where [[audioFingerprints]]'
    * whole-clip hash shifts entirely. Quarantined (non-PCM16) audio
    * emits no rows.
    */
  def audioFingerprintWindows(
      media: DataFrame,
      segSamples: Int = 65536,
      maxSegments: Int = 64): DataFrame = {
    require(segSamples >= 65, "segSamples must be >= 65")
    require(maxSegments > 0, "maxSegments must be positive")
    val enc = Encoders.row(videoFpSchema)
    media.select(col("media_id"), col("content")).mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        JdkCodec.audioHash64Windows(
          r.getAs[Array[Byte]](1), segSamples, maxSegments)
          .iterator.map { case (s, fp) => Row(id, s, fp) }
      }
    }(enc)
  }

  /** Windowed audio near-dup pairs — the segment-evidence composition
    * for long clips: two clips pair when ≥ `minMatches` of their
    * fixed-length segments pair within `maxHamming`
    * ([[audioFingerprintWindows]] → the SAME evidence core as
    * [[videoNearDups]]), so tail-edited / padded / concatenated copies
    * pair on their shared leading segments while one coincidental
    * segment cannot pair unrelated clips. Emits `(id_a, id_b,
    * n_matched)`, `id_a < id_b`; compose [[Dedup.clusters]] for
    * survivors. Requires `0 ≤ media_id ≤ Long.MaxValue / maxSegments`
    * (the composite-key contract; out-of-range ids raise).
    * `maxFrameDf` drops segments shared by more media than the cap —
    * silence segments are the audio boilerplate
    * ([[frameEvidencePairs]]); `maxBucket` is the banding's
    * chunk-bucket flood valve (the [[Dedup.simhashPairs]] knob).
    *
    * SHORT-CLIP LIMIT: a clip yielding fewer than `minMatches`
    * complete segments (shorter than `minMatches · segSamples`
    * samples) can NEVER accumulate enough evidence on this path — an
    * EXACT duplicate of a one-segment clip reaches evidence 1 < the
    * default floor of 2 and is admitted. That is the deliberate flip
    * side of "one coincidental segment cannot pair unrelated clips":
    * the evidence floor cannot distinguish a short clip's only segment
    * from a long clip's coincidental one. Route short clips through
    * the whole-clip [[audioNearDups]] (one fingerprint over ALL
    * samples — exact-length identity, no floor) and reserve this path
    * for clips of at least `minMatches` full segments.
    */
  def audioNearDupsWindowed(
      media: DataFrame,
      segSamples: Int = 65536,
      maxSegments: Int = 64,
      maxHamming: Int = 3,
      minMatches: Int = 2,
      maxFrameDf: Int = 100,
      maxBucket: Int = 2000): DataFrame =
    frameEvidencePairs(
      audioFingerprintWindows(media, segSamples, maxSegments),
      maxSegments.toLong, maxHamming, minMatches, maxFrameDf, maxBucket)
}
