package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val ids = spark.range(20).toDF("doc_id")
  private lazy val images = Multimodal.syntheticImages(spark, ids, "doc_id")
  private lazy val audio = Multimodal.syntheticAudio(spark, ids, "doc_id")
  private lazy val video = Multimodal.syntheticMedia(spark, ids, "doc_id")

  test("synthetic images carry the canonical schema with real PNG bytes") {
    assert(images.columns.toSeq == Seq("media_id", "content", "meta"))
    val r = images.filter(col("media_id") === 3).collect()(0)
    val bytes = r.getAs[Array[Byte]]("content")
    // PNG magic: 89 50 4E 47
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
    assert(r.getStruct(2).getString(0) == "image")
    assert(r.getStruct(2).getString(1) == "png")
  }

  test("real ImageIO decode recovers planted dimensions and exact pixel sum") {
    // id=3: w=4+3%13=7, h=3+3%11=6, gray=3 → px_sum = 7*6*3 = 126
    val r = Multimodal.decodeImages(images).filter(col("media_id") === 3).collect()(0)
    assert(r.getInt(1) == 7)
    assert(r.getInt(2) == 6)
    assert(r.getLong(3) == 126L)
    assert(math.abs(r.getDouble(4) - 126.0 / (7 * 6 * 255)) < 1e-12)
  }

  test("decode is a real codec: planted 7x5 gray-128 PNG round-trips") {
    val img = new java.awt.image.BufferedImage(7, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 5; x <- 0 until 7) img.setRGB(x, y, (128 << 16) | (128 << 8) | 128)
    val (w, h, pxSum, luma) = Multimodal.JdkCodec.decodeImage(Multimodal.JdkCodec.encodePng(img))
    assert((w, h) == (7, 5))
    assert(pxSum == 128L * 35)
    assert(math.abs(luma - 128.0 / 255) < 1e-12)
  }

  test("undecodable bytes yield zeroed stats, not task failure") {
    val (w, h, s, l) = Multimodal.JdkCodec.decodeImage(Array[Byte](1, 2, 3, 4))
    assert((w, h, s, l) == (0, 0, 0L, 0.0))
    assert(Multimodal.JdkCodec.decodeAudio(Array[Byte](9, 9, 9)) == ((0L, 0, 0L, 0.0)))
  }

  test("featurize emits real histogram embeddings consumable by Similarity") {
    val feats = Multimodal.featurize(images, dim = 8)
    assert(feats.schema("embedding").dataType.simpleString == "array<float>")
    assert(feats.select(size(col("embedding"))).distinct().collect()(0).getInt(0) == 8)
    // constant-gray image → one-hot histogram at bin gray*8/256, mass 1.0
    val e3 = feats.filter(col("media_id") === 3).collect()(0).getSeq[Float](1)
    assert(e3.sum == 1.0f && e3(3 * 8 / 256) == 1.0f)
    val top = Similarity.bruteForceTopK(
      feats.filter(col("media_id") =!= 0), "embedding", "media_id",
      feats.filter(col("media_id") === 0).collect()(0).getSeq[Float](1), k = 3)
    assert(top.count() == 3)
  }

  test("resize is a real scale: output PNG decodes at the target dims") {
    val out = Multimodal.resizeImages(images, 32, 16)
    val decoded = Multimodal.decodeImages(out).collect()
    assert(decoded.forall(r => r.getInt(1) == 32 && r.getInt(2) == 16))
    // bilinear scale of a constant-gray image stays that gray
    val r3 = decoded.find(_.getLong(0) == 3L).get
    assert(r3.getLong(3) == 3L * 32 * 16)
    val meta = Multimodal.resizeImages(images, 32, 16).collect()
    assert(meta.forall(_.getStruct(2).getInt(2) == 32))
  }

  test("binaryFile ingestion: files become canonical media rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media")
    java.nio.file.Files.write(dir.resolve("a.jpg"), Array[Byte](1, 2, 3, 4))
    java.nio.file.Files.write(dir.resolve("b.jpg"), Array[Byte](9, 8, 7))
    java.nio.file.Files.writeString(dir.resolve("notes.txt"), "skip me")
    val media = Multimodal.fromBinaryFiles(
      spark, dir.toString, globFilter = Some("*.jpg"))
    val rows = media.collect()
    assert(rows.length == 2) // txt filtered by glob
    assert(rows.forall(_.getStruct(2).getString(0) == "image"))
    assert(rows.forall(_.getStruct(2).getString(1) == "jpg"))
    // not real JPEGs — decode quarantines them as zero-dim rows
    val decoded = Multimodal.decodeImages(media).collect()
    assert(decoded.length == 2 && decoded.forall(_.getInt(1) == 0))
  }

  test("jsonl reader parses structured lines") {
    import org.apache.spark.sql.functions.col
    val f = java.nio.file.Files.createTempFile("graft", ".jsonl")
    java.nio.file.Files.writeString(f,
      """{"id": 1, "tag": "a"}
        |{"id": 2, "tag": "b"}
        |""".stripMargin)
    val df = graft.ingest.Readers.jsonl(spark, f.toString)
    assert(df.count() == 2)
    assert(df.filter(col("tag") === "b").collect()(0).getLong(df.columns.indexOf("id")) == 2L)
  }

  test("sampleFrames explodes k frames per media (video stub, explicit opt-in)") {
    val frames = Multimodal.sampleFrames(video, k = 4, allowStandIn = true)
    assert(frames.count() == 20 * 4)
    assert(frames.groupBy("media_id").count()
      .filter(col("count") =!= 4).count() == 0)
  }

  test("sampleFrames raises a typed error on non-AVI content by default") {
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.sampleFrames(video, k = 4).count()
    }
    // root cause is the typed unsupported-container error, not a decode crash
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => s"${t.getClass.getName}: ${t.getMessage}").mkString("\n")
    assert(msgs.contains("UnsupportedOperationException"))
    assert(msgs.contains("MJPEG-AVI"))
  }

  test("real javax.sound decode recovers planted WAV rate/duration/abs-sum") {
    // id=4: rate=16000 (4%3=1), n=104 samples, amp=1004
    val r = Multimodal.decodeAudio(audio).filter(col("media_id") === 4).collect()(0)
    assert(r.getInt(2) == 16000)
    assert(r.getLong(1) == 104L * 1000 / 16000)
    assert(r.getLong(3) == 104L * 1004)
    // square wave rms = amp/32768
    assert(math.abs(r.getDouble(4) - 1004.0 / 32768) < 1e-9)
  }

  test("audio decode is deterministic across runs") {
    val a = Multimodal.decodeAudio(audio).collect()
    val b = Multimodal.decodeAudio(audio).collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
    assert(a.length == 20)
  }

  test("MjpegAvi round-trips JPEG frames through a real RIFF container") {
    val img = new java.awt.image.BufferedImage(
      6, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    val avi = MjpegAvi.encode(Seq(jpeg, jpeg, jpeg), 6, 4)
    assert(MjpegAvi.isAvi(avi))
    val back = MjpegAvi.frames(avi)
    assert(back.length == 3)
    assert(back.forall(_.sameElements(jpeg)))
    // every demuxed frame is a real, ImageIO-decodable JPEG
    val dec = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(back.head))
    assert(dec.getWidth == 6 && dec.getHeight == 4)
    assert(MjpegAvi.frames("not an avi".getBytes).isEmpty)
  }

  test("sampleFrames demuxes real AVI content and decodes frame dims") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 14L).toDF("id") // 14: w=4+1=5, h=3+3=6, n=3+4=7
    val media = Multimodal.syntheticVideos(spark, ids, "id")
    val dims = Multimodal.decodeFrameDims(Multimodal.sampleFrames(media, 3))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(dims.count(_._1 == 14L) == 3) // k=3 sampled of 7 frames
    assert(dims.filter(_._1 == 14L).forall(d => d._3 == 5 && d._4 == 6))
    assert(dims.length == 9)
    // non-AVI bytes route to the byte-slice stand-in only on opt-in
    val fake = Multimodal.syntheticMedia(spark, ids, "id")
    assert(Multimodal.sampleFrames(fake, 3, allowStandIn = true).count() == 9)
  }

  test("sampleFrames emits ALL frames when the video is shorter than k") {
    val img = new java.awt.image.BufferedImage(
      4, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val avi = MjpegAvi.encode(Seq(bos.toByteArray, bos.toByteArray), 4, 3)
    import spark.implicits._
    val media = Seq((7L, avi)).toDF("media_id", "content")
    // n=2 < k=5: both frames, not frame 0 collapsed by even-spacing math
    assert(Multimodal.sampleFrames(media, 5).count() == 2)
  }

  test("demux never throws on arbitrary bytes (fuzz property)") {
    // random buffers, RIFF-prefixed random buffers, and truncations of
    // a valid AVI: frames() must return (possibly empty) promptly —
    // never throw, never loop
    val img = new java.awt.image.BufferedImage(
      4, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val valid = MjpegAvi.encode(Seq(bos.toByteArray), 4, 3)
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { i =>
      val raw = Array.fill(rnd.nextInt(200))(rnd.nextInt.toByte)
      MjpegAvi.frames(raw) // must not throw
      val riffed = "RIFF".getBytes ++ raw.take(4) ++ "AVI ".getBytes ++ raw
      MjpegAvi.frames(riffed)
      MjpegAvi.frames(valid.take(i % valid.length))
    }
  }

  test("deeply nested LIST headers demux iteratively — no stack overflow") {
    // 200k nested LISTs (12 bytes each): a recursive walk would throw
    // StackOverflowError; the iterative walk must return the frame
    // planted at the innermost level, in order
    val img = new java.awt.image.BufferedImage(
      4, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    val depth = 200000
    val innerChunk = {
      val padded = if (jpeg.length % 2 == 1) jpeg :+ 0.toByte else jpeg
      val b = java.nio.ByteBuffer.allocate(8 + padded.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("00dc".getBytes("US-ASCII")).putInt(jpeg.length).put(padded)
      b.array()
    }
    // build outside-in: total = depth*12 + innerChunk
    val total = depth * 12 + innerChunk.length
    val buf = java.nio.ByteBuffer.allocate(12 + total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + total).put("AVI ".getBytes("US-ASCII"))
    for (i <- 0 until depth) {
      val remaining = (depth - i - 1) * 12 + innerChunk.length
      buf.put("LIST".getBytes("US-ASCII")).putInt(4 + remaining)
        .put((if (i == 0) "movi" else "rec ").getBytes("US-ASCII"))
    }
    buf.put(innerChunk)
    val frames = MjpegAvi.frames(buf.array())
    assert(frames.length == 1 && frames.head.sameElements(jpeg))
  }

  test("encode refuses non-positive fps") {
    val e = intercept[IllegalArgumentException](
      MjpegAvi.encode(Seq(Array[Byte](1, 2)), 4, 3, fps = 0))
    assert(e.getMessage.contains("fps"))
  }

  test("corrupt AVI chunk sizes terminate the demux instead of hanging") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(
      4, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val avi = MjpegAvi.encode(Seq(bos.toByteArray), 4, 3)
    // corrupt the first chunk's size field to 0xFFFFFFF8 (u32 wraps
    // negative through toInt — the forever-loop trap)
    val bad = avi.clone()
    bad(16) = 0xF8.toByte; bad(17) = 0xFF.toByte
    bad(18) = 0xFF.toByte; bad(19) = 0xFF.toByte
    assert(MjpegAvi.frames(bad).isEmpty) // partial/empty, returns promptly
    // truncated JPEG frames are quarantined, not thrown
    val truncated = MjpegAvi.frames(avi).head.take(8)
    val rows = Seq((1L, 0, truncated)).toDF("media_id", "frame_idx", "frame")
    assert(Multimodal.decodeFrameDims(rows).count() == 0)
  }

  test("dHash64 recovers a planted code from rendered pixels at every block scale") {
    val codes = Seq(0L, -1L, 0x5a5a5a5a5a5a5a5aL, 0x0123456789abcdefL,
      1L | (1L << 21) | (1L << 42))
    for (code <- codes; sx <- 1 to 3; sy <- 1 to 3) {
      val png = Multimodal.JdkCodec.encodeCodedPng(code, sx, sy)
      val got = Multimodal.JdkCodec.dHash64(png)
      assert(got != null && got.longValue == code, s"code=$code sx=$sx sy=$sy")
    }
    // undecodable / empty bytes fingerprint as null (quarantine)
    assert(Multimodal.JdkCodec.dHash64(Array[Byte](1, 2, 3)) == null)
    assert(Multimodal.JdkCodec.dHash64(Array.emptyByteArray) == null)
  }

  test("audioHash64 recovers planted codes; gain-invariant; quarantines junk") {
    val codes = Seq(0L, -1L, 0x5a5a5a5a5a5a5a5aL, 0x0123456789abcdefL)
    for (code <- codes; winLen <- Seq(40, 56, 72); rate <- Seq(8000, 44100)) {
      val wav = Multimodal.JdkCodec.encodeCodedWav(code, rate, winLen)
      val got = Multimodal.JdkCodec.audioHash64(wav)
      assert(got != null && got.longValue == code,
        s"code=$code winLen=$winLen rate=$rate")
    }
    // uniform GAIN invariance: the hash reads sign-of-delta, so a
    // re-leveled copy (every sample x2) hashes identically
    def reGain(wav: Array[Byte], num: Int, den: Int): Array[Byte] = {
      val out = wav.clone()
      var i = 44
      while (i + 1 < out.length) {
        val s = (((out(i) & 0xff) | (out(i + 1) << 8)).toShort).toInt
        val g = s * num / den
        out(i) = (g & 0xff).toByte; out(i + 1) = ((g >> 8) & 0xff).toByte
        i += 2
      }
      out
    }
    val base = Multimodal.JdkCodec.encodeCodedWav(0x0123456789abcdefL, 8000, 40)
    val doubled = Multimodal.JdkCodec.audioHash64(reGain(base, 2, 1))
    val halved = Multimodal.JdkCodec.audioHash64(reGain(base, 1, 2))
    assert(doubled.longValue == 0x0123456789abcdefL)
    assert(halved.longValue == 0x0123456789abcdefL)
    // quarantine: garbage, too-short, and the degenerate empty
    assert(Multimodal.JdkCodec.audioHash64(Array[Byte](1, 2, 3)) == null)
    assert(Multimodal.JdkCodec.audioHash64(
      Multimodal.JdkCodec.encodeWav(8000, Array.fill(10)(100.toShort))) == null)
  }

  test("audioNearDups pairs re-leveled copies, separates distinct clips") {
    import spark.implicits._
    def clip(code: Long): Array[Byte] =
      Multimodal.JdkCodec.encodeCodedWav(code, 8000, 40)
    val a = clip(0x00ff00ff00ff00ffL)
    // a 2-bit-perturbed twin (below maxHamming) and a far code
    val aTwin = clip(0x00ff00ff00ff00ffL ^ (1L | (1L << 33)))
    val other = clip(0x5a5a5a5a5a5a5a5aL)
    val media = Seq(
      (1L, a), (2L, aTwin), (3L, other),
      (4L, Array[Byte](7, 7, 7))) // undecodable quarantines
      .toDF("media_id", "content")
    val pairs = Multimodal.audioNearDups(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
    spark.sharedState.cacheManager.clearCache()
  }

  test("dHash survives perceptual perturbation but separates distinct images") {
    import spark.implicits._
    // a smooth 2-D gradient photo-alike, its mildly noised re-render,
    // and a structurally different (transposed-gradient) image
    def render(seed: Int, noise: Int, stripes: Boolean): Array[Byte] = {
      val w = 45; val h = 40
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rnd = new scala.util.Random(seed)
      for (y <- 0 until h; x <- 0 until w) {
        // dHash reads HORIZONTAL luma sign structure, so "different"
        // must mean different left-right shape: a monotone ramp vs
        // alternating stripes (a transposed ramp is still monotone in
        // x and correctly hashes as the SAME gradient)
        val base = if (stripes) (if ((x / 5) % 2 == 0) 60 else 190)
          else (x * 4 + y)
        val g = math.min(255, math.max(0,
          base + (if (noise > 0) rnd.nextInt(2 * noise + 1) - noise else 0)))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      Multimodal.JdkCodec.encodePng(img)
    }
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val clean = Multimodal.JdkCodec.dHash64(render(1, 0, stripes = false))
    val noisy = Multimodal.JdkCodec.dHash64(render(2, 3, stripes = false))
    val other = Multimodal.JdkCodec.dHash64(render(3, 0, stripes = true))
    assert(ham(clean, noisy) <= 3, s"noise moved ${ham(clean, noisy)} bits")
    assert(ham(clean, other) > 10, s"distinct only ${ham(clean, other)} bits apart")
    // the DataFrame pairing finds exactly the perceptual pair, skips
    // the corrupt row, and clusters compose for survivor selection
    val media = Seq(
      (1L, render(1, 0, stripes = false)),
      (2L, render(2, 3, stripes = false)),
      (3L, render(3, 0, stripes = true)),
      (4L, Array[Byte](9, 9, 9))) // undecodable
      .toDF("media_id", "content")
    val pairs = Multimodal.imageNearDups(media, maxHamming = 3)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
    val comp = graft.operators.Dedup.clusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) == comp(2L))
    spark.sharedState.cacheManager.clearCache()
  }

  test("videoNearDups pairs videos by frame evidence, not single-frame luck") {
    import spark.implicits._
    // three 3-frame MJPEG-AVI videos of coded-PNG frames: B twins A on
    // frames {0,1} (hamming 3 and 1) but NOT frame 2 (9 bits); C twins
    // A on frame 0 ONLY — below the minMatches = 2 evidence floor.
    // Frame codes within a video sit >= 16 bits apart (lane masks).
    val lanes = Array(0L, 0xFFFFL, 0xFFFFFFFFL)
    val baseA = 0x0101010101010101L
    def codesOf(base: Long, flips: Array[Long]) =
      lanes.zip(flips).map { case (m, fl) => base ^ m ^ fl }
    val aCodes = codesOf(baseA, Array(0L, 0L, 0L))
    val bCodes = codesOf(baseA,
      Array(1L | (1L << 21) | (1L << 42), 1L << 5, 0x0404040404040404L | (1L << 62)))
    val cCodes = codesOf(baseA,
      Array(1L << 7, 0x0202020202020202L, 0x4040404040404040L))
    def avi(codes: Array[Long]) = MjpegAvi.encode(
      codes.map(c => Multimodal.JdkCodec.encodeCodedPng(c, 1, 1)).toSeq, 9, 8)
    val media = Seq(
      (1L, avi(aCodes)), (2L, avi(bCodes)), (3L, avi(cCodes)),
      (4L, Array[Byte](1, 2, 3))) // non-AVI: zero frames, never pairs
      .toDF("media_id", "content")
    val got = Multimodal.videoNearDups(media, k = 3, maxHamming = 3, minMatches = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 2L)), s"got $got")
    // at minMatches = 1 the single-frame C pair surfaces too
    val loose = Multimodal.videoNearDups(media, k = 3, maxHamming = 3, minMatches = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(loose == Set((1L, 2L, 2L), (1L, 3L, 1L)), s"got $loose")
    // fingerprints: 3 decodable videos x 3 frames, junk contributes none
    assert(Multimodal.videoFingerprints(media, k = 3).count() == 9)
    graft.ops.Caches.release()
  }

  test("audioNearDupsWindowed pairs clips by segment evidence; tail-appends still pair") {
    import spark.implicits._
    // planted per-segment codes rendered as real concatenated coded-WAV
    // segments (audioHash64Windows recovers each exactly at
    // segSamples = 65 * winLen); lane masks keep same-clip segments
    // >= 16 bits apart
    val winLen = 16
    val lanes = Array(0L, 0xFFFFL, 0xFFFF0000L, 0xFFFFFFFFL,
      0xFFFF00000000L, 0xFFFF0000FFFFL)
    val baseA = 0x0101010101010101L
    val far = 0x0202020202020202L
    def codes(flips: Array[Long]): Seq[Long] =
      flips.zipWithIndex.map { case (fl, s) => baseA ^ lanes(s) ^ fl }.toSeq
    def wav(flips: Array[Long]) = Multimodal.JdkCodec
      .encodeCodedWavSegments(codes(flips), 8000, winLen)
    val aFlips = Array(0L, 0L, 0L, 0L)
    val media = Seq(
      (1L, wav(aFlips)),                               // A: 4 segments
      (2L, wav(Array(1L | (1L << 21) | (1L << 42),     // B: twins A on
        1L << 5, far, far ^ (1L << 60)))),             //    segments {0,1}
      (3L, wav(Array(1L << 7, 0x2020202020202020L ^ (1L << 3), // C: segment 0
        0x2020202020202020L ^ (1L << 30), 0x2020202020202020L))), // only
      (4L, wav(Array(0L, 0L, 0L, 0L, far, far ^ 1L))), // D: A + 2-seg tail
      (5L, Array[Byte](9, 9, 9)))                      // quarantine: no segs
      .toDF("media_id", "content")
    val seg = 65 * winLen
    val pairs = Multimodal.audioNearDupsWindowed(
      media, segSamples = seg, maxSegments = 8, maxHamming = 3, minMatches = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // D (a tail-appended copy of A) pairs with A on ALL 4 shared
    // segments — the case the fixed-duration anchoring exists for —
    // and with B on B's two near segments; C's single match is below
    // the evidence floor everywhere
    assert(pairs == Set((1L, 2L, 2L), (1L, 4L, 4L), (2L, 4L, 2L)), s"got $pairs")
    // segment counts: 4 + 4 + 4 + 6 decodable segments, junk none
    assert(Multimodal.audioFingerprintWindows(
      media, segSamples = seg, maxSegments = 8).count() == 18)
    // a clip shorter than one segment still carries one whole-clip
    // identity (segment 0)
    val short = Multimodal.JdkCodec.encodeCodedWav(baseA, 8000, 4)
    val fps = Multimodal.JdkCodec.audioHash64Windows(
      short, segSamples = 100000, maxSegments = 8)
    assert(fps == Seq((0, baseA)))
    graft.ops.Caches.release()
  }

  test("boilerplate frames (df over maxFrameDf) carry no dup evidence") {
    import spark.implicits._
    // videos 1-4 consist ENTIRELY of the same two title-card frames
    // (the fade-to-black shape); 5 and 6 are genuine twins on two
    // UNIQUE frames. Under the df cap the title cards are structure,
    // not evidence — only the genuine pair survives.
    val x = 0x0101010101010101L
    val p = 0x4040404040404040L
    def avi(codes: Seq[Long]) = MjpegAvi.encode(
      codes.map(c => Multimodal.JdkCodec.encodeCodedPng(c, 1, 1)), 9, 8)
    val media = Seq(
      (1L, avi(Seq(x, x ^ 0xFFFFL))),
      (2L, avi(Seq(x, x ^ 0xFFFFL))),
      (3L, avi(Seq(x, x ^ 0xFFFFL))),
      (4L, avi(Seq(x, x ^ 0xFFFFL))),
      (5L, avi(Seq(p, p ^ 0xFFFF0000L))),
      (6L, avi(Seq(p ^ 1L, p ^ 0xFFFF0000L ^ (1L << 20)))))
      .toDF("media_id", "content")
    val capped = Multimodal.videoNearDups(
      media, k = 2, maxHamming = 3, minMatches = 2, maxFrameDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped == Set((5L, 6L, 2L)), s"got $capped")
    // cap lifted: the title-card videos all pair with each other
    val open = Multimodal.videoNearDups(
      media, k = 2, maxHamming = 3, minMatches = 2, maxFrameDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val clique = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b, 2L)).toSet
    assert(open == clique + ((5L, 6L, 2L)), s"got $open")
    graft.ops.Caches.release()
  }

  test("frame-evidence census correction: a bucket raw-hot only through over-cap boilerplate survives") {
    // 2100 media carry ONE boilerplate frame fp B (df 2100 > the
    // default maxFrameDf=100 -> removed), and B shares its chunk-0
    // value with the fp X that 4 legit videos carry on both frames.
    // The fused probe's RAW chunk-0 census reads 2100 + 8 > the 2000
    // valve, but post-removal it is 8 -- the driver correction must
    // keep the bucket, or the legit evidence pairs (identical frames,
    // first agreeing chunk 0) silently vanish.
    import spark.implicits._
    val X = 0x2222L
    val B = X | (1L << 16) // differs outside chunk 0: same chunk-0 bucket
    val boiler = (1L to 2100L).map(m => (10000L + m, 0, B))
    // frame 1 sits 8 bits from frame 0 (cross-frame pairs must NOT
    // match — only same-frame evidence counts toward the 2)
    val legit = (1L to 4L).flatMap(v =>
      Seq((v, 0, X), (v, 1, X ^ (0xFFL << 48))))
    val frames = (boiler ++ legit).toDF("media_id", "frame_idx", "fp")
    val got = Multimodal.frameEvidencePairs(
        frames, stride = 2L, maxHamming = 3, minMatches = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.ops.Caches.release()
    // every legit video pair matches on both frames
    val want = (for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b, 2L)).toSet
    assert(got == want, s"got $got -- the raw-hot bucket was wrongly dropped")
  }

  test("frameEvidencePairs maxBucket is a live knob: a tiny valve drops flood-bucket pairs") {
    // 3 videos carry IDENTICAL frames -> with the default valve the
    // full clique pairs; with maxBucket=1 every chunk bucket (3 rows
    // each) is over the valve and the boilerplate-suspect pairs are
    // dropped (the documented simhashPairs recall trade) -- proving
    // the r19 knob reaches the banding instead of the old hardcoded
    // 2000.
    import spark.implicits._
    val frames = (1L to 3L).flatMap(v =>
      Seq((v, 0, 0x1234L), (v, 1, 0xABCD0000L)))
      .toDF("media_id", "frame_idx", "fp")
    val open = Multimodal.frameEvidencePairs(
        frames, stride = 2L, maxHamming = 3, minMatches = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.ops.Caches.release()
    assert(open == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $open")
    val valved = Multimodal.frameEvidencePairs(
        frames, stride = 2L, maxHamming = 3, minMatches = 2,
        maxFrameDf = 100, maxBucket = 1)
      .collect()
    graft.ops.Caches.release()
    assert(valved.isEmpty, s"valve ignored: ${valved.toSeq}")
  }

  test("frameDfCap drops null-fp rows when the cap is enabled (the pre-r18 semi-join contract)") {
    import spark.implicits._
    val frames = Seq(
      (1L, 0, Some(7L)), (2L, 0, Some(7L)), (3L, 0, None: Option[Long]))
      .toDF("media_id", "frame_idx", "fp")
    val capped = Multimodal.frameDfCap(frames, maxFrameDf = 5)
      .collect().map(_.getLong(0)).toSet
    assert(capped == Set(1L, 2L), s"null fp row must be dropped: $capped")
    // cap disabled: pure passthrough, null included
    assert(Multimodal.frameDfCap(frames, Int.MaxValue).count() == 3)
  }

  test("composite frame keys raise on out-of-range media_id instead of wrapping") {
    import spark.implicits._
    val bad = Seq((Long.MaxValue / 8 + 1, 0, 1L), (-1L, 0, 2L))
      .toDF("media_id", "frame_idx", "fp")
    val err = intercept[Exception] {
      Multimodal.compositeFrameKeys(bad, 8L).collect()
    }
    assert(err.getMessage.contains("composite-key range") ||
      Option(err.getCause).exists(_.getMessage.contains("composite-key range")))
    val ok = Multimodal.compositeFrameKeys(
      Seq((3L, 1, 9L)).toDF("media_id", "frame_idx", "fp"), 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ok == Set((25L, 9L)))
    // stride 10: media_id = Long.MaxValue/10 passes the naive per-id
    // bound but media_id*10 + 9 wraps negative — the whole-composite
    // bound must raise, not scramble
    val wrap = Seq((Long.MaxValue / 10, 9, 3L)).toDF("media_id", "frame_idx", "fp")
    val err2 = intercept[Exception] {
      Multimodal.compositeFrameKeys(wrap, 10L).collect()
    }
    assert(err2.getMessage.contains("composite-key range") ||
      Option(err2.getCause).exists(_.getMessage.contains("composite-key range")))
    // frame_idx outside [0, stride) scrambles the media-division
    // invariant even without overflow — raises in the same projection
    val badIdx = Seq((3L, 8, 4L)).toDF("media_id", "frame_idx", "fp")
    val err3 = intercept[Exception] {
      Multimodal.compositeFrameKeys(badIdx, 8L).collect()
    }
    assert(err3.getMessage.contains("frame_idx out of") ||
      Option(err3.getCause).exists(_.getMessage.contains("frame_idx out of")))
    // the exact top of the tightened range still passes
    val top = (Long.MaxValue - 7L) / 8L
    val okTop = Multimodal.compositeFrameKeys(
      Seq((top, 7, 5L)).toDF("media_id", "frame_idx", "fp"), 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(okTop == Set((top * 8L + 7L, 5L)))
  }

  test("simhashCrossPairs matches probe-vs-prior without self-pair semantics") {
    import spark.implicits._
    val probe = Seq((1L, 0L), (2L, -1L), (3L, 0x00000000FFFFFFFFL))
      .toDF("id", "fp")
    val prior = Seq((10L, 1L | (1L << 21)), (11L, -1L ^ (1L << 5)),
      (12L, 0x0F0F0F0F0F0F0F0FL)).toDF("id", "fp")
    val got = graft.operators.Dedup.simhashCrossPairs(probe, prior, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 10L, 2), (2L, 11L, 1)), s"got $got")
  }
}
