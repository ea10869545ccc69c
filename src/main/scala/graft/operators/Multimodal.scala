package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support: media as opaque
  * `binary` columns with typed metadata structs, processed by
  * partition-batched transforms.
  *
  * The Spark-side plumbing — schema contract, partition batching,
  * transform signature, output shape — is real and tested. The actual
  * codec calls (JPEG decode, resample, frame extraction) are STUBBED
  * behind [[FakeCodec]] with deterministic synthetic implementations,
  * clearly marked: no image/audio library exists in this offline
  * container. Swapping in a real codec changes only the function body,
  * not the distributed shape.
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

  /** ======= STUB: deterministic fake codec =======
    * Stands in for libjpeg/ffmpeg/soundfile, which are unavailable
    * offline. Every function is a pure deterministic function of the
    * input bytes so tests are reproducible. A production build replaces
    * ONLY this object.
    */
  object FakeCodec {
    /** "Decode" an image: derive (width, height, mean_luma) from bytes. */
    def decodeImage(bytes: Array[Byte]): (Int, Int, Double) = {
      if (bytes == null || bytes.isEmpty) (0, 0, 0.0)
      else {
        val w = 1 + (math.abs(bytes.head.toInt) % 64)
        val h = 1 + (math.abs(bytes.last.toInt) % 64)
        val luma = bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / bytes.length / 255.0
        (w, h, luma)
      }
    }

    /** "Extract" an embedding: d deterministic moments of the bytes. */
    def featurize(bytes: Array[Byte], d: Int): Array[Float] = {
      val out = new Array[Float](d)
      if (bytes != null && bytes.nonEmpty) {
        var i = 0
        while (i < bytes.length) {
          out(i % d) += (bytes(i) & 0xff) / 255.0f
          i += 1
        }
        var j = 0
        while (j < d) { out(j) /= math.max(1, bytes.length / d); j += 1 }
      }
      out
    }

    /** "Decode" audio: derive (duration_ms, sample_rate, rms) from
      * bytes.
      */
    def decodeAudio(bytes: Array[Byte]): (Long, Int, Double) = {
      if (bytes == null || bytes.isEmpty) (0L, 0, 0.0)
      else {
        val rate = 8000 + (bytes.head & 0xff) * 160 // 8k..48.8k
        val durationMs = bytes.length * 1000L / math.max(rate / 8, 1)
        val meanSq = bytes.foldLeft(0.0) { (a, b) =>
          val x = (b & 0xff) / 255.0; a + x * x
        } / bytes.length
        (durationMs, rate, math.sqrt(meanSq))
      }
    }

    /** "Resize": truncate/pad the byte budget for a target (w,h). */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val n = math.max(1, w * h / 8)
      java.util.Arrays.copyOf(if (bytes == null) Array.emptyByteArray else bytes, n)
    }

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

  /** Build a synthetic media table from any id-bearing table —
    * deterministic bytes from the id — so the plumbing is testable at
    * every scale factor without real media files.
    */
  def syntheticMedia(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame =
    ids.select(
      col(idCol).cast("long").as("media_id"),
      // deterministic pseudo-bytes: sha2 of the id, repeated
      to_binary(repeat(sha2(col(idCol).cast("string"), 256), 4), lit("hex")).as("content"),
      struct(
        lit("image").as("media_type"),
        lit("fake").as("format"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit(null).cast("int").as("sample_rate")).as("meta"))

  private val decodedSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)))

  /** Decode pass: binary → (width, height, mean_luma), partition-batched.
    * The mapPartitions body sees an iterator — constant memory per task
    * regardless of partition row count.
    */
  def decodeImages(media: DataFrame): DataFrame = {
    val enc = Encoders.row(decodedSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, luma) = FakeCodec.decodeImage(bytes) // STUB codec
          Row(id, w, h, luma)
        }
      }(enc)
  }

  private val audioSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("rms", DoubleType, nullable = false)))

  /** Audio decode pass: binary → (duration_ms, sample_rate, rms) —
    * the waveform-stats stage of an audio pipeline (language/quality
    * filters key off duration and loudness before any transcription).
    */
  def decodeAudio(media: DataFrame): DataFrame = {
    val enc = Encoders.row(audioSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { it =>
        it.map { r =>
          val (d, sr, rms) = FakeCodec.decodeAudio(r.getAs[Array[Byte]](1)) // STUB codec
          Row(r.getLong(0), d, sr, rms)
        }
      }(enc)
  }

  private val featureSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** Feature-extraction pass: binary → embedding array<float>. The output
    * feeds graft.operators.Similarity directly.
    */
  def featurize(media: DataFrame, dim: Int = 16): DataFrame = {
    val enc = Encoders.row(featureSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { it =>
        it.map { r =>
          Row(r.getLong(0), FakeCodec.featurize(r.getAs[Array[Byte]](1), dim).toIndexedSeq) // STUB
        }
      }(enc)
  }

  /** Resize pass: content replaced by the resized buffer, metadata
    * updated — shows a binary-in/binary-out stage.
    */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val enc = Encoders.row(mediaSchema)
    media.select(col("media_id"), col("content"), col("meta"))
      .mapPartitions { it =>
        it.map { r =>
          val resized = FakeCodec.resize(r.getAs[Array[Byte]](1), w, h) // STUB
          // meta is nullable in mediaSchema — build a fresh shell then
          val meta = r.getStruct(2)
          val newMeta =
            if (meta == null) Row(null, null, w, h, null, null)
            else Row(meta.get(0), meta.get(1), w, h, meta.get(4), meta.get(5))
          Row(r.getLong(0), resized, newMeta)
        }
      }(enc)
  }

  private val frameSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** Frame-sampling pass: one row per sampled frame (flatMap shape). */
  def sampleFrames(media: DataFrame, k: Int): DataFrame = {
    val enc = Encoders.row(frameSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          FakeCodec.sampleFrames(r.getAs[Array[Byte]](1), k) // STUB
            .zipWithIndex.map { case (f, i) => Row(id, i, f) }
        }
      }(enc)
  }
}
