package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporary profiling harness (not part of the library). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, Multimodal, MjpegAvi}

    // qM7's synthetic video corpus
    def media(s: SparkSession, d: String): DataFrame = {
      val unit = 1L + (1L << 16) + (1L << 32) + (1L << 48)
      val lanes = Array(0L, 0xFFFFL, 0xFFFF0000L, 0xFFFFFFFFL)
      def flipOf(baseId: Long, f: Int): Long = f match {
        case 0 => 1L | (1L << 21) | (1L << 42)
        case 1 => 1L << 5
        case 2 => if (baseId % 3 == 0) (1L << 7) | (1L << 28)
          else 0x0202020202020202L
        case _ => 0x0404040404040404L | (1L << 62)
      }
      val base = graft.queries.Tables.documents(s, d).filter(col("doc_id") < 16384)
        .select(col("doc_id"))
      val both = base.select(col("doc_id").as("media_id"),
          col("doc_id").as("base_id"), lit(false).as("twin"))
        .unionByName(base.select((col("doc_id") + 100000L).as("media_id"),
          col("doc_id").as("base_id"), lit(true).as("twin")))
      val enc = org.apache.spark.sql.Encoders.row(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("media_id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("content",
            org.apache.spark.sql.types.BinaryType))))
      both.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val baseId = r.getLong(1)
          val twin = r.getBoolean(2)
          val sx = 1 + (id % 3).toInt
          val sy = 1 + (id % 2).toInt
          val frames = (0 until 4).map { f =>
            val code = (baseId * unit) ^ lanes(f) ^
              (if (twin) flipOf(baseId, f) else 0L)
            Multimodal.JdkCodec.encodeCodedPng(code, sx, sy)
          }
          org.apache.spark.sql.Row(id, MjpegAvi.encode(frames, 9 * sx, 8 * sy))
        }
      }(enc)
    }

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      graft.ops.Caches.release()
      spark.catalog.clearCache()
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val m = media(spark, sfDir)
    def vfp = Multimodal.videoFingerprints(m, 4)
    def full = Multimodal.videoNearDups(m, k = 4, maxHamming = 3, minMatches = 2)
    def noCaps = Multimodal.frameEvidencePairs(vfp, 4L, 3, 2, Int.MaxValue)
    // warmup
    noop(full); graft.ops.Caches.release(); spark.catalog.clearCache()
    noop(noCaps); graft.ops.Caches.release(); spark.catalog.clearCache()
    for (_ <- 1 to 3) {
      time("vfp scan only")(noop(vfp))
      time("q158 full (df cap + census)")(noop(full))
      time("q158 df-cap OFF (census only)")(noop(noCaps))
    }
    spark.stop()
  }
}
