package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(
    spark, spark.range(20).toDF("doc_id"), "doc_id")

  test("synthetic media carries the canonical schema") {
    assert(media.columns.toSeq == Seq("media_id", "content", "meta"))
    val r = media.filter(col("media_id") === 3).collect()(0)
    assert(r.getAs[Array[Byte]]("content").nonEmpty)
    assert(r.getStruct(2).getString(0) == "image")
  }

  test("decode produces per-row stats deterministically") {
    val a = Multimodal.decodeImages(media).orderBy("media_id").collect()
    val b = Multimodal.decodeImages(media).orderBy("media_id").collect()
    assert(a.toSeq == b.toSeq) // deterministic stub
    assert(a.forall(r => r.getInt(1) > 0 && r.getInt(2) > 0))
    assert(a.forall(r => r.getDouble(3) >= 0 && r.getDouble(3) <= 1))
  }

  test("featurize emits fixed-dim float embeddings consumable by Similarity") {
    val feats = Multimodal.featurize(media, dim = 8)
    assert(feats.schema("embedding").dataType.simpleString == "array<float>")
    assert(feats.select(size(col("embedding"))).distinct().collect()(0).getInt(0) == 8)
    val top = Similarity.bruteForceTopK(
      feats.filter(col("media_id") =!= 0), "embedding", "media_id",
      feats.filter(col("media_id") === 0).collect()(0).getSeq[Float](1), k = 3)
    assert(top.count() == 3)
  }

  test("resize rewrites content and metadata") {
    val out = Multimodal.resizeImages(media, 32, 16).collect()
    assert(out.forall(_.getAs[Array[Byte]]("content").length == 32 * 16 / 8))
    assert(out.forall(_.getStruct(2).getInt(2) == 32))
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
    val decoded = Multimodal.decodeImages(media)
    assert(decoded.count() == 2)
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

  test("sampleFrames explodes k frames per media") {
    val frames = Multimodal.sampleFrames(media, k = 4)
    assert(frames.count() == 20 * 4)
    assert(frames.groupBy("media_id").count()
      .filter(col("count") =!= 4).count() == 0)
  }

  test("audio decode yields deterministic duration/rate/rms per row") {
    val a = Multimodal.decodeAudio(media).collect()
    assert(a.length == 20)
    assert(a.forall(r => r.getInt(2) >= 8000 && r.getLong(1) > 0))
    assert(a.forall(r => r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
    val b = Multimodal.decodeAudio(media).collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
  }
}
