package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** 10×-sf0.1 stress probe (50k docs with 10 exact copies each — an
  * adversarial dup density that hammers hot LSH buckets): times the
  * dedup/similarity pipelines on /tmp-replicated data to evidence the
  * scale claims. Run `python`-side replication first (see docs/SCALE.md).
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val docsPath = args.headOption.getOrElse("/tmp/sf1_documents.parquet")
    val embPath = args.lift(1).getOrElse("/tmp/sf1_embeddings.parquet")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(docsPath).repartition(32)
    val embs = spark.read.parquet(embPath).repartition(32)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stress] $label: $n rows in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }

    println(s"[stress] docs=${docs.count()} embs=${embs.count()}")
    time("exact dedup groups")(
      Dedup.exactGroups(docs, "text", "doc_id").count())
    time("minhash candidates")(
      Dedup.minhashCandidates(docs, "text", "doc_id").count())
    time("minhash near-dups (verify)")(
      Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.7).count())
    time("simhash near-dups")(
      Dedup.simhashNearDups(docs, "text", "doc_id", maxHamming = 4).count())
    time("embedding near-dups (LSH)")(
      Similarity.embeddingNearDups(embs, "embedding", "vec_id",
        threshold = 0.9, dim = 64, bits = 8, tables = 16).count())
    val q = embs.filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    time("brute kNN top-20")(
      Similarity.bruteForceTopK(embs.filter(col("vec_id") =!= 0),
        "embedding", "vec_id", q, k = 20).count())
    spark.stop()
  }
}
