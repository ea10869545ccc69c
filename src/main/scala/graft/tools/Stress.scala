package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Dedup, Paths, Similarity, TimeSeries}

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

    // round-6 operators (10× docs / 1M events; see docs/SCALE.md)
    time("exact n-gram pairs (PPJoin, t=0.5)")(
      Corpus.exactNgramPairs(docs, "text", "doc_id", 0.5, 3).count())
    // candidate volume is quadratic in exact-copy multiplicity (every
    // copy shares every prefix gram) — the production composition runs
    // exact dedup FIRST, then mines near-dups among unique contents
    time("exact dedup -> n-gram pairs (composition)")(
      Corpus.exactNgramPairs(Dedup.exact(docs, "text", "doc_id"),
        "text", "doc_id", 0.5, 3).count())
    time("sequence packing (2048-token bins)")(
      Corpus.packSequences(docs, "doc_id", col("doc_id") % 32,
        col("doc_id"), col("n_chars"), 2048L).count())
    time("temperature resample (alpha=0.5 by lang)")(
      Corpus.temperatureResample(docs, "doc_id", "lang").count())

    // round-7 operators over the same adversarial replica
    time("strip boilerplate (per-source frequent lines)")(
      Corpus.stripBoilerplate(
        docs.withColumn("text",
          concat_ws("\n", concat(lit("=== "), col("source"), lit(" ===")),
            col("text"), lit("footer line"))),
        "text", "doc_id", "source").count())
    time("strip html (regex chain)")(
      docs.select(graft.functions.TextFunctions.stripHtml(
        concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>")))
        .as("t")).filter(length(col("t")) > 0).count())
    time("survivors by quality over LSH near-dup edges")(
      Dedup.nearDupSurvivorsBy(
        embs, Similarity.embeddingNearDups(embs, "embedding", "vec_id",
          threshold = 0.9, dim = 64, bits = 8, tables = 16),
        "vec_id", col("vec_id") % 97).count())

    val evPath = args.lift(2).getOrElse("/tmp/sf1_events.parquet")
    if (!new java.io.File(evPath).exists()) {
      println(s"[stress] events replica missing at $evPath — skipping event ops")
      spark.stop(); return
    }
    val ev = spark.read.parquet(evPath).repartition(32)
    println(s"[stress] events=${ev.count()}")
    time("funnel view->click->purchase")(
      Paths.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase")).count())
    time("event transitions")(
      Paths.transitions(ev, "user_id", "ts", "event_id", "event_type")
        .count())
    time("rolling 7-row stats per user")(
      TimeSeries.rolling(ev, "user_id", "ts", "event_id", "value", 7)
        .count())
    time("gap-filled hourly resample per type")(
      TimeSeries.gapFill(ev, "event_type", "ts", "value", "hour").count())
    spark.stop()
  }
}
