package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan/profiling utility: `runMain graft.tools.Inspect <sfDir> <what>`.
  *
  *   - `explain:<query>`: print the formatted physical plan of a
  *     registered gate query (PushedFilters / ReadSchema / codegen spans).
  *   - `time:<query>`: run + time it.
  *   - `dedup-debug`: stage-by-stage row counts + timings of the
  *     MinHash-LSH pipeline (signature, banding, buckets, candidates,
  *     verify) — the operator most sensitive to corpus skew.
  */
object Inspect {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val what = args.lift(1).getOrElse("explain:q01_pricing_summary")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[inspect] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    what.split(":", 2) match {
      case Array("explain", q) =>
        graft.SparkEntry.queries(q)(spark, sfDir).explain("formatted")
      case Array("time", q) =>
        val n = timed(q)(graft.SparkEntry.queries(q)(spark, sfDir).count())
        println(s"[inspect] $q rows: $n")
      case Array("timen", q) =>
        // noop-write timing — the Bench action. count() lets
        // ColumnPruning drop projection-only work and eliminate left
        // joins against unique-keyed model tables (the q130-shaped
        // trap); use THIS mode for anything scoring-shaped.
        timed(q)(graft.SparkEntry.queries(q)(spark, sfDir)
          .write.mode("overwrite").format("noop").save())
      case Array("timen5", q) =>
        // 5 warm in-JVM reps (cache cleared between, the Bench
        // discipline) + the median — the standalone twin of a driver
        // bench number for one query.
        val times = (1 to 5).map { i =>
          spark.sharedState.cacheManager.clearCache()
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(q)(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
          val s = (System.nanoTime() - t0) / 1e9
          println(f"[inspect] $q rep $i: $s%.2fs")
          s
        }
        println(f"[inspect] $q median-of-5: ${times.sorted.apply(2)}%.2fs")
      case Array("show", q) =>
        graft.SparkEntry.queries(q)(spark, sfDir).show(100, truncate = false)
      case Array("scans", q) =>
        // Runtime scan/reuse audit: AQE exchange reuse does NOT show in
        // the static plan, so execute first (collect — gate outputs are
        // small) and read the FINAL adaptive plan, splitting off the
        // "== Initial Plan ==" section.
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        df.collect()
        val finalPlan = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        val nScan = "Scan parquet".r.findAllIn(finalPlan).length
        val nReuse = "ReusedExchange".r.findAllIn(finalPlan).length
        println(s"[inspect] $q executed plan: parquet scans=$nScan, " +
          s"reused exchanges=$nReuse")
        finalPlan.linesIterator
          .filter(l => l.contains("Scan parquet") || l.contains("ReusedExchange"))
          .foreach(l => println("[inspect]   " + l.trim.take(160)))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"/tmp/graft_plan_$q.txt"), finalPlan)
      case Array("dedup-debug") =>
        import org.apache.spark.sql.functions._
        import graft.operators.Dedup
        val docs = graft.queries.Tables.documents(spark, sfDir)
        val n = timed("docs count")(docs.count())
        println(s"[inspect] docs: $n")
        val sig = docs.select(col("doc_id"),
          Dedup.minhashSignature(col("text")).as("sig"))
        timed("signatures")(sig.count())
        val stats = timed("bucket stats")(
          Dedup.lshBucketStats(docs, "text", "doc_id").collect())
        println("[inspect] bucket_size -> n_buckets:")
        stats.foreach(r => println(s"  ${r.getLong(0)} -> ${r.getLong(1)}"))
        val cand = timed("candidates")(
          Dedup.minhashCandidates(docs, "text", "doc_id").count())
        println(s"[inspect] candidate pairs: $cand")
        val verified = timed("verify")(
          Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.7).count())
        println(s"[inspect] verified pairs: $verified")
      case other =>
        sys.error(s"unknown inspect target: ${other.mkString(":")}")
    }
    spark.stop()
  }
}
