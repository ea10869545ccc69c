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

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      graft.ops.Caches.release()
      spark.catalog.clearCache()
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    def q163(scoreFilter: org.apache.spark.sql.Column): DataFrame = {
      val docs = graft.queries.Tables.documents(spark, sfDir)
      val lang = expr(
        "CASE doc_id % 3 WHEN 0 THEN 'aa' WHEN 1 THEN 'bb' ELSE 'cc' END")
      def vocab(words: Seq[String]): org.apache.spark.sql.Column =
        concat_ws(" ", (0 until 8).map(i =>
          element_at(
            array(words.map(lit): _*),
            ((col("doc_id") * 7 + i * 3) % words.size + 1).cast("int"))): _*)
      val text = when(col("doc_id") % 3 === 0,
        vocab(Seq("alpha", "arbor", "anchor", "amber", "apex", "argon")))
        .when(col("doc_id") % 3 === 1,
          vocab(Seq("birch", "basalt", "beacon", "bramble", "bisque", "borax")))
        .otherwise(
          vocab(Seq("cedar", "cobalt", "cairn", "crimson", "cumin", "cypress")))
      val corpus = docs.select(col("doc_id"), lang.as("lang"), text.as("text"))
      val trainSlice = corpus.filter(col("doc_id") % 10 === 0)
      val wh = java.nio.file.Files.createTempDirectory("graft_prof_wh").toString
      graft.operators.Corpus.saveLangIdModel(spark, wh, "langid",
        graft.operators.Corpus.trainLangId(
          trainSlice, "text", "lang", "doc_id", iters = 4))
      graft.operators.Corpus.saveLmNModel(spark, wh, "reflm",
        graft.operators.Corpus.ngramBackoffModel(trainSlice, "text", "doc_id", n = 3))
      graft.operators.Corpus.ccnetBucketsWith(
          corpus.filter(scoreFilter),
          graft.operators.Corpus.loadLmNModel(spark, wh, "reflm"),
          graft.operators.Corpus.loadLangIdModel(spark, wh, "langid"),
          "text", "doc_id")
        .select(col("id"), col("lang"), col("bucket"))
        .orderBy(col("id"))
    }

    // train-only leg: how much of the gate is model build + persist?
    def trainOnly(): Unit = {
      val docs = graft.queries.Tables.documents(spark, sfDir)
      val corpus = docs.select(col("doc_id"),
        expr("CASE doc_id % 3 WHEN 0 THEN 'aa' WHEN 1 THEN 'bb' ELSE 'cc' END").as("lang"),
        concat(lit("alpha arbor anchor amber apex argon x"), col("doc_id")).as("text"))
      val trainSlice = corpus.filter(col("doc_id") % 10 === 0)
      val wh = java.nio.file.Files.createTempDirectory("graft_prof_wh2").toString
      graft.operators.Corpus.saveLangIdModel(spark, wh, "langid",
        graft.operators.Corpus.trainLangId(
          corpus.filter(col("doc_id") % 10 === 0)
            .select(col("doc_id"), col("lang"),
              concat(col("text"), lit(" "), col("lang")).as("text")),
          "text", "lang", "doc_id", iters = 4))
      graft.operators.Corpus.saveLmNModel(spark, wh, "reflm",
        graft.operators.Corpus.ngramBackoffModel(trainSlice, "text", "doc_id", n = 3))
    }

    noop(q163(col("doc_id") % 10 >= 1 && col("doc_id") % 10 <= 3)) // warmup
    val docs0 = graft.queries.Tables.documents(spark, sfDir)
    val lang0 = expr(
      "CASE doc_id % 3 WHEN 0 THEN 'aa' WHEN 1 THEN 'bb' ELSE 'cc' END")
    def vocab0(words: Seq[String]): org.apache.spark.sql.Column =
      concat_ws(" ", (0 until 8).map(i =>
        element_at(
          array(words.map(lit): _*),
          ((col("doc_id") * 7 + i * 3) % words.size + 1).cast("int"))): _*)
    val text0 = when(col("doc_id") % 3 === 0,
      vocab0(Seq("alpha", "arbor", "anchor", "amber", "apex", "argon")))
      .when(col("doc_id") % 3 === 1,
        vocab0(Seq("birch", "basalt", "beacon", "bramble", "bisque", "borax")))
      .otherwise(
        vocab0(Seq("cedar", "cobalt", "cairn", "crimson", "cumin", "cypress")))
    val corpus0 = docs0.select(col("doc_id"), lang0.as("lang"), text0.as("text"))
    val train0 = corpus0.filter(col("doc_id") % 50 === 0)
    for (_ <- 1 to 2) {
      var lid: graft.operators.Corpus.LangIdModel = null
      var lm: graft.operators.Corpus.LmNModel = null
      val wh = java.nio.file.Files.createTempDirectory("graft_prof_ph").toString
      time("phase trainLangId(4 iters, 2%)")(
        { lid = graft.operators.Corpus.trainLangId(train0, "text", "lang", "doc_id", iters = 4) })
      time("phase saveLangIdModel")(
        graft.operators.Corpus.saveLangIdModel(spark, wh, "langid", lid))
      time("phase ngramBackoffModel+save")(
        { lm = graft.operators.Corpus.ngramBackoffModel(train0, "text", "doc_id", n = 3)
          graft.operators.Corpus.saveLmNModel(spark, wh, "reflm", lm) })
      time("phase load both")(
        { graft.operators.Corpus.loadLmNModel(spark, wh, "reflm")
          graft.operators.Corpus.loadLangIdModel(spark, wh, "langid"); () })
      time("phase score+ntile (30%)")(
        noop(graft.operators.Corpus.ccnetBucketsWith(
          corpus0.filter(col("doc_id") % 10 >= 1 && col("doc_id") % 10 <= 3),
          graft.operators.Corpus.loadLmNModel(spark, wh, "reflm"),
          graft.operators.Corpus.loadLangIdModel(spark, wh, "langid"),
          "text", "doc_id").select(col("id"), col("lang"), col("bucket"))))
    }
    spark.stop()
  }
}
