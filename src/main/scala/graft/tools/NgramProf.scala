package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Corpus
import graft.queries.Tables

/** Stage-level timing for the exact n-gram pair join (q77) — not part
  * of the gate surface.
  */
object NgramProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val threshold = 0.5
    // warm
    Corpus.exactNgramPairs(docs, "text", "doc_id", threshold, 3).count()

    val grams0 = Corpus.gramIndex(docs, "text", "doc_id", 3)
    time("gramIndex count")(println("[prof]   grams = " + grams0.count()))
    val docGrams = grams0.groupBy(col("id"))
      .agg(sort_array(collect_list(col("gram"))).as("grams"),
        count(lit(1)).as("sz"))
    time("docGrams noop")(docGrams.write.mode("overwrite").format("noop").save())
    val dfreq = grams0.groupBy(col("gram")).agg(count(lit(1)).as("_df"))
    time("dfreq count")(println("[prof]   distinct grams = " + dfreq.count()))
    val w = Window.partitionBy(col("id")).orderBy(col("_df").asc, col("gram").asc)
    val ranked = grams0.join(dfreq, Seq("gram")).withColumn("pos", row_number().over(w))
    val prefixes = ranked.join(docGrams.select(col("id"), col("sz")), Seq("id"))
      .filter(col("pos") <=
        col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
      .select(col("id"), col("gram"), col("sz"))
    time("prefixes count")(println("[prof]   prefix rows = " + prefixes.count()))
    val cands = prefixes.select(col("id").as("id_a"), col("gram"), col("sz").as("sz_a"))
      .join(prefixes.select(col("id").as("id_b"), col("gram"), col("sz").as("sz_b")),
        Seq("gram"))
      .filter(col("id_a") < col("id_b") &&
        least(col("sz_a"), col("sz_b")).cast("double") >=
          lit(threshold) * greatest(col("sz_a"), col("sz_b")).cast("double") - lit(1e-9))
      .select(col("id_a"), col("id_b"))
      .distinct()
    time("cands count")(println("[prof]   candidate pairs = " + cands.count()))
    val verified = cands
      .join(docGrams.select(col("id").as("id_a"), col("grams").as("grams_a"),
        col("sz").as("sz_a")), Seq("id_a"))
      .join(docGrams.select(col("id").as("id_b"), col("grams").as("grams_b"),
        col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("grams_a"), col("grams_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    time("verified noop")(verified.write.mode("overwrite").format("noop").save())
    time("full operator noop") {
      Corpus.exactNgramPairs(docs, "text", "doc_id", threshold, 3)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
