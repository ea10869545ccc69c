package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Corpus
import graft.queries.Tables

/** Counts for the rewritten q77 candidate stage (scratch diagnostics) —
  * replicates the NEW positional-filtered candidate block stage by
  * stage.
  */
object NgramProf2 {
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
    val threshold = 0.5
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val grams0 = Corpus.gramIndex(docs, "text", "doc_id", 3)
    val docGrams = grams0.groupBy(col("id"))
      .agg(sort_array(collect_list(col("gram"))).as("grams"),
        count(lit(1)).as("sz"))
    val dfreq = grams0.groupBy(col("gram")).agg(count(lit(1)).as("_df"))
    val w = Window.partitionBy(col("id")).orderBy(col("_df").asc, col("gram").asc)
    val ranked = grams0.join(dfreq, Seq("gram")).withColumn("pos", row_number().over(w))
    val prefixes = ranked.join(docGrams.select(col("id"), col("sz")), Seq("id"))
      .filter(col("pos") <=
        col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
      .select(col("id"), col("gram"), col("sz"), col("pos"))
    val alpha = ceil(
      lit(threshold / (1 + threshold)) * (col("sz_a") + col("sz_b")) - lit(1e-9))
    val joined = prefixes.select(
      col("id").as("id_a"), col("gram"), col("sz").as("sz_a"), col("pos").as("pos_a"))
      .join(prefixes.select(
        col("id").as("id_b"), col("gram"), col("sz").as("sz_b"), col("pos").as("pos_b")),
        Seq("gram"))
      .filter(col("id_a") < col("id_b") &&
        least(col("sz_a"), col("sz_b")).cast("double") >=
          lit(threshold) * greatest(col("sz_a"), col("sz_b")).cast("double") - lit(1e-9))
    time("joined rows")(println("[prof]   joined prefix rows = " + joined.count()))
    val grouped = joined
      .select(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"),
        (least(col("pos_a"), col("pos_b")) +
          least(col("sz_a") - col("pos_a"), col("sz_b") - col("pos_b"))).as("ubound"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("ubound")).as("ub"), first(col("sz_a")).as("sz_a"),
        first(col("sz_b")).as("sz_b"))
    time("grouped pairs")(println("[prof]   grouped pairs = " + grouped.count()))
    val cands = grouped.filter(col("ub") >= alpha).select(col("id_a"), col("id_b"))
    time("cands after positional")(println("[prof]   cands = " + cands.count()))
    val out = Corpus.exactNgramPairs(docs, "text", "doc_id", threshold, 3)
    time("full operator count")(println("[prof]   verified pairs = " + out.count()))
    spark.stop()
  }
}
