package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary profiling harness (not part of the library). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm
    docs.count()

    val grams0 = graft.operators.Corpus.gramIndex(docs, "text", "doc_id", 3)
    time("gramIndex count")(println(grams0.count()))
    time("gramIndex count again")(println(grams0.count()))

    // variant A: tokenize once into an attribute, ngram off the attribute
    import graft.functions.TextFunctions
    val n = 3
    val toksDf = docs.select(col("doc_id").as("id"),
      TextFunctions.tokens(col("text")).as("_toks"))
    val gramsA = toksDf.select(col("id"), explode(array_distinct(
      when(size(col("_toks")) - (n - 1) < 1, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(col("_toks")) - (n - 1)),
          i => array_join(slice(col("_toks"), i, lit(n)), " "))))).as("gram"))
    time("gramsA count")(println(gramsA.count()))
    time("gramsA count again")(println(gramsA.count()))
    gramsA.explain("formatted")
    val sizes = grams0.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    time("sizes noop")(sizes.write.mode("overwrite").format("noop").save())
    val pairs = grams0.select(col("id").as("id_a"), col("gram"))
      .join(grams0.select(col("id").as("id_b"), col("gram")), Seq("gram"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    time("pairs noop")(pairs.write.mode("overwrite").format("noop").save())
    val full = graft.operators.Corpus.exactNgramPairs(docs, "text", "doc_id", 0.5, 3)
    time("full q77 noop")(full.write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
