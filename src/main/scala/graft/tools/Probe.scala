package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.HashExpressions
import graft.queries.Tables

/** Ad-hoc diagnostics for the dedup bucket distributions (not part of
  * the gate surface).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)

    // SimHash chunk-bucket distribution (q31 operating point: maxHamming=8
    // -> 9 chunks of 7 bits)
    val fp = docs.select(col("doc_id").as("id"),
      HashExpressions.simHash64OfText(col("text")).as("fp"))
    val k = 8 + 1
    val bitsPer = 64 / k
    val banded = fp.select(col("id"),
      explode(transform(sequence(lit(0), lit(k - 1)), c =>
        struct(c.as("chunk"),
          call_function("shiftrightunsigned", col("fp"), c * lit(bitsPer))
            .bitwiseAND(lit((1L << bitsPer) - 1)).as("ch")))).as("cc"))
      .select(col("cc.chunk").as("chunk"), col("cc.ch").as("ch"))
    val dist = banded.groupBy("chunk", "ch").count()
      .agg(max("count").as("max_bucket"), sum(col("count") * (col("count") - 1) / 2).as("pair_volume"))
    println("SIMHASH k=" + k + " bitsPer=" + bitsPer)
    dist.show(false)

    // MinHash band-bucket distribution
    val mh = docs.select(col("doc_id").as("id"),
      posexplode(HashExpressions.minhashBandHashes(
        array_join(graft.functions.TextFunctions.tokens(col("text")), " "),
        5, 64, 8)).as(Seq("band", "bh")))
    val mdist = mh.groupBy("band", "bh").count()
      .agg(max("count").as("max_bucket"),
        sum(when(col("count") <= 500, col("count") * (col("count") - 1) / 2).otherwise(0)).as("pair_volume_capped"),
        sum(col("count") * (col("count") - 1) / 2).as("pair_volume_raw"))
    println("MINHASH 8 bands")
    mdist.show(false)

    println("DISTINCT FPS + group sizes")
    fp.groupBy("fp").count()
      .agg(count(lit(1)).as("n_distinct_fp"), max("count").as("max_same_fp"),
        sum(col("count") * (col("count") - 1) / 2).as("same_fp_pairs"))
      .show(false)

    println("Q30 STAGE TIMINGS")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(s"  $label: ${(System.nanoTime() - t0) / 1e9}s")
      r
    }
    time("warm docs count")(docs.count())
    val cand = time("candidates") {
      val c = graft.operators.Dedup.minhashCandidates(docs, "text", "doc_id")
      println(s"    n=${c.count()}")
      c
    }
    time("full q30") {
      graft.operators.Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.7)
        .write.mode("overwrite").format("noop").save()
    }
    time("full q30 again") {
      graft.operators.Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.7)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
