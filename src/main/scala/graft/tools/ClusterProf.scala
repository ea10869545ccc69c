package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.queries.Tables

/** Ad-hoc phase timing for the q68/q69 clustering pipelines (not part
  * of the gate surface): separates edge generation from the iterative
  * label propagation so a slow round is attributable.
  */
object ClusterProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    println(s"[prof] embeddings rows = ${emb.count()}")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm
    Similarity.allPairsSimilar(emb, "embedding", "vec_id", threshold = 0.4).count()

    val exact = time("exact edges (allPairsSimilar count)") {
      val e = Similarity.allPairsSimilar(emb, "embedding", "vec_id", threshold = 0.4)
      val n = e.count(); println(s"[prof]   exact edge count = $n"); e
    }
    time("clusters over exact edges") {
      Dedup.clusters(exact).write.mode("overwrite").format("noop").save()
    }
    // round-by-round timing of the same loop clusters() runs, to see
    // iteration count and per-round fixed overhead
    time("manual loop (exact edges)") {
      val sc = spark.sparkContext
      val pairs = exact
      val edges = pairs.select(col("id_a"), col("id_b"))
        .union(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
        .localCheckpoint()
      var labels = edges.select(col("id_a").as("id")).distinct()
        .withColumn("label", col("id")).localCheckpoint()
      def labelSum(l: org.apache.spark.sql.DataFrame) =
        l.agg(sum(col("label").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
          .collect()(0).getDecimal(0)
      var prevSum = labelSum(labels)
      var converged = false
      var it = 0
      while (!converged && it < 50) {
        val t0 = System.nanoTime()
        val nbr = edges
          .join(labels.select(col("id").as("id_b"), col("label").as("nbr_label")), Seq("id_b"))
          .groupBy(col("id_a").as("id"))
          .agg(min(col("nbr_label")).as("nbr_min"))
        val merged = labels.join(nbr, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        val mapping = merged.select(col("id").as("m_id"), col("label").as("m_label"))
        val next = merged
          .join(mapping, merged("label") === mapping("m_id"), "left")
          .select(merged("id"),
            least(merged("label"), coalesce(col("m_label"), merged("label"))).as("label"))
          .localCheckpoint()
        val tCp = System.nanoTime()
        val nextSum = labelSum(next)
        labels = next
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
        it += 1
        println(f"[prof]   round $it: checkpoint ${(tCp - t0) / 1e9}%.2f s, sum ${(System.nanoTime() - tCp) / 1e9}%.2f s")
      }
      println(s"[prof]   iterations = $it")
    }

    val lsh = time("lsh edges (embeddingNearDups count)") {
      val e = Similarity.embeddingNearDups(emb, "embedding", "vec_id",
        threshold = 0.4, dim = 64, bits = 4, tables = 64)
      val n = e.count(); println(s"[prof]   lsh edge count = $n"); e
    }
    time("clusters over lsh edges") {
      Dedup.clusters(lsh).write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
