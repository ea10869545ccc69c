package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase timing for the q139 semDeDup chain (not part of the
  * gate surface): separates the StageCache read, the identity-guard
  * window, the driver Lloyd's loop, the assignment scan and the
  * within-cluster pair search so a slow phase is attributable.
  */
object SemProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[semprof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // the q139 input frame (salted embeddings via StageCache + copies)
    def emb() = {
      val base = graft.queries.StageCache(spark, sfDir, "salted_emb") {
        val salt = repeat(
          regexp_replace(md5(col("doc_id").cast("string")), "(.{4})", "$1 "), 5)
        graft.queries.Tables.documents(spark, sfDir)
          .select(col("doc_id"), concat(col("text"), lit(" "), salt).as("text"))
          .select(col("doc_id"),
            graft.functions.TextFunctions.embedText(col("text"), dim = 256)
              .as("emb"))
      }
      base.unionByName(base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("emb")))
    }
    time("stage build (first call)")(noop(emb()))
    time("stage read (cached parquet)")(noop(emb()))
    // identity window
    val pts = emb().select(col("doc_id").as("id"), col("emb").as("v"))
      .filter(col("v").isNotNull)
    val zero = graft.operators.Similarity.norm(col("v")) === 0.0
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("v")).orderBy(col("id"))
    val ranked = pts.filter(!zero).withColumn("_rn", row_number().over(w))
    time("identity window")(noop(ranked))
    val reps = ranked.filter(col("_rn") === 1).select(col("id"), col("v"))
    time("reps sample collect + Lloyd's (ivfIndex)") {
      graft.operators.Similarity.ivfIndex(reps, "v", 32, 256, 2000, 10)
    }
    val (assigned, cents) = graft.operators.Similarity.ivfIndex(
      reps, "v", 32, 256, 2000, 10)
    val a = assigned.select(col("id"), col("v"),
      graft.operators.Similarity.norm(col("v")).as("_n"),
      col("ivf_cluster").as("cluster")).persist()
    time("assignment + cache")(noop(a))
    val denom = col("x._n") * col("y._n")
    val cos = when(denom === 0.0, lit(0.0))
      .otherwise(graft.operators.Similarity.dot(col("x.v"), col("y.v")) / denom)
    time("pair search (cluster self-join)") {
      noop(a.as("x").join(a.as("y"),
          col("x.cluster") === col("y.cluster") && col("x.id") < col("y.id"))
        .filter(cos >= lit(0.99))
        .select(col("y.id")).distinct())
    }
    time("cluster sizes") {
      a.groupBy(col("cluster")).count().orderBy(col("count").desc).show(8)
    }
    time("full semDeDup")(noop(
      graft.operators.Similarity.semDeDup(emb(), "emb", "doc_id",
        nClusters = 32, dim = 256, eps = 0.01, sampleSize = 2000)))
    spark.stop()
  }
}
