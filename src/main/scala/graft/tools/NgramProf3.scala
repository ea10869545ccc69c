package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.operators.Corpus
import graft.queries.Tables

/** Stage-level wall/task-time breakdown for the q77 pipeline (scratch). */
object NgramProf3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val wall = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3
        if (wall > 0.15)
          println(f"[stage] id=${i.stageId}%4d tasks=${i.numTasks}%4d wall=$wall%6.2f s  ${i.name.take(90)}")
      }
    })
    val docs = Tables.documents(spark, sfDir)
    val out = Corpus.exactNgramPairs(docs, "text", "doc_id", 0.5, 3)
    // warm run
    out.write.mode("overwrite").format("noop").save()
    println("[prof] ---- timed run ----")
    val t0 = System.nanoTime()
    Corpus.exactNgramPairs(docs, "text", "doc_id", 0.5, 3)
      .write.mode("overwrite").format("noop").save()
    println(f"[prof] total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
