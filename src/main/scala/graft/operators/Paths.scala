package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-path analytics over a (user, timestamp, event-type) log: ordered
  * funnels and first-order transition counts. Both are driver-loop-free,
  * shuffle on the user key only, and emit integer counts — the
  * engine-portable output shape (no float summation order to disagree on).
  *
  * Reference scope: the reference engine ships no event-path operators;
  * these extend the analytics surface for the training-data/product-
  * analytics pipelines described in SURVEY.md §2 extensions.
  */
object Paths {

  /** Ordered funnel: a user reaches step k when the steps `steps(0..k)`
    * occur in strict timestamp order (each matched at its EARLIEST
    * possible occurrence after the previous step — the standard greedy
    * chain, which maximizes reachability). Returns one row per step:
    * (step_idx, step, users).
    *
    * Execution shape: step 0 is one aggregation on the user key; each
    * later step is a join + min-aggregation on the SAME key, so every
    * shuffle after the first co-partitions with the reached set. The
    * number of Spark jobs is 0 (lazy) — the k frames union into one plan
    * and the k aggregations share the scan via whole-stage reuse at
    * execution. k is the funnel length (small, bounded by the caller).
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val u = col(userCol)
    var reached = events.filter(col(typeCol) === steps.head)
      .groupBy(u).agg(min(col(tsCol)).as("t"))
    var out = reached.agg(
      lit(0).as("step_idx"), lit(steps.head).as("step"),
      count(lit(1)).as("users")) :: Nil
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      val nxt = events.filter(col(typeCol) === step)
        .join(reached.select(u.as("_u"), col("t").as("_t")),
          u === col("_u") && col(tsCol) > col("_t"))
        .groupBy(u).agg(min(col(tsCol)).as("t"))
      reached = nxt
      out = reached.agg(
        lit(i).as("step_idx"), lit(step).as("step"),
        count(lit(1)).as("users")) :: out
    }
    out.reverse.reduce(_.union(_))
  }

  /** First-order transition counts: for each user's event stream ordered
    * by (ts, tieCol), count (previous type → current type) pairs. The
    * tie column makes the ordering total, so results are deterministic
    * under any partitioning. One shuffle (user key) for the lag window,
    * one partial-aggregated shuffle for the pair counts.
    */
  def transitions(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tieCol: String,
      typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
  }
}
