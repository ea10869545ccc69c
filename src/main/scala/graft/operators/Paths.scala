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
    * Execution shape: ONE shuffle. Step times are a chain of k
    * whole-partition window minimums over the same user partitioning
    * (t_k = min ts of step k after t_{k-1}) — each window pass stays
    * inside the partition, and the follow-up per-user aggregation
    * reuses the window's hash partitioning, so adding funnel steps adds
    * in-partition passes, never shuffles. (The naive formulation —
    * a join + re-aggregation per step, unioned per-step counts —
    * replans the whole chain once per union branch: O(k²) aggregations
    * and k extra shuffles for identical output.)
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(userCol))
    var df = events.select(col(userCol), col(tsCol), col(typeCol))
    steps.zipWithIndex.foreach { case (step, i) =>
      val afterPrev =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step && col(tsCol) > col(s"_t${i - 1}")
      df = df.withColumn(s"_t$i",
        min(when(afterPrev, col(tsCol))).over(w))
    }
    // one row per user (window values are per-user constants); the
    // groupBy reuses the window exchange's partitioning
    val perUser = df.groupBy(col(userCol))
      .agg(max(col("_t0")).as("_t0"),
        steps.indices.drop(1).map(i => max(col(s"_t$i")).as(s"_t$i")): _*)
    val counts = perUser.agg(
      count(col("_t0")).as("_c0"),
      steps.indices.drop(1).map(i => count(col(s"_t$i")).as(s"_c$i")): _*)
    val pairs = array(steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i).as("step_idx"), lit(step).as("step"),
        col(s"_c$i").as("users"))
    }: _*)
    counts.select(explode(pairs).as("_p"))
      .select(col("_p.step_idx").as("step_idx"), col("_p.step").as("step"),
        col("_p.users").as("users"))
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
