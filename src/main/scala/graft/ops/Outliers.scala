package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IQR outlier flagging — the numeric data-quality filter (Tukey
  * fences): a value is an outlier in its group when it falls outside
  * [q1 - k·IQR, q3 + k·IQR].
  *
  * Shape: one grouped percentile aggregation over the data (group
  * count assumed dimension-small → the bounds table broadcasts), then a
  * codegen'd per-row comparison. `approx = true` is the 100 TB path:
  * `approx_percentile` keeps a bounded KLL-style sketch per group
  * instead of buffering every value — fence positions tolerate sketch
  * error. Exact is the default because the primary gate hashes the
  * output; the approx path has its own tolerance-band gate (q70).
  */
object Outliers {

  /** df + (lo, hi, is_outlier) columns, fences computed per group.
    * Row-preserving: the bounds join is NULL-SAFE on the group keys, so
    * null-group rows keep their (null-group) fences instead of being
    * dropped by inner-equi-join semantics.
    */
  def iqr(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      k: Double = 1.5,
      approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    Seq("lo", "hi", "is_outlier").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column — rename it before iqr()"))
    val v = Cleanse.colRef(valueCol)
    def pct(p: Double) =
      if (approx) approx_percentile(v, lit(p), lit(accuracy))
      else percentile(v, lit(p))
    val bounds = df.groupBy(groupCols.map(Cleanse.colRef): _*)
      .agg(
        pct(0.25).as("_q1"),
        pct(0.75).as("_q3"))
      .select(
        groupCols.map(Cleanse.colRef) ++ Seq(
          (col("_q1") - lit(k) * (col("_q3") - col("_q1"))).as("lo"),
          (col("_q3") + lit(k) * (col("_q3") - col("_q1"))).as("hi")): _*)
    val d = df.alias("d")
    val b = broadcast(bounds.alias("b"))
    def q(n: String) = n.replace("`", "``")
    val cond = groupCols.map(n =>
      col(s"d.`${q(n)}`") <=> col(s"b.`${q(n)}`")).reduce(_ && _)
    d.join(b, cond)
      .select(col("d.*"), col("b.lo"), col("b.hi"))
      .withColumn("is_outlier", v < col("lo") || v > col("hi"))
  }
}
