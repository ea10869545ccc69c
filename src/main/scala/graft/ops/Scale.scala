package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group feature scaling for ML preprocessing. Both scalers are one
  * grouped aggregation (dimension-small → the stats table broadcasts)
  * plus a codegen'd per-row transform — no second shuffle of the data.
  *
  * Determinism: medians/quartiles come from exact `percentile`
  * (bit-identical to DuckDB quantile_cont), min/max are order-
  * independent, and the per-row scale is a subtract + divide — single
  * IEEE ops any engine computes identically, so both scalers are
  * hash-oracle-checkable.
  */
object Scale {

  /** Robust scaler: (v − median) / (q3 − q1) per group — insensitive to
    * the outliers a 100 TB raw corpus always carries. Degenerate groups
    * (IQR = 0) yield null rather than ±Inf. `approx = true` is the
    * 100 TB path (bounded sketch per group instead of buffering every
    * value — the same flag contract as Outliers.iqr/mad, including the
    * `maxExactRows` refusal guard on the exact default).
    */
  def robust(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      as: String = "scaled",
      approx: Boolean = false,
      accuracy: Int = 10000,
      maxExactRows: Long = 4000000L): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    (Seq(as, "_med", "_iqr")).foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column — rename it before robust()"))
    // exact path: three passes over the input (guard probe, stats
    // aggregation, reinstating join) — cache it, bounded by the
    // maxExactRows guard (round 20; the Outliers treatment).
    // Operator-owned: caller releases via Caches.release().
    val d = if (approx) df else Cleanse.ownedWide(df)
    if (!approx) Cleanse.guardExactPercentile(d, maxExactRows, "Scale.robust")
    val v = Cleanse.colRef(valueCol)
    val qs = array(lit(0.25), lit(0.5), lit(0.75))
    val pcts =
      if (approx) approx_percentile(v, qs, lit(accuracy))
      else percentile(v, qs)
    val stats = d.groupBy(groupCols.map(Cleanse.colRef): _*)
      .agg(pcts.as("_q"))
      .select(groupCols.map(Cleanse.colRef) ++ Seq(
        element_at(col("_q"), 2).as("_med"),
        nullif(element_at(col("_q"), 3) - element_at(col("_q"), 1),
          lit(0.0)).as("_iqr")): _*)
    d.join(broadcast(stats), groupCols, "left")
      .withColumn(as, (v - col("_med")) / col("_iqr"))
      .drop("_med", "_iqr")
  }

  /** Min-max scaler: (v − min) / (max − min) per group, into [0, 1].
    * Constant groups yield null.
    */
  def minMax(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      as: String = "scaled"): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    (Seq(as, "_lo", "_rng")).foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column — rename it before minMax()"))
    val v = Cleanse.colRef(valueCol)
    val stats = df.groupBy(groupCols.map(Cleanse.colRef): _*)
      .agg(min(v).as("_lo"), nullif(max(v) - min(v), lit(0.0)).as("_rng"))
    df.join(broadcast(stats), groupCols, "left")
      .withColumn(as, (v - col("_lo")) / col("_rng"))
      .drop("_lo", "_rng")
  }
}
