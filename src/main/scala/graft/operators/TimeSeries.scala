package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series resampling with gap fill: bucket an event stream to a
  * fixed grain per key and materialize EVERY bucket in each key's
  * observed span, zero-filling counts for empty buckets. Dashboards and
  * training-data drift monitors need the dense grid; a plain groupBy
  * silently drops empty buckets.
  *
  * Scale shape: one partial-aggregated shuffle for the bucket stats, one
  * tiny per-key span aggregation whose `sequence(min,max,interval)` grid
  * explodes to (span-hours × keys) rows — dense but bounded by wall-clock
  * time, not data volume (a year of hourly buckets is 8.8k rows per key
  * regardless of whether the key logged 1e3 or 1e12 events). The final
  * join co-partitions on (key, bucket).
  *
  * Emitted stats are count / min / max — order-independent aggregates
  * that hash-compare exactly across engines (a double `sum` would depend
  * on partial-aggregation order).
  */
object TimeSeries {

  /** @param unit a `date_trunc` grain also usable in an interval, e.g.
    *             "hour", "day", "minute".
    */
  def gapFill(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      unit: String): DataFrame = {
    val bkt = date_trunc(unit, col(tsCol))
    val stats = df
      .groupBy(col(keyCol).as("k"), bkt.as("bkt"))
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
    val grid = df
      .groupBy(col(keyCol).as("k"))
      .agg(min(bkt).as("t0"), max(bkt).as("t1"))
      .select(col("k"),
        explode(sequence(col("t0"), col("t1"),
          expr(s"INTERVAL 1 $unit"))).as("bkt"))
    // null-safe on the key: a null-key group aggregates fine on both
    // sides but a plain equi-join would never match it, silently
    // zero-filling buckets whose events exist (same pattern as
    // Outliers.iqr's bounds join)
    grid.alias("g")
      .join(stats.alias("s"),
        col("g.k") <=> col("s.k") && col("g.bkt") === col("s.bkt"), "left")
      .select(col("g.k").as("k"), col("g.bkt").as("bkt"),
        coalesce(col("s.n"), lit(0L)).as("n"),
        col("s.lo").as("lo"), col("s.hi").as("hi"))
  }

  /** Trailing-window rolling stats per key over a total (ts, tie)
    * order: count / min / max over the last `window` rows, plus an
    * EXACT rolling sum in integer cents (`floor(value·100)` — floor is
    * tie-free in every engine, and a bigint sum is order-independent,
    * where a rolling double sum would disagree across engines in the
    * last ulp). One shuffle on the key; the frame never leaves the
    * partition.
    */
  def rolling(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      window: Int): DataFrame = {
    require(window > 0, "window must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-(window - 1L), 0L)
    val cents = floor(col(valueCol) * 100).cast("long")
    df.select(col(keyCol), col(tsCol), col(tieCol), col(valueCol))
      .withColumn("roll_n", count(lit(1)).over(w))
      .withColumn("roll_min", min(col(valueCol)).over(w))
      .withColumn("roll_max", max(col(valueCol)).over(w))
      .withColumn("roll_sum_cents", sum(cents).over(w))
  }
}
