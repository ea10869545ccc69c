package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Null imputation for feature pipelines: fill missing numerics with a
  * per-group statistic. One broadcastable grouped aggregation + a
  * codegen'd coalesce per row — no data shuffle. `median` uses exact
  * `percentile` (bit-identical to DuckDB quantile_cont, so the fill
  * values are oracle-checkable); `mean` uses `avg` (order-dependent
  * last-ulp across engines — fine in production, excluded from hash
  * gates); `constant` needs no aggregation at all.
  *
  * Groups whose statistic is itself null (all-null group) leave the
  * value null — imputation never invents data.
  *
  * The exact-median default carries the same bounded-probe guard as
  * `Outliers`: inputs past `maxExactRows` are refused with a pointer to
  * `approx = true` (never silently switched — the fill values are
  * hash-gated).
  */
object Impute {

  sealed trait Strategy
  case object Median extends Strategy
  case object Mean extends Strategy
  final case class Constant(value: Double) extends Strategy

  def byGroup(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      strategy: Strategy = Median,
      as: String = "imputed",
      approx: Boolean = false,
      accuracy: Int = 10000,
      maxExactRows: Long = 4000000L): DataFrame = {
    require(!df.columns.contains(as),
      s"input already has a '$as' column — rename it before impute()")
    val v = Cleanse.colRef(valueCol)
    strategy match {
      case Constant(c) =>
        // no grouping involved — groupCols may legitimately be empty
        df.withColumn(as, coalesce(v, lit(c)))
      case s =>
        require(groupCols.nonEmpty, "at least one group column")
        // only the exact-median path buffers whole groups; Mean's state
        // is a fixed-size (sum, count) pair and needs no guard
        // exact-median path: three passes over the input (guard probe,
        // stats aggregation, reinstating join) — cache it, bounded by
        // the maxExactRows guard (round 20; the Outliers treatment).
        // Operator-owned: caller releases via Caches.release().
        val d =
          if (s == Median && !approx) Cleanse.ownedWide(df) else df
        if (s == Median && !approx)
          Cleanse.guardExactPercentile(d, maxExactRows, "Impute.byGroup")
        val fillExpr = s match {
          case Median if approx => approx_percentile(v, lit(0.5), lit(accuracy))
          case Median => percentile(v, lit(0.5))
          case _ => avg(v)
        }
        val stats = d.groupBy(groupCols.map(Cleanse.colRef): _*)
          .agg(fillExpr.as("_fill"))
        // null-safe stats join: null-group rows impute from their own group
        Cleanse.joinGroupStats(d, stats, groupCols)
          .withColumn(as, coalesce(v, col("_fill")))
          .drop("_fill")
    }
  }
}
