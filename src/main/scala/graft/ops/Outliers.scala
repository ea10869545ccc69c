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
  *
  * The exact default is guarded, not trusted: every exact-percentile
  * operator here probes the input (bounded, `limit`-capped) and REFUSES
  * past `maxExactRows` with a pointer to `approx = true` — a silent
  * auto-switch would change hashed results; an executor OOM at 100×
  * scale would be worse. Raising `maxExactRows` is the explicit opt-in.
  */
object Outliers {

  /** df + (lo, hi, is_outlier) columns, fences computed per group.
    * Row-preserving: the bounds join is NULL-SAFE on the group keys, so
    * null-group rows keep their (null-group) fences instead of being
    * dropped by inner-equi-join semantics.
    */
  /** Tukey fences joined back per group under caller-chosen column
    * names — the shared core of [[iqr]] and [[winsorize]].
    */
  private def withFences(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      k: Double,
      approx: Boolean,
      accuracy: Int,
      maxExactRows: Long,
      loName: String,
      hiName: String,
      op: String): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    // exact path: the input is consumed by THREE passes (guard probe,
    // fence aggregation, reinstating join) — cache it (round 20, guide
    // §5: reuse beats recompute exactly when recompute is several full
    // scans). BOUNDED by construction: the guard refuses exact inputs
    // past maxExactRows, so the cache never exceeds what a single
    // percentile buffer was already licensed to hold. Operator-owned —
    // caller releases via Caches.release(); the approx (100 TB) path
    // is untouched.
    val d = if (approx) df else Cleanse.ownedWide(df)
    if (!approx) Cleanse.guardExactPercentile(d, maxExactRows, op)
    val v = Cleanse.colRef(valueCol)
    // ONE array-percentile aggregate: two scalar percentile() calls
    // each buffer/sort the group independently — same answer, twice
    // the aggregation state and work
    val qs = array(lit(0.25), lit(0.75))
    val pcts =
      if (approx) approx_percentile(v, qs, lit(accuracy))
      else percentile(v, qs)
    val bounds = d.groupBy(groupCols.map(Cleanse.colRef): _*)
      .agg(pcts.as("_q"))
      .select(
        groupCols.map(Cleanse.colRef) ++ {
          val q1 = element_at(col("_q"), 1)
          val q3 = element_at(col("_q"), 2)
          Seq((q1 - lit(k) * (q3 - q1)).as(loName),
            (q3 + lit(k) * (q3 - q1)).as(hiName))
        }: _*)
    Cleanse.joinGroupStats(d, bounds, groupCols)
  }

  def iqr(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      k: Double = 1.5,
      approx: Boolean = false,
      accuracy: Int = 10000,
      maxExactRows: Long = 4000000L): DataFrame = {
    Seq("lo", "hi", "is_outlier").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column — rename it before iqr()"))
    val v = Cleanse.colRef(valueCol)
    withFences(df, valueCol, groupCols, k, approx, accuracy, maxExactRows,
      "lo", "hi", "Outliers.iqr")
      .withColumn("is_outlier", v < col("lo") || v > col("hi"))
  }

  /** Winsorization: CLAMP values to the Tukey fences instead of
    * flagging them — the variant a feature pipeline applies when
    * dropping rows is not an option. Same fence computation (and the
    * same approx sketch path) as [[iqr]]; the clamp is a codegen'd
    * least/greatest per row, null values pass through untouched.
    */
  def winsorize(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      k: Double = 1.5,
      approx: Boolean = false,
      accuracy: Int = 10000,
      as: String = "winsorized",
      maxExactRows: Long = 4000000L): DataFrame = {
    // fences ride collision-proofed temp names: the caller may freely
    // have (or name `as` after) lo/hi/is_outlier — those are iqr's
    // public contract, not winsorize's
    val loT = "_graft_w_lo"
    val hiT = "_graft_w_hi"
    (Seq(as, loT, hiT)).foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column — rename it before winsorize()"))
    val v = Cleanse.colRef(valueCol)
    withFences(df, valueCol, groupCols, k, approx, accuracy, maxExactRows,
      loT, hiT, "Outliers.winsorize")
      // guard the null case explicitly: least/greatest IGNORE nulls in
      // both Spark and DuckDB, so a bare clamp would rewrite a missing
      // value to the lower fence
      .withColumn(as,
        when(v.isNull, lit(null))
          .otherwise(least(greatest(v, col(loT)), col(hiT))))
      .drop(loT, hiT)
  }

  /** MAD (median-absolute-deviation) outlier flagging — the robust
    * z-score: a value is an outlier when
    * |v − median| > k · 1.4826 · MAD, with MAD = median(|v − median|)
    * and 1.4826 the normal-consistency constant. Where IQR fences go
    * degenerate on heavy-tailed or half-constant groups, MAD holds; the
    * comparison is multiplication-only (no division), so MAD = 0
    * degrades gracefully to "flag any deviation" instead of dividing by
    * zero.
    *
    * Shape: two grouped median aggregations with a broadcast join after
    * each (group count assumed dimension-small), then a codegen'd
    * per-row comparison. Exact `percentile` buffers each group — the
    * same caveat (and the same `maxExactRows` guard) as [[iqr]]; pass
    * `approx = true` for the sketch-based 100 TB path. Row-preserving
    * like [[iqr]]/[[winsorize]]: the stats joins are NULL-SAFE on the
    * group keys, so null-group rows flag against their own group's
    * median/MAD instead of silently dropping.
    */
  def mad(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      k: Double = 3.0,
      approx: Boolean = false,
      accuracy: Int = 10000,
      maxExactRows: Long = 4000000L): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    Seq("med", "mad", "dev", "is_outlier").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column — rename it before mad()"))
    // exact path: FOUR passes over the input (guard probe, median
    // aggregation, deviation-median aggregation, reinstating join) —
    // cache it, bounded by the same maxExactRows guard (see
    // withFences); the approx path is untouched
    val d = if (approx) df else Cleanse.ownedWide(df)
    if (!approx) Cleanse.guardExactPercentile(d, maxExactRows, "Outliers.mad")
    val v = Cleanse.colRef(valueCol)
    val gs = groupCols.map(Cleanse.colRef)
    def med(c: org.apache.spark.sql.Column) =
      if (approx) approx_percentile(c, lit(0.5), lit(accuracy))
      else percentile(c, lit(0.5))
    val meds = d.groupBy(gs: _*).agg(med(v).as("med"))
    // withDev is consumed TWICE (the MAD aggregation and the reinstating
    // join). Uncached, each consumer re-runs the median percentile
    // aggregation and the fence join — exchange reuse does NOT dedupe
    // the two broadcast builds (round 21, measured: q100's executed
    // plan carried the med ObjectHashAggregate twice, 0 reused
    // exchanges). Caching it makes med + dev materialize once; the
    // cache is (rows × +2 cols) on the exact path only, licensed by the
    // same maxExactRows guard as `d` (guide §5: recompute here is a
    // full percentile aggregation, strictly worse than the memory).
    val withDev =
      if (approx) Cleanse.joinGroupStats(d, meds, groupCols)
        .withColumn("dev", abs(v - col("med")))
      else graft.ops.Caches.owned(Cleanse.joinGroupStats(d, meds, groupCols)
        .withColumn("dev", abs(v - col("med"))))
    val mads = withDev.groupBy(gs: _*).agg(med(col("dev")).as("mad"))
    Cleanse.joinGroupStats(withDev, mads, groupCols)
      .withColumn("is_outlier",
        col("dev") > lit(k) * lit(1.4826) * col("mad"))
  }
}
