package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the engine-side version of the reference's preview
  * feature (upload → inspect before committing types): per-column null
  * counts and exact distinct cardinalities in ONE aggregation pass
  * (multi-distinct plans via Spark's Expand), pivoted to one row per
  * column in-plan (explode over an array of structs — no driver loop).
  *
  * Exact countDistinct multiplies the scan by the number of profiled
  * columns (Expand); at the 100 TB design point swap in
  * `approx_count_distinct` (HLL, single pass) — profiling feeds human
  * decisions, where ±2% is immaterial. Exact is kept here because the
  * correctness gate hashes the output.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val cs = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cs.nonEmpty, "nothing to profile")
    // colRef for the inputs and POSITIONAL internal aliases: a profiled
    // header may itself contain dots/backticks (exactly the ingested-CSV
    // case this feeds), which would break both col(name) and a re-parse
    // of a "<name>__nulls" alias
    val aggs = cs.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        sum(when(graft.ops.Cleanse.colRef(c).isNull, 1L).otherwise(0L)).as(s"_p${i}_nulls"),
        countDistinct(graft.ops.Cleanse.colRef(c)).as(s"_p${i}_distinct"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(cs.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("col_name"),
        col(s"_p${i}_nulls").as("n_nulls"),
        col(s"_p${i}_distinct").as("n_distinct"))
    }: _*)
    one.select(explode(entries).as("p")).select(col("p.*"))
  }

  /** Equi-width histogram of a numeric column over [lo, hi): `nBins`
    * bins of width (hi−lo)/nBins, values below `lo` clamp into bin 0,
    * values at or above `hi` into bin nBins−1 (so the histogram is
    * total over non-null rows — no silent drops; nulls are excluded).
    * Returns (bin, lo_edge, hi_edge, n) with EVERY bin present, zeros
    * included — chart-ready without a driver-side fill.
    *
    * Scale shape: one codegen'd projection + one partial-aggregated
    * shuffle of at most nBins rows; the empty-bin fill joins against a
    * broadcast `sequence()` frame of nBins rows. Bin arithmetic is the
    * same IEEE subtract/divide/multiply/floor chain in every engine —
    * oracle-hashable (the [[graft.operators.ZOrder]] quantize argument).
    */
  def histogram(
      df: DataFrame,
      valueCol: String,
      lo: Double,
      hi: Double,
      nBins: Int): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val v = graft.ops.Cleanse.colRef(valueCol).cast("double")
    val bin = least(greatest(
      floor((v - lit(lo)) / (lit(hi) - lit(lo)) * lit(nBins)), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("long")
    val counts = df.filter(v.isNotNull)
      .select(bin.as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    val spark = df.sparkSession
    val allBins = spark.range(0, nBins).toDF("bin")
    allBins.join(counts, Seq("bin"), "left")
      .select(
        col("bin"),
        (lit(lo) + col("bin") * (lit(hi) - lit(lo)) / lit(nBins)).as("lo_edge"),
        (lit(lo) + (col("bin") + 1) * (lit(hi) - lit(lo)) / lit(nBins)).as("hi_edge"),
        coalesce(col("n"), lit(0L)).as("n"))
  }
}
