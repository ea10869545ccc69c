package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match fact rows whose point value falls into
  * `[lo, hi)` intervals of a ranges table — the other classic operator
  * Spark plans poorly by default (a raw `BETWEEN` join becomes
  * BroadcastNestedLoopJoin: every fact row probes every interval).
  *
  * Scale technique (the published bin-bucketing approach): pick a bin
  * width, explode each interval into the bins it overlaps, bin each
  * point, then EQUI-join on the bin id and re-check the exact predicate.
  * The nested-loop O(|facts|·|ranges|) becomes a hash join of
  * O(|facts| + Σ interval-width/bin) — and at 100 TB the equi-join
  * shuffles/broadcasts like any other join, with AQE handling skewed
  * bins.
  *
  * For a SMALL ranges table the plain broadcast nested-loop is already
  * fine ([[naive]]); [[binned]] is the path for large interval sets.
  */
object RangeJoin {

  private val cr = graft.ops.Cleanse.colRef _ // dotted names survive


  /** Broadcast nested-loop formulation (small ranges side). */
  def naive(
      facts: DataFrame,
      ranges: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String): DataFrame =
    facts.join(
      broadcast(ranges),
      cr(pointCol) >= cr(loCol) && cr(pointCol) < cr(hiCol))

  /** Bin-bucketed equi-join formulation.
    *
    * @param binWidth bin size in the point column's units; intervals
    *                 spanning many bins replicate once per bin (choose
    *                 binWidth ≈ median interval width).
    */
  def binned(
      facts: DataFrame,
      ranges: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0)
    val bin = "_graft_range_bin"
    require(!facts.columns.contains(bin) && !ranges.columns.contains(bin),
      s"column $bin already exists")
    // hi's own bin is included even though the interval is half-open —
    // the exact re-check below removes boundary-bin false pairs, and any
    // epsilon subtraction would silently DROP matches when a bin edge
    // falls within the epsilon (or round away entirely for large hi).
    // Degenerate intervals (lo >= hi) are filtered — sequence() would
    // otherwise produce a descending range.
    val rBinned = ranges
      .filter(cr(loCol) < cr(hiCol))
      .withColumn(
        bin,
        explode(sequence(
          floor(cr(loCol) / binWidth).cast("long"),
          floor(cr(hiCol) / binWidth).cast("long"))))
    val fBinned = facts.withColumn(
      bin, floor(cr(pointCol) / binWidth).cast("long"))
    fBinned
      .join(rBinned, Seq(bin))
      .filter(cr(pointCol) >= cr(loCol) && cr(pointCol) < cr(hiCol))
      .drop(bin)
  }
}
