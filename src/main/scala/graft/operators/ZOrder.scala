package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the data-layout operator for
  * multi-dimensional file skipping at 100 TB: rows nearby in several
  * key dimensions at once are placed nearby in the sorted output, so
  * parquet row-group min/max stats stay tight on EVERY key column and a
  * scan with predicates on any of them prunes most files. A plain
  * `ORDER BY a, b` only achieves this for the leading column; the
  * interleaved-bit curve shares locality across dimensions.
  *
  * Everything is closed-form shift/mask column arithmetic — codegen'd,
  * no UDFs, and exactly mirrorable in SQL (the q84 oracle re-derives
  * the curve value in DuckDB bit ops).
  */
object ZOrder {

  /** Morton value: interleave the low `bits` bits of each column (all
    * assumed already quantized to [0, 2^bits), e.g. via [[quantize]]) —
    * bit `b` of `cols(i)` lands at output bit `b * n + i`.
    */
  def zValue(cols: Seq[Column], bits: Int = 8): Column = {
    require(cols.nonEmpty, "need at least one column")
    require(bits > 0 && bits * cols.size <= 63,
      s"bits * dims must fit a long, got $bits * ${cols.size}")
    val n = cols.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Quantize a numeric column to [0, 2^bits) over closed bounds
    * [lo, hi] (values outside clamp to the edge buckets). Bounds are
    * caller-supplied constants, not computed from the data: at 100 TB a
    * min/max pre-pass is a full extra scan, and stable bounds keep the
    * curve value of a row fixed as the corpus grows.
    */
  def quantize(c: Column, lo: Double, hi: Double, bits: Int = 8): Column = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    require(bits > 0 && bits <= 31, "bits in [1,31]")
    val buckets = (1L << bits).toDouble
    least(
      greatest(floor((c - lo) / (hi - lo) * buckets), lit(0.0)),
      lit(buckets - 1)).cast("long")
  }

  /** Rewrite `df`'s layout along the z-curve of `keys`
    * (column, lo, hi) triples: range-partition by the curve value, sort
    * within partitions, drop the helper column. Write the result and
    * every file covers a compact curve segment — a tight bounding box
    * in all key dimensions.
    *
    * Scale shape: one range-exchange (sampled boundaries, the same
    * mechanics as a global sort) + an in-partition sort; no join, no
    * aggregation. `numPartitions = 0` defers to AQE / default
    * parallelism.
    */
  def cluster(
      df: DataFrame,
      keys: Seq[(String, Double, Double)],
      bits: Int = 8,
      numPartitions: Int = 0): DataFrame = {
    require(keys.nonEmpty, "need at least one key")
    val zc = "_graft_zvalue"
    require(!df.columns.contains(zc), s"column $zc already exists")
    val z = zValue(
      keys.map { case (c, lo, hi) =>
        quantize(graft.ops.Cleanse.colRef(c), lo, hi, bits)
      }, bits)
    val withZ = df.withColumn(zc, z)
    val parted =
      if (numPartitions > 0) withZ.repartitionByRange(numPartitions, col(zc))
      else withZ.repartitionByRange(col(zc))
    parted.sortWithinPartitions(col(zc)).drop(zc)
  }
}
