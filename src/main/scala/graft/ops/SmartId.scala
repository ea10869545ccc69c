package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** "Smart ID" — the reference prepends `id SERIAL PRIMARY KEY` iff no
  * case-insensitive `id` column is among the selected columns
  * (reference backend/index.js:174-184).
  *
  * Two distributed equivalents, chosen by `dense`:
  *   - default: `monotonically_increasing_id()` — unique, non-contiguous
  *     (partitionId << 33 | offset), zero shuffles, the right choice at
  *     scale for PK-surrogate semantics.
  *   - dense=true: contiguous 1..N via a two-pass per-partition-offset
  *     computation (count rows per partition, cumulative offsets, then
  *     partition-local increments) — still no global sort and no
  *     single-partition shuffle, unlike the naive
  *     `row_number().over(Window.orderBy(...))`.
  */
object SmartId {

  def hasId(columns: Seq[String]): Boolean =
    columns.exists(_.equalsIgnoreCase("id"))

  def withSmartId(df: DataFrame, dense: Boolean = false): DataFrame =
    if (hasId(df.columns.toIndexedSeq)) df
    else if (!dense) df.select((monotonically_increasing_id() + 1).as("id") +: df.columns.map(col).toIndexedSeq: _*)
    else denseIds(df)

  /** Contiguous ids without a global shuffle: spark_partition_id +
    * partition-local row_number, shifted by the cumulative row count of
    * preceding partitions (a tiny driver-side prefix sum over partition
    * counts — the data itself never moves).
    */
  private def denseIds(df: DataFrame): DataFrame = {
    val cached = df.cache()
    val counts = cached
      .groupBy(spark_partition_id().as("_pid"))
      .count()
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val nParts = if (counts.isEmpty) 0 else counts.keys.max + 1
    val offsets = (0 until nParts).scanLeft(0L) { (acc, p) =>
      acc + counts.getOrElse(p, 0L)
    }
    val offsetCol = (0 until nParts).foldLeft(lit(0L)) { (acc, p) =>
      when(spark_partition_id() === p, lit(offsets(p))).otherwise(acc)
    }
    val localRank = row_number()
      .over(Window.partitionBy(spark_partition_id()).orderBy(monotonically_increasing_id()))
    cached.select(
      (offsetCol + localRank).as("id") +: cached.columns.map(col).toIndexedSeq: _*)
  }
}
