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
    else if (!dense) df.select((monotonically_increasing_id() + 1).as("id") +: df.columns.map(Cleanse.colRef).toIndexedSeq: _*)
    else denseIds(df)

  /** Contiguous ids without a global sort: RDD zipWithIndex — one count
    * pass over partition sizes, then partition-local offsets. No shuffle,
    * no single-partition bottleneck; the one legitimate RDD drop-down in
    * the codebase (a plan-level formulation can't keep partition identity
    * stable across stages: spark_partition_id() re-evaluates after any
    * exchange).
    */
  private def denseIds(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(
        "id", org.apache.spark.sql.types.LongType, nullable = false) +: df.schema.fields)
    val rows = df.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq((i + 1L) +: r.toSeq)
    }
    spark.createDataFrame(rows, schema)
  }
}
