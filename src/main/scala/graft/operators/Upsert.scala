package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch upsert/merge (SCD type-1, latest-wins): the incremental-load
  * primitive the reference's append-only `POST /save` pipeline lacks —
  * re-ingesting a corrected file should replace matching rows, not
  * duplicate them.
  *
  * Shape: union + one hash shuffle on the key (window row_number picks
  * the winner per key). At 100 TB this is the standard merge-on-read
  * pattern; the shuffle partitions by key, so it scales with the
  * combined input and never collects or broadcasts the base. When the
  * base is bucketed on the key (Save.saveBucketed), the union side
  * re-shuffles only the (typically much smaller) update set.
  */
object Upsert {

  /** Merge `updates` into `base`: for each key, the row with the highest
    * `versionCol` wins; on version ties the update side wins. Both inputs
    * must share the schema (unionByName; missing columns are an error —
    * schema drift should be resolved explicitly upstream).
    */
  private def checkReserved(df: DataFrame): Unit =
    Seq("_graft_src", "_graft_rn").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column — rename it before merging " +
          "(it would be silently clobbered and dropped)"))

  def merge(
      base: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      versionCol: String): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    checkReserved(base); checkReserved(updates)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col("_graft_src").desc)
    base.withColumn("_graft_src", lit(0))
      .unionByName(updates.withColumn("_graft_src", lit(1)))
      .withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1)
      .drop("_graft_src", "_graft_rn")
  }

  /** Merge with schema evolution: updates may add columns (they appear
    * null on base rows) — `unionByName(allowMissingColumns = true)`.
    */
  def mergeEvolving(
      base: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      versionCol: String): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    checkReserved(base); checkReserved(updates)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col("_graft_src").desc)
    base.withColumn("_graft_src", lit(0))
      .unionByName(updates.withColumn("_graft_src", lit(1)), allowMissingColumns = true)
      .withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1)
      .drop("_graft_src", "_graft_rn")
  }
}
