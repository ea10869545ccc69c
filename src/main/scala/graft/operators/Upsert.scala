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

  /** Columns [[historize]] appends; inputs must not already carry them. */
  val Scd2Cols: Seq[String] = Seq("valid_from", "valid_to", "is_current")

  /** SCD type-2 historization: compress an append-only attribute log
    * into validity intervals. Rows group by `keys` and order by `seqCol`
    * (strictly monotone per key — a version number, load timestamp, or
    * log offset; must be non-null). Consecutive rows whose `tracked`
    * columns are all unchanged (null-safe comparison) collapse into one
    * interval; each surviving row gains
    *  - `valid_from` = its `seqCol`,
    *  - `valid_to`   = the next change's `valid_from` (null while open),
    *  - `is_current` = `valid_to IS NULL`.
    * Untracked columns keep the value of the interval-OPENING row (the
    * standard type-2 convention: a change in an untracked column alone
    * does not cut a new version and is not preserved).
    *
    * Scale shape: ONE hash shuffle on `keys`; both window passes and the
    * change filter run inside that single partitioning (the second
    * window reuses the first's sort order — no re-exchange, no re-sort).
    * No collects, no broadcasts; per-key state is one lagged row.
    */
  def historize(
      log: DataFrame,
      keys: Seq[String],
      seqCol: String,
      tracked: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    require(tracked.nonEmpty, "at least one tracked column")
    checkReserved(log)
    Scd2Cols.foreach(c => require(!log.columns.contains(c),
      s"input already has a '$c' column — historize appends it"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).asc)
    // first row per key always opens an interval; later rows only when a
    // tracked column differs from the previous row (IS DISTINCT FROM —
    // null-safe, so null→value and value→null both count as changes)
    val changed = tracked
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _) || lag(col(seqCol), 1).over(w).isNull
    log.withColumn("_graft_chg", changed)
      .filter(col("_graft_chg"))
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("_graft_chg")
  }

  /** Incremental SCD type-2 merge: fold a batch of raw update rows
    * (shaped like [[historize]]'s log input, `seqCol`s at or after every
    * open interval's `valid_from`) into an existing history. Closed
    * intervals pass through untouched; open intervals re-historize
    * together with the updates, so an update equal to the current open
    * row extends that interval (keeping its original `valid_from`), a
    * differing update closes it and opens a new one, and keys new to the
    * history open their first interval.
    *
    * Scale shape: the closed majority of the history is a pass-through
    * scan (no shuffle); only current rows + the update batch pay the
    * [[historize]] key shuffle.
    */
  def scd2Merge(
      history: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      seqCol: String,
      tracked: Seq[String]): DataFrame = {
    Scd2Cols.foreach(c => require(history.columns.contains(c),
      s"history is missing SCD-2 column '$c' — produce it with historize"))
    val closed = history.filter(!col("is_current"))
    val open = history.filter(col("is_current")).drop(Scd2Cols: _*)
    closed.unionByName(historize(open.unionByName(updates), keys, seqCol, tracked))
  }

  /** Apply a CDC changelog (insert/update/delete rows tagged by `opCol`,
    * totally ordered per key by `seqCol`) to produce the final table
    * state: per key the highest-`seqCol` row decides — it IS the state
    * when its op is an upsert, and the key is absent when its op is
    * `deleteOp`. Earlier rows for the key are superseded regardless of
    * op. Output keeps the changelog's columns (including `opCol` and
    * `seqCol`, which callers often project away).
    *
    * Scale shape: one hash shuffle on `keys` + a per-key top-1 window;
    * AQE handles skewed keys. Nulls in `seqCol` order LAST (explicitly,
    * so the semantics are engine-portable — see [[applyChangesTo]]).
    */
  def applyChanges(
      changes: DataFrame,
      keys: Seq[String],
      seqCol: String,
      opCol: String,
      deleteOp: String = "D"): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    checkReserved(changes)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc_nulls_last)
    changes.withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1 && col(opCol) =!= deleteOp)
      .drop("_graft_rn")
  }

  /** Apply a changelog on top of an existing base table: base rows enter
    * the log as upserts with a null `seqCol`, which orders after every
    * real change (desc NULLS LAST), so any change to a key supersedes
    * its base row and untouched keys survive unchanged.
    */
  def applyChangesTo(
      base: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      seqCol: String,
      opCol: String,
      deleteOp: String = "D"): DataFrame = {
    require(!base.columns.contains(opCol),
      s"base already has the op column '$opCol'")
    val seeded = base
      .withColumn(opCol, lit("I"))
      .withColumn(seqCol, lit(null).cast(changes.schema(seqCol).dataType))
    applyChanges(seeded.unionByName(changes), keys, seqCol, opCol, deleteOp)
  }
}
