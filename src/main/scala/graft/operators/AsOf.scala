package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time join): match each left row with the most
  * recent right row at or before its timestamp, per key — the canonical
  * time-series operator Spark lacks as a built-in.
  *
  * Spark-first implementation via the published union-window technique
  * (no custom SparkPlan needed; compose-first per the extension
  * preference order):
  *
  *   1. tag both inputs and UNION them (schema-aligned),
  *   2. ONE shuffle: window partitioned by key ordered by (ts, side),
  *   3. `last(right_value, ignoreNulls)` over rows-unbounded-preceding
  *      carries the latest right row forward onto each left row.
  *
  * Versus the naive join+filter+rank (which shuffles both sides AND
  * explodes matching pairs before ranking), this is a single co-shuffle
  * and linear scan per key — the same asymptotics a custom sort-merge
  * as-of exec would have, with AQE/spill handling for free.
  *
  * A `tolerance` bounds staleness (right rows older than `ts -
  * tolerance` don't match), like the standard asof-join tolerance knob.
  */
object AsOf {

  /** @param left      rows to enrich
    * @param right     versioned/event source providing the as-of values
    * @param key       equi-key column name present in both
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param rightCols right columns to carry (surfaced as-is)
    * @param tolerance optional max staleness, e.g. `expr("INTERVAL 1 DAY")`
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tolerance: Option[Column] = None): DataFrame = {
    val cr = graft.ops.Cleanse.colRef _ // dotted/backticked names survive
    val leftCols = left.columns.toSeq
    // schema-align: left rows carry null right-payload, right rows carry
    // null left-payload; `side` breaks ts ties so a right row at exactly
    // the left ts IS visible (asof <=).
    // The right payload travels as ONE struct so every carried column
    // comes atomically from the same right row (per-column carry would
    // mix rows when a right field is legitimately null).
    val payload = struct(
      (cr(rightTs).as("_asof_ts") +: rightCols.map(c => cr(c))): _*)
    val nullPayload = lit(null).cast(
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("_asof_ts", right.schema(rightTs).dataType) +:
          rightCols.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType))))
    val taggedLeft = left
      .select(
        (Seq(cr(key).as("_key"), cr(leftTs).as("_ts"), lit(1).as("_side"),
          nullPayload.as("_p")) ++
          leftCols.map(c => cr(c).as(s"_l_$c"))): _*)
    // null keys never match in SQL join semantics; unfiltered, the window
    // partition would pair null-keyed left and right rows with each other
    val taggedRight = right
      .filter(cr(key).isNotNull)
      .select(
        (Seq(cr(key).as("_key"), cr(rightTs).as("_ts"), lit(0).as("_side"),
          payload.as("_p")) ++
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c"))): _*)
    val unioned = taggedLeft.unionByName(taggedRight)
    val w = Window.partitionBy(col("_key"))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("_c", last(col("_p"), ignoreNulls = true).over(w))
    val asofTs = col("_c").getField("_asof_ts")
    val fresh = tolerance match {
      case Some(tol) => asofTs.isNotNull && asofTs >= col("_ts") - tol
      case None => asofTs.isNotNull
    }
    carried
      .filter(col("_side") === 1)
      .select(
        (leftCols.map(c => cr(s"_l_$c").as(c)) :+
          when(fresh, asofTs).as("asof_ts")) ++
          rightCols.map(c => when(fresh, col("_c").getField(c)).as(c)): _*)
  }
}
