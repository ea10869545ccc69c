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
}
