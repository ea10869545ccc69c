package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy matching — the vocabulary-normalization dedup
  * ("red widgett" vs "red widget") that hash/shingle dedup can't do at
  * distance-1 typo granularity.
  *
  * Operates on the DISTINCT value set, not rows: a categorical column's
  * vocabulary is orders of magnitude smaller than the table (64 distinct
  * part names under 20k rows here), so the quadratic all-pairs comparison
  * runs on vocab², and results join back to rows by equality when
  * needed. For vocabularies too large for all-pairs, block first (length
  * band, first token, or an n-gram LSH from Dedup) — the join-condition
  * shape below accepts any extra blocking predicate.
  */
object Fuzzy {

  /** All distinct-value pairs within `maxDist` edits. The levenshtein
    * predicate sits INSIDE the join condition, so failing pairs are
    * rejected during the nested-loop join rather than materialized.
    */
  def nearMatches(df: DataFrame, column: String, maxDist: Int): DataFrame = {
    val v = df.select(col(column).as("value")).filter(col("value").isNotNull).distinct()
    val a = v.select(col("value").as("value_a"))
    val b = v.select(col("value").as("value_b"))
    val dist = levenshtein(col("value_a"), col("value_b"))
    a.join(broadcast(b),
      col("value_a") < col("value_b") && dist <= maxDist)
      .select(col("value_a"), col("value_b"), dist.as("dist"))
  }

  /** Canonicalization map: each value → the lexicographically-smallest
    * value within `maxDist` of it (including itself) — a one-join
    * normalize step: `df.join(canonicalize(df, c, k), df(c) === col("value"))`.
    */
  def canonicalize(df: DataFrame, column: String, maxDist: Int): DataFrame = {
    val pairs = nearMatches(df, column, maxDist)
    val v = df.select(col(column).as("value")).filter(col("value").isNotNull).distinct()
    v.join(pairs.select(col("value_b").as("value"), col("value_a").as("smaller")),
        Seq("value"), "left")
      .groupBy(col("value"))
      .agg(coalesce(min(col("smaller")), first(col("value"))).as("canonical"))
  }
}
