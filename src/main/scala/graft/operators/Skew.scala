package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot join keys — the manual complement
  * to AQE's skew-join splitting (AQE only splits SORT-MERGE partitions;
  * a pathologically hot key inside one task can still need salting, and
  * pre-AQE engines or stream-static joins can't use it at all).
  *
  * Standard salting recipe: replicate the SMALL side `salt` times
  * (explode over 0..salt-1) and give each BIG-side row a deterministic
  * per-row salt (hash of the whole row, NOT rand() — deterministic
  * re-execution matters for task retries), so a hot key's rows scatter
  * over `salt` sub-keys while each row still meets exactly one replica
  * of its match.
  */
object Skew {

  /** Inner equi-join of a skewed BIG side with a smaller side, salted:
    * big rows scatter across `salt` sub-keys (deterministic per row via
    * a row hash, so co-grouped hot keys split across tasks); the small
    * side is replicated once per sub-key. Result equals
    * `big.join(small, keys)` exactly.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salt: Int = 16): DataFrame = {
    require(salt > 0)
    val bigSalted = big.withColumn(
      "_salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salt)).cast("int"))
    val replicas = small.withColumn(
      "_salt", explode(sequence(lit(0), lit(salt - 1))))
    val joined = bigSalted.join(replicas, Seq(key, "_salt"))
    joined.drop("_salt")
  }

  /** Top-n heaviest key values with counts — the observability half:
    * decide WHETHER to salt before paying for it.
    */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topN)
}
