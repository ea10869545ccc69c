package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * [[hashSplit]] assigns each row to a split by hashing a stable id —
  * NOT by `df.sample`/`rand()`: hash assignment is (a) reproducible
  * across runs, engines, and partitionings, (b) stable under re-ingest
  * (a document keeps its split when the corpus grows — the property that
  * prevents train/eval contamination across dataset versions), and
  * (c) embarrassingly parallel (a codegen'd projection, no shuffle).
  *
  * The bucket is the first two hex chars of md5(id) — 256 buckets, so
  * fractions quantize to 1/256. md5 is bit-identical across engines,
  * which makes the assignment itself oracle-checkable (unlike any
  * rand()-seeded sampler, whose stream is engine-specific).
  */
object Split {

  /** 256-bucket assignment column: 'train' iff the two-hex-char prefix
    * of md5(id) sorts below the quantized threshold.
    */
  def assignment(id: Column, trainFrac: Double = 0.8): Column = {
    require(trainFrac > 0 && trainFrac < 1, "trainFrac in (0,1)")
    // clamp to [1, 255]: 256 would format as the 3-char "100" (breaking
    // the 2-char lexicographic compare) and 0 would empty the train side
    val buckets = math.min(math.max(math.round(trainFrac * 256).toInt, 1), 255)
    val threshold = f"$buckets%02x"
    when(substring(md5(id.cast("string")), 1, 2) < threshold, lit("train"))
      .otherwise(lit("eval"))
  }

  /** df plus a `split` column. */
  def hashSplit(df: DataFrame, idCol: String, trainFrac: Double = 0.8): DataFrame =
    df.withColumn("split", assignment(graft.ops.Cleanse.colRef(idCol), trainFrac))

  /** Seeded stratified sample: per-stratum fractions via `sampleBy` —
    * reproducible for a fixed seed within Spark (the Bernoulli stream is
    * engine-specific, so this surface is spec/rows-checked, not
    * oracle-hashed). Use [[hashSplit]] when cross-engine/cross-version
    * stability matters.
    */
  def stratified(
      df: DataFrame,
      stratumCol: String,
      fractions: Map[String, Double],
      seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Deterministic k-fold assignment for cross-validation: fold =
    * first 8 md5 hex chars of the id, mod k — the same
    * engine/partitioning/growth-stable hash argument as [[assignment]]
    * (a row keeps its fold when the corpus grows or repartitions, and
    * any engine with md5 reproduces it). Stateless per row: no shuffle.
    */
  def foldAssignment(id: Column, k: Int): Column = {
    require(k >= 2, "need at least 2 folds")
    (conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % k).as("fold")
  }

  /** df plus a `fold` column in [0, k). */
  def kfold(df: DataFrame, idCol: String, k: Int): DataFrame =
    df.withColumn("fold", foldAssignment(graft.ops.Cleanse.colRef(idCol), k))
}
