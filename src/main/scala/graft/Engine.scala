package graft

import org.apache.spark.sql.SparkSession

/** Production session entrypoint: one place that encodes the engine's
  * recommended Spark configuration for the 100 TB design point and
  * registers the SQL function surface.
  *
  * Knob rationale:
  *   - AQE on (+ coalescePartitions + skewJoin): runtime re-planning
  *     fixes shuffle-partition sizing and splits skewed sort-merge
  *     partitions — the first line of defense before manual salting
  *     (graft.operators.Skew is the second).
  *   - shuffle.partitions: local() sizes it to the core count; on a real
  *     cluster callers pass total executor cores (AQE coalesces down).
  *   - files.maxPartitionBytes 128m: one task ≈ one HDFS/S3 block;
  *     media tables with fat binary rows should pair this with
  *     Save.savePartitioned(maxRecordsPerFile).
  *   - parquet filter pushdown / timestamp handling left at defaults —
  *     the scan layer (Tables/Readers) already shows PushedFilters.
  */
object Engine {

  def builder(appName: String = "graft", master: Option[String] = None,
      shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "128m")
      .config("spark.sql.session.timeZone", "UTC")
    val withMaster = master.fold(b)(b.master)
    shufflePartitions.fold(withMaster)(n =>
      withMaster.config("spark.sql.shuffle.partitions", n.toString))
  }

  /** Local session sized to the host (tests/benchmarks/CLI).
    * getOrCreate semantics: if a SparkSession already exists in this JVM
    * it is returned as-is (master/core settings are NOT re-applied) —
    * only runtime confs transfer. Attach-to-existing is intentional for
    * notebooks; for a guaranteed-fresh local session stop the old one
    * first.
    */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = builder(master = Some(s"local[$cores]"),
      shufflePartitions = Some(cores))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    plans.GraftFunctions.register(spark)
    spark
  }

  /** Attach the engine's SQL functions to any existing session. */
  def attach(spark: SparkSession): SparkSession = {
    plans.GraftFunctions.register(spark)
    spark
  }
}
