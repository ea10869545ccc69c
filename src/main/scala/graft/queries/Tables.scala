package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver-generated TPC-H-ish test schema
  * (`/root/repo/TESTDATA.md`). One parquet directory per table per scale
  * dir; reads are plain `spark.read.parquet` so Catalyst keeps full
  * pushdown (PushedFilters / ReadSchema pruning) into the scan.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  /** The events parquet stores TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as long
    * (legacy conf) and convert to a microsecond timestamp in-plan — the
    * generator's timestamps are whole microseconds, so truncation is
    * lossless and matches DuckDB's TIMESTAMP_NS values.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // session-wide side effect, intentionally left set: the conf must be
    // active when the relation is ANALYZED, and resetting after read()
    // would race concurrent planning in the same session. Consequence: a
    // later scan of some OTHER nanos-timestamp parquet in this session
    // yields LongType instead of PARQUET_TYPE_ILLEGAL — callers of such
    // tables should convert explicitly as done here.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, d, "events")
    import org.apache.spark.sql.functions._
    // integer div: a double `/` would round (epoch-nanos exceed a
    // double's 53-bit mantissa → ±1µs errors)
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }
  /** documents/embeddings ship as ONE small parquet file each (single
    * row-group → a single input split), so expensive per-row expressions
    * (minhash banding, simhash, SRP signatures) would serialize on one
    * core. Repartitioning to the session's parallelism costs a shuffle of
    * a few MB and buys 32× on the CPU-bound operators. At 100 TB the
    * source arrives in thousands of splits and this becomes a no-op
    * choice — a production reader would drop it.
    */
  def documents(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").repartition(s.sparkContext.defaultParallelism)
  def embeddings(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings").repartition(s.sparkContext.defaultParallelism)
}
