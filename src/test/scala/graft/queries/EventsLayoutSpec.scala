package graft.queries

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.SparkSpec
import graft.streaming.Streams

/** Layout regression for the events adapter (VERDICT r9 item 2): the
  * driver's generator has shipped `ts` as parquet TIMESTAMP(NANOS)
  * (rounds ≤8) and as TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 9+),
  * a UTC-adjusted TIMESTAMP(MICROS) is the third plausible layout, and
  * legacy INT96 (Spark ≤2.x / Impala default) the fourth.
  * `Tables.events` / `Streams.readEvents` must return identical
  * rows+schema over every layout, so a future regeneration cannot dark
  * the 11 events gates again. Fixtures are written with parquet-mr
  * directly (Spark cannot write a NANOS-annotated column) except INT96,
  * which Spark itself writes under outputTimestampType; one file per
  * layout, identical logical rows.
  */
class EventsLayoutSpec extends SparkSpec {

  /** Whole-microsecond instants incl. sub-millisecond digits (catches a
    * millis-precision truncation) spanning two distinct values per user.
    */
  private val microsTs: Seq[Long] = Seq(
    1600000000123456L, 1600000003000000L, 1600003600999001L, 1600007200000123L)

  private def eventsSchema(tsAnno: LogicalTypeAnnotation): MessageType =
    Types.buildMessage()
      .addField(Types.optional(INT64).named("event_id"))
      .addField(Types.optional(INT64).as(tsAnno).named("ts"))
      .addField(Types.optional(INT64).named("user_id"))
      .addField(Types.optional(BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("event_type"))
      .addField(Types.optional(DOUBLE).named("value"))
      .addField(Types.optional(BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("props"))
      .named("events")

  /** Writes one events.parquet under a fresh dir; `tsOf` maps the
    * canonical micros instant to the stored int64 for the layout.
    */
  private def writeLayout(
      tsAnno: LogicalTypeAnnotation, tsOf: Long => Long): String = {
    val dir = Files.createTempDirectory("graft_events_layout")
    val schema = eventsSchema(tsAnno)
    val writer = ExampleParquetWriter
      .builder(new HPath(dir.resolve("events.parquet").toString))
      .withType(schema)
      .build()
    val groups = new SimpleGroupFactory(schema)
    try microsTs.zipWithIndex.foreach { case (us, i) =>
      val g = groups.newGroup()
      g.add("event_id", i.toLong)
      g.add("ts", tsOf(us))
      g.add("user_id", (i % 2).toLong)
      g.add("event_type", if (i % 2 == 0) "view" else "click")
      g.add("value", i * 1.5)
      g.add("props", s"""{"i":$i}""")
      writer.write(g)
    } finally writer.close()
    dir.toString
  }

  /** Fourth layout: legacy INT96 timestamps, what Spark ≤2.x and Impala
    * writers produce by default. Spark itself writes it under the
    * outputTimestampType conf and reads it back as TimestampType, so the
    * adapter's pass-through branch must cover it.
    */
  private def writeInt96Layout(): String = {
    val dir = Files.createTempDirectory("graft_events_layout")
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try {
      import spark.implicits._
      microsTs.zipWithIndex.map { case (us, i) =>
        val t = new java.sql.Timestamp(us / 1000L)
        t.setNanos(((us % 1000000L) * 1000L).toInt)
        (i.toLong, t, (i % 2).toLong,
          if (i % 2 == 0) "view" else "click", i * 1.5, s"""{"i":$i}""")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/_int96_out")
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    // flatten Spark's part-file directory to the single-file shape the
    // other layout fixtures use (the adapters accept either; the specs
    // probe bare dirs, which only see flat files)
    val part = Files.list(dir.resolve("_int96_out")).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet")).head
    Files.move(java.nio.file.Paths.get(part), dir.resolve("events.parquet"))
    dir.toString
  }

  private lazy val layouts: Map[String, String] = Map(
    "int64-nanos" -> writeLayout(
      LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS), _ * 1000L),
    "timestamp-micros-ntz" -> writeLayout(
      LogicalTypeAnnotation.timestampType(false, TimeUnit.MICROS), identity),
    "timestamp-micros-utc" -> writeLayout(
      LogicalTypeAnnotation.timestampType(true, TimeUnit.MICROS), identity),
    "int96-legacy" -> writeInt96Layout())

  test("Tables.events yields identical rows and schema over every ts layout") {
    val read = layouts.map { case (name, dir) =>
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType == TimestampType,
        s"$name: adapter must normalize ts to TimestampType")
      name -> df.select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
        .orderBy("event_id").collect().toSeq
    }
    // exact micros preserved (no millis truncation, no ±1µs double rounding)
    for ((name, rows) <- read) {
      assert(rows.map(_.getLong(1)) == microsTs, s"$name: micros mismatch")
    }
    // full-row equality across layouts
    val ref = read("timestamp-micros-ntz")
    for ((name, rows) <- read) assert(rows == ref, s"$name != ntz layout")
  }

  test("Tables.events nanos retry carries the caller's session timezone") {
    // the retry runs on a dedicated newSession(), and runtime confs do
    // NOT propagate there — without the explicit copy, date functions
    // driven from the returned frame would resolve in the JVM default
    // zone instead of the caller's (the Streams.readEvents rule)
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val df = Tables.events(spark, layouts("int64-nanos"))
      val viaNanos = df.select(date_format(col("ts"), "yyyy-MM-dd HH").as("d"))
        .orderBy(col("d")).collect().map(_.getString(0)).toSeq
      // reference: the UTC-annotated layout is instant-exact under ANY
      // session tz (the NTZ layout is NOT a valid reference here — its
      // cast reinterprets wall time in the session zone, which is why
      // the adapter documents the UTC-session assumption)
      val viaUtc = Tables.events(spark, layouts("timestamp-micros-utc"))
        .select(date_format(col("ts"), "yyyy-MM-dd HH").as("d"))
        .orderBy(col("d")).collect().map(_.getString(0)).toSeq
      // identical local renderings ⇒ the retry session saw the same tz
      assert(viaNanos == viaUtc)
      assert(viaNanos.nonEmpty)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("Tables.events read order is layout-independent (probe conf does not leak)") {
    // reading a nanos file must not leave the legacy conf set for later reads
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong") // clean slate
    Tables.events(spark, layouts("int64-nanos")).collect()
    // unset restores the registered default ("false"), so check the value
    assert(!spark.conf.get("spark.sql.legacy.parquet.nanosAsLong").toBoolean)
    val after = Tables.events(spark, layouts("timestamp-micros-ntz"))
    assert(after.schema("ts").dataType == TimestampType)
  }

  test("Streams.readEvents probes the physical layout per directory") {
    for ((name, dir) <- layouts) {
      val stream = Streams.readEvents(spark, dir)
      assert(stream.isStreaming, name)
      assert(stream.schema("ts").dataType == TimestampType,
        s"$name: stream adapter must normalize ts to TimestampType")
    }
  }

  test("Streams.readEvents converts the legacy nanos layout end-to-end") {
    // run the layout no longer covered by the driver testdata through a
    // real micro-batch to a memory sink (StreamsSpec covers the current
    // one). Nanos streams run on a dedicated session, so the memory
    // sink registers in THAT session's catalog — query it there.
    val stream = Streams.readEvents(spark, layouts("int64-nanos"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("events_nanos_layout").start()
    try {
      q.processAllAvailable()
      val got = stream.sparkSession.table("events_nanos_layout")
        .select(unix_micros(col("ts"))).orderBy("event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(got == microsTs)
    } finally q.stop()
  }

  test("nanos stream leaves sibling session analyses untouched (conf isolated)") {
    // The VERDICT r10 hole: the stream-lifetime nanosAsLong conf was
    // session-global, so a CONCURRENT batch read of a different
    // nanos-annotated parquet silently inferred LongType. Now the
    // stream runs on its own session: while it is live, (a) the
    // caller's session never sees the conf, (b) a batch NTZ read still
    // normalizes to TimestampType, and (c) a batch read of a DIFFERENT
    // nanos file in the caller's session still takes the
    // PARQUET_TYPE_ILLEGAL → retry path rather than LongType.
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val stream = Streams.readEvents(spark, layouts("int64-nanos"))
    assert(stream.sparkSession ne spark, "nanos stream must isolate its session")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("events_nanos_iso").start()
    try {
      q.processAllAvailable()
      assert(!spark.conf.get("spark.sql.legacy.parquet.nanosAsLong").toBoolean,
        "legacy conf leaked into the caller's session")
      val ntz = Tables.events(spark, layouts("timestamp-micros-ntz"))
      assert(ntz.schema("ts").dataType == TimestampType)
      // raw read (no adapter) of a nanos file must still REJECT in the
      // caller's session — proof the conf is not ambiently set there
      val raw = intercept[org.apache.spark.sql.AnalysisException](
        spark.read.parquet(layouts("int64-nanos")).schema)
      assert(raw.getCondition != null &&
        raw.getCondition.startsWith("PARQUET_TYPE_ILLEGAL"))
      // and the adapter's retry path still converts it correctly
      val viaAdapter = Tables.events(spark, layouts("int64-nanos"))
        .select(unix_micros(col("ts"))).orderBy("event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(viaAdapter == microsTs)
    } finally q.stop()
  }

  test("Streams.readEvents starts on an empty source directory") {
    // the normal cold-start state: the stream begins before its producer
    // writes any file. No footer to probe → current-generation layout.
    val dir = Files.createTempDirectory("graft_events_empty").toString
    val stream = Streams.readEvents(spark, dir)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType == TimestampType)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("events_empty_start").start()
    try {
      q.processAllAvailable() // zero batches, but the query is LIVE
      assert(stream.sparkSession.table("events_empty_start").isEmpty)
      // data landing AFTER start is picked up with the assumed layout
      import spark.implicits._
      Seq((0L, new java.sql.Timestamp(1600000000123L), 0L, "view", 1.5, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      assert(stream.sparkSession.table("events_empty_start").count() == 1L)
    } finally q.stop()
  }
}
