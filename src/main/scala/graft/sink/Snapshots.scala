package graft.sink

import java.net.URI
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned dataset snapshots — reproducibility for training data
  * ("which exact corpus snapshot did this model train on?"): every
  * publish writes an immutable `v=N` directory plus a manifest (rows,
  * schema, order-independent content hash) and atomically flips a
  * `_CURRENT` pointer. Readers pin either the moving head or a fixed
  * version. Time-travel-lite without a table format dependency: the
  * pointer flip is the only mutation, and it's a single rename.
  *
  * Layout: `<warehouse>/<table>/v=N/` (parquet files + _MANIFEST.json)
  *         `<warehouse>/<table>/_CURRENT` (contains "N")
  *
  * Scale: the data write is a plain distributed parquet write; manifest
  * stats ride one extra aggregation over the snapshot (bit_xor of row
  * hashes — order- and partitioning-independent).
  */
object Snapshots {

  /** Order-independent multiset content hash of a frame: exact decimal
    * SUM over per-row xxhash64 of all columns — equal frames hash equal
    * under any partitioning/row order, and (unlike a bit_xor fold, where
    * any even-multiplicity row cancels itself out) duplicated-row
    * corruptions change the value. Decimal(38,0) accumulation cannot
    * overflow below ~1e19 rows and never throws under ANSI. None for an
    * empty frame.
    */
  def contentHash(df: DataFrame): Option[java.math.BigDecimal] = {
    df.agg(rowHashSum(df).as("h"))
      .collect().headOption.flatMap(r =>
        if (r.isNullAt(0)) None else Some(r.getDecimal(0)))
  }

  private def rowHashSum(df: DataFrame) = {
    val cols = df.columns.map(col).toIndexedSeq
    sum(xxhash64(cols: _*).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
  }

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    FileSystem.get(new URI(dir), spark.sparkContext.hadoopConfiguration)

  private def tableDir(warehouse: String, table: String): Path =
    new Path(warehouse, Save.sanitizeTableName(table))

  /** Publish `df` as the next version; returns the version number. */
  def publish(
      spark: SparkSession,
      warehouse: String,
      table: String,
      df: DataFrame): Int = publish(spark, warehouse, table, df, None)

  private def publish(
      spark: SparkSession,
      warehouse: String,
      table: String,
      df: DataFrame,
      batchId: Option[Long]): Int = {
    val fs = fsOf(spark, warehouse)
    val dir = tableDir(warehouse, table)
    val next = versions(spark, warehouse, table).lastOption.getOrElse(0) + 1
    val vdir = new Path(dir, s"v=$next")
    // staging = hidden PARENT + non-hidden leaf: `.staging/` keeps
    // in-flight data invisible to any reader listing the table dir,
    // while the `v=N` leaf (the path the manifest pass reads) is a
    // normal name — a dot-prefixed leaf made Spark's DataSource WARN
    // "All paths were ignored" on every publish (it hidden-filters
    // explicitly-given root paths too)
    val staging = new Path(new Path(dir, ".staging"), s"v=$next")
    if (fs.exists(staging)) fs.delete(staging, true)
    df.write.parquet(staging.toString)
    // manifest from the staged copy (what readers will actually see);
    // rows + content hash in ONE aggregation pass over the snapshot
    val staged = spark.read.parquet(staging.toString)
    val stats = staged.agg(count(lit(1)).as("n"), rowHashSum(staged).as("h"))
      .collect()(0)
    val hashJson = if (stats.isNullAt(1)) "null" else stats.getDecimal(1).toString
    val manifest =
      s"""{"version":$next,"rows":${stats.getLong(0)},""" +
        s""""content_hash":$hashJson,""" +
        s""""schema":${ujsonSafe(staged.schema.json)}}"""
    val mf = fs.create(new Path(staging, "_MANIFEST.json"), true)
    try mf.write(manifest.getBytes(StandardCharsets.UTF_8)) finally mf.close()
    batchId.foreach { id =>
      val bf = fs.create(new Path(staging, "_BATCH"), true)
      try bf.write(id.toString.getBytes(StandardCharsets.UTF_8)) finally bf.close()
    }
    if (!fs.rename(staging, vdir))
      throw new IllegalStateException(s"snapshot publish of $table v$next failed")
    // drop the now-empty staging parent (non-recursive: a concurrent
    // publish's in-flight staging keeps it alive — delete just fails)
    try fs.delete(staging.getParent, false) catch { case _: Exception => }
    flipPointer(fs, dir, table, next)
    next
  }

  // atomic pointer flip: write tmp, rename over _CURRENT
  private def flipPointer(fs: FileSystem, dir: Path, table: String, v: Int): Unit = {
    val tmp = new Path(dir, s"._CURRENT.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val cur = new Path(dir, "_CURRENT")
    fs.delete(cur, false)
    if (!fs.rename(tmp, cur))
      throw new IllegalStateException(s"snapshot pointer flip of $table failed")
  }

  /** Batch id recorded in a version dir's `_BATCH` marker, if the
    * version was published through [[publishBatch]].
    */
  private def batchOf(fs: FileSystem, dir: Path, v: Int): Option[Long] = {
    val marker = new Path(new Path(dir, s"v=$v"), "_BATCH")
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      try Some(new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }
  }

  /** Idempotent per-micro-batch publish for foreachBatch sinks.
    * Structured Streaming re-runs the last micro-batch after a restart,
    * so a naive publish-per-batch emits the replayed batch as a second
    * version. Batch ids are monotonic per query; each version published
    * here carries its batch id in a `_BATCH` marker, and a replayed
    * (`batchId` ≤ latest recorded) batch publishes nothing and returns
    * the already-published version. If a crash landed between the
    * version rename and the `_CURRENT` flip, the replay completes the
    * interrupted commit by re-flipping the pointer to the latest
    * version instead of re-writing its data — exactly-once publish
    * across restarts with no coordination beyond the two renames.
    *
    * Replay detection scans back to the NEWEST version that carries a
    * `_BATCH` marker, so plain [[publish]] calls interleaved on the
    * same table (e.g. a manual backfill between micro-batches) do not
    * break the chain. The remaining single-writer assumption: at most
    * ONE streaming query publishes batches to a given table — two
    * concurrent queries share a batch-id sequence only by accident, so
    * their replays cannot be told apart. Completing an interrupted
    * pointer flip is also only attempted when the latest version is the
    * batch chain's head; a newer plain-publish version keeps `_CURRENT`.
    */
  def publishBatch(
      spark: SparkSession,
      warehouse: String,
      table: String,
      df: DataFrame,
      batchId: Long): Int =
    publishBatch(spark, warehouse, table, df, batchId, retain = 0)

  /** [[publishBatch]] with a RETENTION CAP: after a successful (non-
    * replay) publish, prune to the newest `retain` versions via
    * [[keepLast]]. A long-running stream publishes a version PER
    * MICRO-BATCH — unbounded, that is unbounded version-dir and
    * parquet growth; `retain` bounds it at the source. `retain = 0`
    * keeps everything (the historical behavior). [[keepLast]]'s
    * safety set applies: `_CURRENT`, pinned versions, and the batch
    * chain's head are never dropped, so replay detection and the
    * moving head survive any cap.
    */
  def publishBatch(
      spark: SparkSession,
      warehouse: String,
      table: String,
      df: DataFrame,
      batchId: Long,
      retain: Int): Int = {
    require(retain >= 0, "retain must be >= 0 (0 = keep everything)")
    val fs = fsOf(spark, warehouse)
    val dir = tableDir(warehouse, table)
    val vs = versions(spark, warehouse, table)
    // newest _BATCH-bearing version — interleaved plain publish()
    // versions carry no marker and must not hide the batch chain
    val chainHead = vs.reverseIterator
      .map(v => (v, batchOf(fs, dir, v)))
      .collectFirst { case (v, Some(last)) => (v, last) }
    val replayed = chainHead.exists { case (_, last) => batchId <= last }
    if (replayed) {
      val v = chainHead.get._1
      // complete an interrupted flip only when the batch chain's head is
      // the table's latest version; a newer plain publish owns _CURRENT
      val cur = new Path(dir, "_CURRENT")
      if (vs.lastOption.contains(v) &&
        (!fs.exists(cur) || currentVersion(spark, warehouse, table) != v))
        flipPointer(fs, dir, table, v)
      v
    } else {
      val v = publish(spark, warehouse, table, df, Some(batchId))
      if (retain > 0) keepLast(spark, warehouse, table, retain)
      v
    }
  }

  /** Mark a version retained regardless of any retention policy (a
    * `_PINNED` marker in the version dir — "this is the corpus model X
    * trained on"). Idempotent.
    */
  def pin(spark: SparkSession, warehouse: String, table: String, v: Int): Unit = {
    val fs = fsOf(spark, warehouse)
    val vdir = new Path(tableDir(warehouse, table), s"v=$v")
    require(fs.exists(vdir), s"$table v$v does not exist")
    val out = fs.create(new Path(vdir, "_PINNED"), true)
    try out.write(Array.empty[Byte]) finally out.close()
  }

  /** Remove a version's `_PINNED` marker. Idempotent. */
  def unpin(spark: SparkSession, warehouse: String, table: String, v: Int): Unit = {
    val fs = fsOf(spark, warehouse)
    fs.delete(new Path(tableDir(warehouse, table), s"v=$v/_PINNED"), false)
  }

  /** Whether a version carries the `_PINNED` marker. */
  def isPinned(spark: SparkSession, warehouse: String, table: String, v: Int): Boolean =
    fsOf(spark, warehouse)
      .exists(new Path(tableDir(warehouse, table), s"v=$v/_PINNED"))

  /** Delete published versions strictly older than `before`, EXCEPT the
    * protected set — `_CURRENT`'s target (readers of the moving head
    * must never lose their data under them), any `_PINNED` version, and
    * the batch chain's head (the newest `_BATCH`-bearing version:
    * dropping it would blind [[publishBatch]]'s replay detection and a
    * restarted stream would republish its last batch as a duplicate
    * version). Protected versions are SKIPPED, not errors — retention
    * is a sweep, not a transaction. Also reclaims ORPHANED staging
    * directories below `before` (debris of publishes that crashed
    * before their rename; a live publish's staging is always at the
    * head + 1 and survives — `before` is CLAMPED to head + 1, so a
    * caller passing an arbitrarily large cutoff cannot sweep an
    * in-flight publish's staging out from under it). Returns the
    * versions deleted.
    */
  def pruneBefore(
      spark: SparkSession, warehouse: String, table: String, before: Int): Seq[Int] = {
    val fs = fsOf(spark, warehouse)
    val dir = tableDir(warehouse, table)
    val vs = versions(spark, warehouse, table)
    if (vs.isEmpty) return Seq.empty
    // clamp to the published head + 1: the orphaned-staging sweep's
    // "provably dead" argument (a live publish stages head+1) only
    // holds when the cutoff is at or below head+1 — keepLast
    // guarantees that, the public method must too
    val before0 = math.min(before, vs.last + 1)
    val cur = currentVersion(spark, warehouse, table)
    val chainHead = vs.reverseIterator
      .find(v => batchOf(fs, dir, v).isDefined)
    val victims = vs.filter(v => v < before0 && v != cur &&
      !chainHead.contains(v) && !isPinned(spark, warehouse, table, v))
    victims.foreach(v => fs.delete(new Path(dir, s"v=$v"), true))
    // orphaned STAGING sweep: a publish that crashed between its
    // parquet write and its rename leaves `.staging/v=K` (or the
    // pre-r18 `.staging_vK`) behind forever — hidden from readers but
    // never reclaimed. Any staging strictly below the clamped cutoff is provably
    // dead (a live publish stages max(versions)+1 >= before, since
    // callers prune at or below the published head).
    val stagingParent = new Path(dir, ".staging")
    if (fs.exists(stagingParent))
      fs.listStatus(stagingParent).toIndexedSeq
        .filter { st =>
          val n = st.getPath.getName
          n.startsWith("v=") &&
            scala.util.Try(n.stripPrefix("v=").toInt).toOption.exists(_ < before0)
        }
        .foreach(st => fs.delete(st.getPath, true))
    fs.listStatus(dir).toIndexedSeq
      .filter { st =>
        val n = st.getPath.getName
        n.startsWith(".staging_v") &&
          scala.util.Try(n.stripPrefix(".staging_v").toInt).toOption
            .exists(_ < before0)
      }
      .foreach(st => fs.delete(st.getPath, true))
    victims
  }

  /** Retain the newest `n` versions (plus [[pruneBefore]]'s protected
    * set); delete the rest. The `publishBatch(retain = n)` cap calls
    * this after every publish, so a long-running stream holds a
    * bounded version history. Returns the versions deleted.
    */
  def keepLast(
      spark: SparkSession, warehouse: String, table: String, n: Int): Seq[Int] = {
    require(n >= 1, "must keep at least one version")
    val vs = versions(spark, warehouse, table)
    if (vs.size <= n) Seq.empty
    else pruneBefore(spark, warehouse, table, vs(vs.size - n))
  }

  /** Published version numbers, ascending. */
  def versions(spark: SparkSession, warehouse: String, table: String): Seq[Int] = {
    val fs = fsOf(spark, warehouse)
    val dir = tableDir(warehouse, table)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toIndexedSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toInt)
      .sorted
  }

  def currentVersion(spark: SparkSession, warehouse: String, table: String): Int = {
    val fs = fsOf(spark, warehouse)
    val cur = new Path(tableDir(warehouse, table), "_CURRENT")
    require(fs.exists(cur), s"no published snapshot for $table")
    val in = fs.open(cur)
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
      StandardCharsets.UTF_8).trim.toInt
    finally in.close()
  }

  /** Read a pinned version. */
  /** Keyed diff between two published versions: one row per key
    * present in either version, labeled added / removed / changed /
    * unchanged (non-key columns compared null-safely). One
    * co-partitioned full-outer join on the key — the incremental-audit
    * primitive between snapshot publishes ("what did this batch
    * actually do"), scan cost bounded by the two versions, never the
    * history.
    */
  def diff(
      spark: SparkSession,
      warehouse: String,
      table: String,
      vOld: Int,
      vNew: Int,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val old = version(spark, warehouse, table, vOld)
    val neu = version(spark, warehouse, table, vNew)
    require(old.columns.sameElements(neu.columns),
      s"schema changed between v$vOld and v$vNew — diff needs matching columns")
    val valueCols = old.columns.filterNot(keyCols.contains)
    // key-only tables still diff (added/removed/unchanged): a zero-field
    // struct() is invalid, so the value payload falls back to a constant
    def payload(cs: Seq[String]) =
      if (cs.isEmpty) lit(0) else struct(cs.map(col): _*)
    val o = old.select(keyCols.map(col) :+ payload(valueCols).as("_vo"): _*)
    val n = neu.select(keyCols.map(col) :+ payload(valueCols).as("_vn"): _*)
    o.join(n, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("_vo").isNull, lit("added"))
          .when(col("_vn").isNull, lit("removed"))
          .when(col("_vo") <=> col("_vn"), lit("unchanged"))
          .otherwise(lit("changed")).as("change"): _*)
  }

  def version(spark: SparkSession, warehouse: String, table: String, v: Int): DataFrame =
    spark.read.parquet(new Path(tableDir(warehouse, table), s"v=$v").toString)

  /** Read the current head. */
  def current(spark: SparkSession, warehouse: String, table: String): DataFrame =
    version(spark, warehouse, table, currentVersion(spark, warehouse, table))

  /** The stored manifest JSON of a version. */
  def manifest(spark: SparkSession, warehouse: String, table: String, v: Int): String = {
    val fs = fsOf(spark, warehouse)
    val in = fs.open(new Path(tableDir(warehouse, table), s"v=$v/_MANIFEST.json"))
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
      StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Minimal JSON-string escaping for embedding the schema json (itself
    * already JSON) as a value: it is valid JSON, so embed verbatim.
    */
  private def ujsonSafe(schemaJson: String): String = schemaJson
}
