package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.ops.Cleanse

/** Distributed delimited-text scan with the reference's exact parse
  * semantics (reference backend/index.js:98-119 preview, 206-232 full):
  *
  *   - delimiter sniffed from the first line only (tab > pipe > comma)
  *   - NAIVE split: quotes do NOT protect embedded delimiters — a cell
  *     `"Acme, Inc."` under comma splits into two cells, each then
  *     quote-stripped. (FIXTURES.md A1 mandates matching this.)
  *   - per-cell trim + edge-quote + edge-pipe strip; empty → null
  *   - blank lines and `---` (Markdown separator) lines dropped
  *   - short rows padded with null; extra cells beyond the header dropped
  *   - all columns land as strings (the reference inserts strings and lets
  *     the database cast; our casts happen later in Save)
  *
  * Spark-first design: the scan is `spark.read.csv` with quote-handling
  * DISABLED (quote = NUL) so Spark's splitter degenerates to the naive
  * split, plus codegen'd column expressions for the cell cleanup. The only
  * driver-side work is reading ONE line for the sniff — scan, cleanse,
  * projection, and cast all distribute, so the path is identical at 100 TB
  * (each executor parses its own file splits).
  */
object Readers {

  /** Header names parsed + cleansed from the sniffed first line.
    * Empty-named positions (e.g. the edge cells of a `| a | b |` Markdown
    * header) get internal placeholder names and are dropped from the
    * result; duplicate names get a positional suffix (the reference's JS
    * row-object silently collapses duplicates — index.js:117 — which a
    * DataFrame cannot; documented deviation).
    */
  private[graft] def headerSchema(firstLine: String, delimiter: String): (Seq[String], StructType) = {
    val raw = firstLine.split(java.util.regex.Pattern.quote(delimiter), -1)
      .map(Cleanse.headerCell)
    dedupeNames(raw.toIndexedSeq)
  }

  /** Shared header normalization for ALL tabular sources (delimited,
    * Excel): empty-named positions get internal placeholder names and
    * are dropped from the kept list; duplicates get a positional suffix
    * (a DataFrame cannot hold ambiguous/empty names — the reference's JS
    * row-object silently collapses duplicates, index.js:117; documented
    * deviation). Returns (kept visible names, full positional schema).
    */
  private[graft] def dedupeNames(raw: Seq[String]): (Seq[String], StructType) = {
    val used = scala.collection.mutable.Set.empty[String]
    val names = raw.zipWithIndex.map { case (h, i) =>
      if (h.isEmpty) s"_graft_skip_$i"
      else {
        // probe for a free suffix: plain `name_n` can collide with a
        // LATER literal header of that name (e.g. "a,a,a_1")
        var candidate = h
        var n = 1
        while (used(candidate) ||
          (candidate != h && raw.drop(i + 1).contains(candidate))) {
          candidate = s"${h}_$n"
          n += 1
        }
        used += candidate
        candidate
      }
    }
    val keep = names.filterNot(_.startsWith("_graft_skip_"))
    (keep.toIndexedSeq, StructType(names.map(StructField(_, StringType, nullable = true)).toIndexedSeq))
  }

  /** Delimited scan (S1): csv/tsv/pipe/markdown → all-string DataFrame. */
  def delimited(spark: SparkSession, path: String): DataFrame = {
    val first = Sniffer.firstLine(spark, path).getOrElse(
      throw new IllegalArgumentException(s"File appears empty: $path"))
    // does the file START with blank line(s)? The csv parser's
    // header=true consumes the literal first physical line, while the
    // sniffed header skips blanks — the real header then surfaces as a
    // data row (dropped below by the header-echo filter).
    val literalFirst = spark.read.text(path).limit(1)
      .collect().headOption.map(_.getString(0))
    val startsBlank = literalFirst.exists(_.trim.isEmpty)
    val delimiter = Sniffer.sniffDelimiter(first)
    val (keep, schema) = headerSchema(first, delimiter)
    val raw = spark.read
      .option("header", "true") // skips the first line of every file split
      .option("sep", delimiter)
      .option("quote", "\u0000") // DISABLE quote handling → naive split
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("mode", "PERMISSIVE") // short rows → null-padded
      .option("enforceSchema", "true")
      .schema(schema)
      .csv(path)
    val cleansed = Cleanse.cells(raw)
    val noSep = Cleanse.dropSeparatorRows(cleansed)
    val noBlank = Cleanse.dropBlankRows(noSep)
    val noEcho =
      if (!startsBlank) noBlank
      else {
        // header=true consumed a BLANK first line; the real header line
        // is now a data row whose cells equal the header names — drop it
        val echo = keep.map(n => Cleanse.colRef(n) <=> lit(n))
          .reduceOption(_ && _).getOrElse(lit(false))
        noBlank.filter(!echo)
      }
    noEcho.select(keep.map(Cleanse.colRef).toIndexedSeq: _*)
  }

  /** JSON-lines scan (extension beyond the reference, which pushes .json
    * through the delimited-text path — index.js:97; that faithful route
    * still works via [[delimited]]). Schema inferred (one extra pass) or
    * supplied for the single-pass scale path.
    */
  def jsonl(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("mode", "PERMISSIVE")
    schema.fold(r)(r.schema).json(path)
  }

  /** Binary-file scan for multimodal ingestion: each file becomes a row
    * (path, modificationTime, length, content) — the standard way media
    * blobs enter the pipeline; feeds graft.operators.Multimodal directly.
    * Partition sizing: one task per file; tune
    * spark.sql.files.maxPartitionBytes for many-small-file dirs.
    */
  def binaryFiles(
      spark: SparkSession,
      path: String,
      globFilter: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    globFilter.fold(r)(g => r.option("pathGlobFilter", g)).load(path)
  }

  /** Format-dispatched read, mirroring the reference's extension dispatch
    * (index.js:88-97): Access/Excel by extension, delimited otherwise.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    // U3 parity: the reference 404s "File not found or expired" when the
    // staged upload is gone (index.js:143-144) — surface the same typed
    // condition instead of a deep scan error. Local-path check only;
    // remote URIs defer to the source's own existence handling.
    // Plain local paths only: globs and scheme'd URIs defer to the
    // source's own resolution (a glob like /data/*.csv must not be
    // File.exists-checked).
    val plainLocal = !path.contains("://") &&
      !path.exists(c => c == '*' || c == '?' || c == '[' || c == '{')
    val fmt = Sniffer.formatOf(path)
    if (fmt != Sniffer.Access && plainLocal && !new java.io.File(path).exists())
      throw new IllegalArgumentException(s"File not found or expired: $path")
    fmt match {
      case Sniffer.Delimited => delimited(spark, path)
      case Sniffer.Excel => ExcelReader.read(spark, path)
      case Sniffer.Access =>
        throw new UnsupportedOperationException(
          "Access (.accdb/.mdb) requires the ACE OLEDB provider, which the " +
            "reference itself only supports on Windows (index.js:63,78). " +
            "No JDBC driver for Access is available offline; export to CSV " +
            "and use the delimited reader. (SURVEY.md §7.2(6))")
    }
  }
}
