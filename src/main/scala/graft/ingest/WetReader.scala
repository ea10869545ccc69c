package graft.ingest

import java.io.{ByteArrayInputStream, EOFException}
import java.util.zip.GZIPInputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Common Crawl WET (WARC text-conversion) source — the entry format of
  * every published web-curation pipeline this engine reproduces (C4,
  * Gopher/MassiveWeb, RefinedWeb, CCNet all start from WET/WARC
  * archives), extending the reference's format-dispatched ingestion
  * pattern (reference backend/index.js:88-97 routes .accdb/.xlsx/text
  * by extension) to the crawl-native format. JDK-only, like
  * [[XlsReader]]/[[MdbReader]]: implements just enough of ISO 28500
  * (WARC 1.0/1.1) to split records and parse their named fields.
  *
  * Format facts the parser relies on (all from the WARC spec + the
  * Common Crawl WET layout):
  *   - a WARC file is a concatenation of records; each record is a
  *     `WARC/1.x\r\n` version line, `Name: value\r\n` header lines
  *     (values may continue over lines starting with space/tab), a
  *     blank `\r\n`, exactly `Content-Length` payload BYTES, then
  *     `\r\n\r\n` before the next record;
  *   - WET files hold one `warcinfo` record (file metadata — no
  *     target URI) followed by one `conversion` record per crawled
  *     page whose payload is the extracted plain text (UTF-8);
  *   - `.warc.wet.gz` files are MULTI-MEMBER gzip: each record is its
  *     own gzip member so HTTP range readers can seek; members are
  *     back-to-back in one file.
  *
  * Scale shape: gzip is not splittable, so the unit of parallelism is
  * the FILE — exactly how Common Crawl ships (tens of thousands of
  * ~150 MB `.wet.gz` segments per crawl), so a 100 TB crawl read is
  * ~a million independent tasks with zero shuffle; the binaryFile
  * source streams each file to one task and the parse is a narrow
  * flatMap. Driver never touches record bytes.
  *
  * Emits `(file, url, warc_date, record_id, content_length, text)`:
  * one row per conversion record, header fields verbatim (typed casts
  * are the caller's, the all-strings ingest convention), `text`
  * decoded as UTF-8. Records other than `conversion` (warcinfo,
  * request/response in full WARC files) are skipped — pass
  * `keepAll = true` to surface every record with its `warc_type`.
  */
object WetReader {

  /** One parsed WARC record: type, named headers, payload bytes. */
  private[graft] final case class WarcRecord(
      warcType: String,
      headers: Map[String, String],
      payload: Array[Byte])

  /** Split a (decompressed) WARC byte stream into records. Strict on
    * the framing the spec guarantees (version line, Content-Length,
    * blank-line separators) and lenient on everything else: unknown
    * headers pass through, a missing final `\r\n\r\n` at EOF is
    * tolerated (truncated last-record tails are common in practice —
    * the record itself must still be complete).
    */
  private[graft] def parseWarc(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = ArrayBuffer.empty[WarcRecord]
    var pos = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < bytes.length && bytes(i) != '\n') i += 1
      i // index of '\n' or length
    }
    def lineAt(from: Int): (String, Int) = {
      val e = lineEnd(from)
      val stop = if (e > from && bytes(e - 1) == '\r') e - 1 else e
      (new String(bytes, from, stop - from, "UTF-8"), math.min(e + 1, bytes.length))
    }
    while (pos < bytes.length) {
      // skip inter-record blank lines
      val (first, afterFirst) = lineAt(pos)
      if (first.isEmpty) { pos = afterFirst }
      else if (!first.startsWith("WARC/"))
        throw new IllegalArgumentException(
          s"Not a WARC stream: expected a WARC/ version line at byte $pos, got '${first.take(40)}'")
      else {
        // header block: Name: value, with obs-fold continuation lines
        var p = afterFirst
        val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
        var lastKey: String = null
        var done = false
        while (!done) {
          if (p >= bytes.length) throw new EOFException("WARC header block truncated")
          val (line, next) = lineAt(p)
          p = next
          if (line.isEmpty) done = true
          else if ((line.head == ' ' || line.head == '\t') && lastKey != null)
            headers(lastKey) = headers(lastKey) + " " + line.trim
          else {
            val i = line.indexOf(':')
            if (i < 0) throw new IllegalArgumentException(
              s"Malformed WARC header line: '${line.take(60)}'")
            val k = line.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
            headers(k) = line.substring(i + 1).trim
            lastKey = k
          }
        }
        val len = headers.getOrElse("content-length",
          throw new IllegalArgumentException("WARC record missing Content-Length")).toLong
        if (len > Int.MaxValue - 8)
          throw new IllegalArgumentException(s"WARC record payload too large: $len")
        if (p + len > bytes.length) throw new EOFException(
          s"WARC payload truncated: need $len bytes at $p, have ${bytes.length - p}")
        val payload = java.util.Arrays.copyOfRange(bytes, p, p + len.toInt)
        out += WarcRecord(
          headers.getOrElse("warc-type", ""), headers.toMap, payload)
        pos = p + len.toInt
      }
    }
    out.toSeq
  }

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Decompress a (possibly multi-member) gzip byte array; plain bytes
    * pass through. `GZIPInputStream` reads concatenated members
    * transparently — the per-record-member layout Common Crawl uses.
    */
  private[graft] def inflate(bytes: Array[Byte]): Array[Byte] =
    if (!isGzip(bytes)) bytes
    else {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 1 << 16)
      val out = new java.io.ByteArrayOutputStream(math.max(64, bytes.length * 3))
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      out.toByteArray
    }

  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("url", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))

  private[graft] def recordsOf(
      file: String, raw: Array[Byte], keepAll: Boolean): Iterator[Row] =
    parseWarc(inflate(raw)).iterator
      .filter(r => keepAll || r.warcType.equalsIgnoreCase("conversion"))
      .map { r =>
        Row(
          file,
          if (r.warcType.isEmpty) null else r.warcType,
          r.headers.get("warc-target-uri").orNull,
          r.headers.get("warc-date").orNull,
          r.headers.get("warc-record-id").orNull,
          r.payload.length.toLong,
          new String(r.payload, "UTF-8"))
      }

  /** Distributed WET scan: `path` is a file, directory, or glob of
    * `.wet` / `.wet.gz` files (any WARC works; non-conversion records
    * are skipped unless `keepAll`). One task per file — the gzip
    * non-splittability unit — via the binaryFile source; the parse is
    * a narrow flatMap, so filters/projections on the result run before
    * any shuffle.
    */
  def read(
      spark: SparkSession,
      path: String,
      globFilter: Option[String] = None,
      keepAll: Boolean = false): DataFrame = {
    val files = Readers.binaryFiles(spark, path, globFilter)
      .select("path", "content")
    val enc = Encoders.row(schema)
    files.flatMap { row: Row =>
      recordsOf(row.getString(0), row.getAs[Array[Byte]](1), keepAll)
    }(enc)
  }
}
