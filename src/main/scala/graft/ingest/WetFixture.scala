package graft.ingest

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.util.zip.GZIPOutputStream

/** Byte-level WET (WARC conversion) file writer — the oracle-gate
  * fixture companion of [[WetReader]], in the [[MdbFixture]] /
  * [[BiffFixture]] posture: an independent implementation of the
  * PUBLISHED layout (ISO 28500 framing + the Common Crawl WET record
  * shape), so the reader is tested against bytes it did not produce.
  * Writes the leading `warcinfo` record, then one `conversion` record
  * per `(url, date, text)` row; `gzipPerRecord = true` emits each
  * record as its own gzip member (the Common Crawl `.wet.gz`
  * multi-member layout), `false` writes the raw uncompressed `.wet`.
  */
object WetFixture {

  private val CRLF = "\r\n"

  private def record(headers: Seq[(String, String)], payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0").append(CRLF)
    headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append(CRLF) }
    sb.append("Content-Length: ").append(payload.length).append(CRLF)
    sb.append(CRLF)
    val head = sb.toString.getBytes("UTF-8")
    val out = new ByteArrayOutputStream(head.length + payload.length + 4)
    out.write(head)
    out.write(payload)
    out.write(CRLF.getBytes("UTF-8"))
    out.write(CRLF.getBytes("UTF-8"))
    out.toByteArray
  }

  private def gzipMember(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length / 2 + 64)
    val gz = new GZIPOutputStream(out)
    gz.write(b)
    gz.close()
    out.toByteArray
  }

  /** Write `rows = (url, isoDate, text)` as a WET file at `path`. */
  def writeWet(
      path: String,
      rows: Seq[(String, String, String)],
      gzipPerRecord: Boolean = true): Unit = {
    val info = record(
      Seq(
        "WARC-Type" -> "warcinfo",
        "WARC-Date" -> rows.headOption.map(_._2).getOrElse("2024-01-01T00:00:00Z"),
        "WARC-Filename" -> new java.io.File(path).getName,
        "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000000>",
        "Content-Type" -> "application/warc-fields"),
      ("software: graft-wet-fixture" + CRLF +
        "format: WARC File Format 1.0" + CRLF).getBytes("UTF-8"))
    val recs = rows.zipWithIndex.map { case ((url, date, text), i) =>
      record(
        Seq(
          "WARC-Type" -> "conversion",
          "WARC-Target-URI" -> url,
          "WARC-Date" -> date,
          "WARC-Record-ID" -> f"<urn:uuid:00000000-0000-0000-0000-${i + 1}%012x>",
          "WARC-Refers-To" -> f"<urn:uuid:10000000-0000-0000-0000-${i + 1}%012x>",
          "Content-Type" -> "text/plain"),
        text.getBytes("UTF-8"))
    }
    val fo = new FileOutputStream(path)
    try (info +: recs).foreach { r =>
      fo.write(if (gzipPerRecord) gzipMember(r) else r)
    } finally fo.close()
  }
}
