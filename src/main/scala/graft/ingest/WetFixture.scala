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

  /** Per-response HTTP transfer shape for [[writeWarc]] — the capture
    * variations a crawler stores verbatim and [[WarcHttp]] must undo.
    * `encoding` is the Content-Encoding: "" (identity), "gzip", or
    * "deflate" (zlib-wrapped per the HTTP spec).
    */
  final case class HttpShape(
      chunked: Boolean = false,
      encoding: String = "",
      headerCase: Boolean = false,
      status: Int = 200,
      reason: String = "OK",
      charset: String = "utf-8")

  def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Render page text as an HTML document, one `<p>` line per text
    * line, with chrome (doctype, empty title, a single-line script)
    * that strips to nothing — so `stripHtmlLines` inverts this exactly
    * for text whose lines have no leading/trailing/doubled whitespace
    * and no empty lines.
    */
  def wrapHtml(text: String): String = {
    val body = text.split("\n", -1)
      .map(l => "<p>" + escapeHtml(l) + "</p>").mkString("\n")
    "<!DOCTYPE html>\n<html>\n<head><title></title>" +
      "<script type=\"text/javascript\">var x = 1 < 2; // not content</script>" +
      "</head>\n<body>\n" + body + "\n<!-- comment stripped -->\n</body>\n</html>\n"
  }

  private def gzipBytes(b: Array[Byte]): Array[Byte] = gzipMember(b)

  /** zlib-wrapped deflate — what `Content-Encoding: deflate` means per
    * the HTTP spec (RFC 9110 §8.4.1.1).
    */
  private def deflateBytes(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length / 2 + 64)
    val d = new java.util.zip.DeflaterOutputStream(out)
    d.write(b)
    d.close()
    out.toByteArray
  }

  /** Chunked transfer framing: ~48-byte chunks, one carrying a chunk
    * extension (readers must ignore it), terminal 0-chunk + trailer.
    */
  private def chunkBody(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length + 128)
    val size = 48
    var pos = 0
    var i = 0
    while (pos < b.length) {
      val n = math.min(size, b.length - pos)
      val ext = if (i == 1) ";x=why" else ""
      out.write((Integer.toHexString(n) + ext + CRLF).getBytes("US-ASCII"))
      out.write(b, pos, n)
      out.write(CRLF.getBytes("US-ASCII"))
      pos += n
      i += 1
    }
    out.write(("0" + CRLF + "X-Trailer: t" + CRLF + CRLF).getBytes("US-ASCII"))
    out.toByteArray
  }

  /** One captured HTTP/1.1 response message for `html` under `shape`:
    * Content-Encoding applies before Transfer-Encoding (gzip then
    * chunk), matching what a crawler stores byte-verbatim.
    */
  private[graft] def httpResponse(html: String, shape: HttpShape): Array[Byte] = {
    val raw = html.getBytes(shape.charset)
    val enc = shape.encoding match {
      case "gzip" => gzipBytes(raw)
      case "deflate" => deflateBytes(raw)
      case _ => raw
    }
    val framed = if (shape.chunked) chunkBody(enc) else enc
    def h(k: String): String =
      if (shape.headerCase) k.toUpperCase(java.util.Locale.ROOT) else k
    val sb = new StringBuilder
    sb.append("HTTP/1.1 ").append(shape.status).append(' ')
      .append(shape.reason).append(CRLF)
    sb.append(h("Content-Type")).append(": text/html; charset=")
      .append(shape.charset).append(CRLF)
    sb.append(h("Server")).append(": graft-fixture/1.0").append(CRLF)
    if (shape.encoding.nonEmpty)
      sb.append(h("Content-Encoding")).append(": ").append(shape.encoding).append(CRLF)
    if (shape.chunked)
      sb.append(h("Transfer-Encoding")).append(": chunked").append(CRLF)
    else
      sb.append(h("Content-Length")).append(": ").append(framed.length).append(CRLF)
    sb.append(CRLF)
    val head = sb.toString.getBytes("ISO-8859-1")
    val out = new ByteArrayOutputStream(head.length + framed.length)
    out.write(head)
    out.write(framed)
    out.toByteArray
  }

  /** Write `rows = (url, isoDate, html, shape)` as a full `.warc.gz`
    * archive of captured `response` records (each preceded by its
    * `request` record when `withRequests` — readers must skip those),
    * after a `warcinfo` record. The [[writeWet]] posture: an
    * independent byte-level writer of the PUBLISHED layout (ISO 28500
    * + HTTP/1.1 framing), so [[WarcHttp]] is tested against bytes it
    * did not produce.
    */
  def writeWarc(
      path: String,
      rows: Seq[(String, String, String, HttpShape)],
      gzipPerRecord: Boolean = true,
      withRequests: Boolean = true): Unit = {
    val info = record(
      Seq(
        "WARC-Type" -> "warcinfo",
        "WARC-Date" -> rows.headOption.map(_._2).getOrElse("2024-01-01T00:00:00Z"),
        "WARC-Filename" -> new java.io.File(path).getName,
        "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000000>",
        "Content-Type" -> "application/warc-fields"),
      ("software: graft-warc-fixture" + CRLF +
        "format: WARC File Format 1.0" + CRLF).getBytes("UTF-8"))
    val recs = rows.zipWithIndex.flatMap { case ((url, date, html, shape), i) =>
      val req = record(
        Seq(
          "WARC-Type" -> "request",
          "WARC-Target-URI" -> url,
          "WARC-Date" -> date,
          "WARC-Record-ID" -> f"<urn:uuid:20000000-0000-0000-0000-${i + 1}%012x>",
          "Content-Type" -> "application/http; msgtype=request"),
        ("GET / HTTP/1.1" + CRLF + "Host: fixture" + CRLF + CRLF).getBytes("ISO-8859-1"))
      val resp = record(
        Seq(
          "WARC-Type" -> "response",
          "WARC-Target-URI" -> url,
          "WARC-Date" -> date,
          "WARC-Record-ID" -> f"<urn:uuid:00000000-0000-0000-0000-${i + 1}%012x>",
          "Content-Type" -> "application/http; msgtype=response"),
        httpResponse(html, shape))
      if (withRequests) Seq(req, resp) else Seq(resp)
    }
    val fo = new FileOutputStream(path)
    try (info +: recs).foreach { r =>
      fo.write(if (gzipPerRecord) gzipMember(r) else r)
    } finally fo.close()
  }
}
