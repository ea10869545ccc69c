package graft.ingest

import java.nio.file.Files

import graft.SparkSpec

/** Raw-WARC HTTP ingestion: fixture-written `.warc.gz` archives across
  * the HTTP transfer-shape matrix (the reader is tested against bytes
  * it did not produce — [[WetFixture.writeWarc]] is an independent
  * byte-level writer of the PUBLISHED HTTP/1.1 + ISO 28500 layouts),
  * plus the malformed-payload unit surface: de-chunk truncation /
  * extensions / trailers, zlib-vs-raw-vs-FDICT deflate, status-line
  * garbage, missing header/body separator, charset fallback.
  */
class WarcHttpSpec extends SparkSpec {
  import WetFixture.HttpShape

  private def page(i: Int) =
    s"Page $i first line with words.\nA second line closes page $i."

  test("readResponses round-trips the HTTP shape matrix; requests skipped") {
    val dir = Files.createTempDirectory("graft_warc_spec").toString
    val shapes = Seq(
      HttpShape(),                                       // identity + Content-Length
      HttpShape(chunked = true),                         // chunked + extension + trailer
      HttpShape(encoding = "gzip"),                      // gzip content-coding
      HttpShape(encoding = "deflate", chunked = true),   // deflate UNDER chunked
      HttpShape(headerCase = true, charset = "ISO-8859-1"))
    val rows = shapes.zipWithIndex.map { case (shape, i) =>
      (s"https://crawl.test/spec/$i", f"2024-02-${i + 1}%02dT00:00:00Z",
        WetFixture.wrapHtml(page(i)), shape)
    }
    WetFixture.writeWarc(s"$dir/seg-0.warc.gz", rows, withRequests = true)
    val got = WarcHttp.readResponses(spark, dir, Some("*.warc.gz"))
      .orderBy("url").collect()
    assert(got.length == shapes.length) // request + warcinfo records skipped
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[String]("url") == s"https://crawl.test/spec/$i")
      assert(r.getAs[Int]("http_status") == 200)
      assert(r.getAs[String]("http_content_type").startsWith("text/html"))
      assert(r.getAs[String]("body") == WetFixture.wrapHtml(page(i)),
        s"body mismatch under shape ${shapes(i)}")
    }
  }

  test("non-ASCII ISO-8859-1 body decodes under the declared charset") {
    val html = "<p>café résumé ±</p>"
    val resp = WetFixture.httpResponse(html,
      HttpShape(charset = "ISO-8859-1"))
    val msg = WarcHttp.parseHttp(resp)
    val cs = WarcHttp.charsetOf(msg.headers.get("content-type"))
    assert(cs.name().equalsIgnoreCase("ISO-8859-1"))
    assert(WarcHttp.decode(msg.body, cs) == html)
    // the same bytes decoded as UTF-8 would mangle é (0xE9 is invalid
    // UTF-8 alone) — proves the charset path is load-bearing
    assert(new String(msg.body, "UTF-8") != html)
  }

  test("dechunk: sizes, extensions, and trailers per RFC 9112") {
    val b = ("4;ext=1\r\nWiki\r\n" + "5\r\npedia\r\n" + "0\r\nX-T: v\r\n\r\n")
      .getBytes("US-ASCII")
    assert(new String(WarcHttp.dechunk(b), "US-ASCII") == "Wikipedia")
  }

  test("dechunk: truncated chunk keeps the decoded prefix") {
    val b = "4\r\nWiki\r\nA\r\nped".getBytes("US-ASCII") // A=10 declared, 3 present
    assert(new String(WarcHttp.dechunk(b), "US-ASCII") == "Wikiped")
  }

  test("dechunk: malformed size line keeps remaining bytes verbatim") {
    val b = "4\r\nWiki\r\nzz\r\nrest".getBytes("US-ASCII")
    assert(new String(WarcHttp.dechunk(b), "US-ASCII") == "Wiki" + "zz\r\nrest")
  }

  test("deflate: zlib-wrapped and raw streams both decode") {
    def deflate(raw: Boolean, s: String): Array[Byte] = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](1024)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    Seq(true, false).foreach { raw =>
      val payload = ("HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n")
        .getBytes("ISO-8859-1") ++ deflate(raw, "hello deflate world")
      val msg = WarcHttp.parseHttp(payload)
      assert(new String(msg.body, "UTF-8") == "hello deflate world",
        s"raw=$raw")
    }
  }

  test("deflate: FDICT (preset-dictionary) stream terminates, never hangs") {
    // 0x78 0x20 is a VALID zlib header with the FDICT bit set
    // ((0x78*256+0x20) % 31 == 0); without the stall guard inflate()
    // returns 0 forever (finished=false, needsInput=false) and the
    // Spark task spins indefinitely on an untrusted crawl body.
    val fdict = Array[Byte](0x78, 0x20, 1, 2, 3, 4, 5, 6, 7, 8)
    val payload = ("HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n")
      .getBytes("ISO-8859-1") ++ fdict
    val t0 = System.nanoTime()
    val msg = WarcHttp.parseHttp(payload) // must RETURN (fallback path)
    assert((System.nanoTime() - t0) < 30e9, "parse did not stall")
    assert(msg.body.nonEmpty) // raw-retry or raw-bytes fallback, never empty
  }

  test("status-line garbage: out-of-Int-range token falls back to 0, not a throw") {
    val payload = "HTTP/1.1 99999999999 OK\r\nContent-Type: text/plain\r\n\r\nbody"
      .getBytes("ISO-8859-1")
    val msg = WarcHttp.parseHttp(payload)
    assert(msg.status == 0)
    assert(new String(msg.body, "UTF-8") == "body")
  }

  test("bare body (no HTTP status line) surfaces with status 0, payload intact") {
    val payload = "just raw captured text, no envelope".getBytes("UTF-8")
    val msg = WarcHttp.parseHttp(payload)
    assert(msg.status == 0 && msg.headers.isEmpty)
    assert(msg.body.sameElements(payload))
  }

  test("missing blank separator: the colon-less line IS the first body line") {
    // a capture missing the header/body blank line must not silently
    // drop the first body line
    val payload = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      "first body line\r\nsecond body line")
      .getBytes("ISO-8859-1")
    val msg = WarcHttp.parseHttp(payload)
    assert(new String(msg.body, "UTF-8") ==
      "first body line\r\nsecond body line")
  }

  test("obs-fold header continuation and charset fallback") {
    val payload = ("HTTP/1.1 200 OK\r\nContent-Type: text/html;\r\n" +
      " charset=not-a-real-charset\r\n\r\nbody")
      .getBytes("ISO-8859-1")
    val msg = WarcHttp.parseHttp(payload)
    assert(msg.headers("content-type") ==
      "text/html; charset=not-a-real-charset")
    // unknown charset name falls back to UTF-8, decode stays lenient
    assert(WarcHttp.charsetOf(msg.headers.get("content-type")) ==
      java.nio.charset.StandardCharsets.UTF_8)
  }

  test("undecodable gzip body falls back to the raw bytes") {
    val junk = Array[Byte](0x1f, 0x8b.toByte, 9, 9, 9, 9)
    val payload = ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n")
      .getBytes("ISO-8859-1") ++ junk
    val msg = WarcHttp.parseHttp(payload)
    assert(msg.body.sameElements(junk))
  }

  test("stripHtmlLines inverts wrapHtml line-by-line (the q157 transport pair)") {
    import org.apache.spark.sql.functions.col
    val texts = Seq(
      "one line only.",
      "first line with words.\nsecond line follows.\nthird ends it.")
    val df = spark.createDataFrame(
      texts.map(t => Tuple1(WetFixture.wrapHtml(t)))).toDF("html")
    val got = df.select(
      graft.functions.TextFunctions.stripHtmlLines(col("html")).as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(got == texts)
  }
}
