package graft.ingest

import java.nio.file.Files

import graft.SparkSpec

/** WET/WARC crawl source: fixture-written archives (multi-member gzip
  * and plain), framing edge cases, dispatch, and the reader's strict
  * error surface.
  */
class WetSpec extends SparkSpec {

  private def rows3 = Seq(
    ("https://example.com/a", "2024-01-01T00:00:00Z", "Alpha page text.\nSecond line."),
    ("https://example.com/b", "2024-01-02T00:00:00Z", "Beta — unicode: éü中文."),
    ("https://example.com/c", "2024-01-03T00:00:00Z", ""))

  test("gzipped multi-member WET roundtrips url/date/text; warcinfo skipped") {
    val dir = Files.createTempDirectory("graft_wet").toString
    val p = s"$dir/part-00000.warc.wet.gz"
    WetFixture.writeWet(p, rows3, gzipPerRecord = true)
    val df = WetReader.read(spark, p)
    val got = df.orderBy("url")
      .collect().map(r => (r.getAs[String]("url"), r.getAs[String]("warc_date"),
        r.getAs[String]("text"), r.getAs[Long]("content_length")))
    assert(got.length == 3) // the warcinfo record does NOT surface
    assert(got.toSeq == rows3.map(t => (t._1, t._2, t._3,
      t._3.getBytes("UTF-8").length.toLong)))
    assert(df.columns.toSeq == Seq("file", "warc_type", "url", "warc_date",
      "record_id", "content_length", "text"))
  }

  test("plain .wet parses identically to .wet.gz; keepAll surfaces warcinfo") {
    val dir = Files.createTempDirectory("graft_wet_plain").toString
    val pGz = s"$dir/a.warc.wet.gz"
    val pPlain = s"$dir/a.wet"
    WetFixture.writeWet(pGz, rows3, gzipPerRecord = true)
    WetFixture.writeWet(pPlain, rows3, gzipPerRecord = false)
    val a = WetReader.read(spark, pGz).drop("file").orderBy("url").collect().toSeq
    val b = WetReader.read(spark, pPlain).drop("file").orderBy("url").collect().toSeq
    assert(a == b)
    val all = WetReader.read(spark, pPlain, keepAll = true)
      .select("warc_type").collect().map(_.getString(0)).sorted.toSeq
    assert(all == Seq("conversion", "conversion", "conversion", "warcinfo"))
  }

  test("payload bytes are length-framed: CRLFs and header-looking text survive") {
    // a payload containing blank lines and a line that LOOKS like a WARC
    // header must not desync the record splitter — framing is by
    // Content-Length, never by content sniffing
    val tricky = "WARC/1.0\r\nContent-Length: 999\r\n\r\nnot a real record\n\n\nend"
    val dir = Files.createTempDirectory("graft_wet_tricky").toString
    val p = s"$dir/t.wet"
    WetFixture.writeWet(p, Seq(
      ("https://x.com/1", "2024-02-01T00:00:00Z", tricky),
      ("https://x.com/2", "2024-02-02T00:00:00Z", "plain")), gzipPerRecord = false)
    val got = WetReader.read(spark, p).orderBy("url")
      .collect().map(_.getAs[String]("text")).toSeq
    assert(got == Seq(tricky, "plain"))
  }

  test("header continuation lines fold into the previous field") {
    // obs-fold: a value continued on the next line with leading
    // whitespace (ISO 28500 allows it; long URIs wrap in the wild)
    val dir = Files.createTempDirectory("graft_wet_fold").toString
    val p = s"$dir/f.wet"
    val rec = "WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: https://long.example.com/a\r\n very/deep/path\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    Files.write(java.nio.file.Paths.get(p), rec.getBytes("UTF-8"))
    val got = WetReader.read(spark, p).collect()
    assert(got.length == 1)
    assert(got(0).getAs[String]("url") == "https://long.example.com/a very/deep/path")
    assert(got(0).getAs[String]("text") == "hi")
  }

  test("WARC-Type value matches case-insensitively (a 'Conversion' writer surfaces)") {
    val dir = Files.createTempDirectory("graft_wet_case").toString
    val p = s"$dir/c.wet"
    val rec = "WARC/1.0\r\nWARC-Type: Conversion\r\nWARC-Target-URI: https://case.example.com/\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    Files.write(java.nio.file.Paths.get(p), rec.getBytes("UTF-8"))
    val got = WetReader.read(spark, p).collect()
    assert(got.length == 1)
    assert(got(0).getAs[String]("url") == "https://case.example.com/")
  }

  test("truncated payload and non-WARC bytes raise typed parse errors") {
    def parse(s: String) = WetReader.parseWarc(s.getBytes("UTF-8"))
    val ex1 = intercept[Exception] {
      parse("WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 50\r\n\r\nshort")
    }
    assert(ex1.getMessage.contains("truncated"))
    val ex2 = intercept[IllegalArgumentException] {
      parse("totally not a warc\r\n")
    }
    assert(ex2.getMessage.contains("Not a WARC stream"))
    val ex3 = intercept[IllegalArgumentException] {
      parse("WARC/1.0\r\nWARC-Type: conversion\r\n\r\n")
    }
    assert(ex3.getMessage.contains("Content-Length"))
  }

  test("extension dispatch routes crawl archives through the WET reader") {
    assert(Sniffer.formatOf("/x/seg-0.warc.wet.gz") == Sniffer.Wet)
    assert(Sniffer.formatOf("/x/a.WET") == Sniffer.Wet)
    assert(Sniffer.formatOf("/x/a.warc") == Sniffer.Wet)
    assert(Sniffer.formatOf("/x/a.csv.gz") != Sniffer.Wet)
    val dir = Files.createTempDirectory("graft_wet_dispatch").toString
    val p = s"$dir/d.warc.wet.gz"
    WetFixture.writeWet(p, rows3.take(1))
    val viaDispatch = Readers.read(spark, p)
      .select("url", "text").collect().toSeq
    assert(viaDispatch.map(r => (r.getString(0), r.getString(1))) ==
      Seq((rows3.head._1, rows3.head._3)))
  }

  test("a directory of WET segments reads as one frame, one task per file") {
    val dir = Files.createTempDirectory("graft_wet_dir").toString
    (0 until 3).foreach { i =>
      WetFixture.writeWet(s"$dir/seg-$i.warc.wet.gz",
        Seq((s"https://seg.com/$i", "2024-03-01T00:00:00Z", s"segment $i")))
    }
    val df = WetReader.read(spark, dir, globFilter = Some("*.wet.gz"))
    assert(df.count() == 3)
    assert(df.select("url").collect().map(_.getString(0)).sorted.toSeq ==
      (0 until 3).map(i => s"https://seg.com/$i"))
  }
}
