package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MdbSpec extends SparkSpec {

  private def cols = Seq(
    ("id", MdbFixture.CLong), ("name", MdbFixture.CText),
    ("score", MdbFixture.CDouble), ("active", MdbFixture.CBool),
    ("note", MdbFixture.CText))

  private def rows = Seq(
    Seq(Some("1"), Some("alpha"), Some("3.0"), Some("1"), Some("first note")),
    Seq(Some("2"), Some("bêta üñí"), Some("2.5"), Some("0"), None),
    Seq(Some("-3"), None, None, Some("1"), Some("")),
    Seq(Some("2147483647"), Some("max"), Some("-1.25"), Some("0"), Some("x")))

  private def writeFixture(compress: Boolean = false): String = {
    val f = Files.createTempFile("graft_fix", ".mdb").toString
    MdbFixture.writeMdb(f, "people", cols, rows, compressText = compress)
    f
  }

  test("round-trips a Jet4 fixture through the dispatching reader, strings-only") {
    val df = Readers.read(spark, writeFixture())
    assert(df.columns.toSeq == Seq("id", "name", "score", "active", "note"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    val got = df.orderBy(col("id").cast("long")).collect()
      .map(r => (0 until 5).map(i => r.getString(i)))
    assert(got.length == 4)
    assert(got(1) == Seq("1", "alpha", "3", "1", "first note")) // 3.0 → "3"
    assert(got(2) == Seq("2", "bêta üñí", "2.5", "0", null))    // null text
    assert(got(0) == Seq("-3", null, null, "1", ""))            // empty ≠ null
    assert(got(3) == Seq("2147483647", "max", "-1.25", "0", "x"))
  }

  test("compressed-text variant decodes identically for latin-1 values") {
    val plain = Readers.read(spark, writeFixture(compress = false))
      .orderBy(col("id").cast("long")).collect().map(_.toString).toSeq
    val comp = Readers.read(spark, writeFixture(compress = true))
      .orderBy(col("id").cast("long")).collect().map(_.toString).toSeq
    assert(plain == comp)
  }

  test("first USER table is selected: MSys* and non-table catalog rows skipped") {
    // the fixture's catalog lists MSysObjects and a non-table object
    // BEFORE the user table — reading 'people' proves the filter
    val df = Readers.read(spark, writeFixture())
    assert(df.columns.contains("name"))
    assert(df.count() == 4)
  }

  test("many rows span multiple data pages") {
    val f = Files.createTempFile("graft_big", ".mdb").toString
    val big = (0 until 500).map(i =>
      Seq(Some(i.toString), Some(s"name_$i padded with some text $i"),
        Some((i / 2.0).toString), Some((i % 2).toString), Some("n" * 50)))
    MdbFixture.writeMdb(f, "big", cols, big)
    assert(Files.size(java.nio.file.Paths.get(f)) > 5 * 4096) // really multi-page
    val got = MdbReader.read(spark, f)
    assert(got.count() == 500)
    assert(got.filter(col("id") === "499").collect()(0).getString(1)
      == "name_499 padded with some text 499")
  }

  test("wide table: multi-page TDEF chain stitches 150 columns") {
    val f = Files.createTempFile("graft_wide", ".mdb").toString
    // 150 descriptors (25 B each) + UTF-16 names blow well past one
    // 4096-byte page, forcing a continuation chain
    val wideCols = (0 until 150).map(i =>
      (s"really_long_column_name_number_$i", MdbFixture.CLong))
    val wideRows = (0 until 7).map(r =>
      (0 until 150).map(c => Some((r * 1000 + c).toString)))
    MdbFixture.writeMdb(f, "wide", wideCols, wideRows)
    val df = MdbReader.read(spark, f)
    assert(df.columns.length == 150)
    assert(df.columns(149) == "really_long_column_name_number_149")
    val got = df.orderBy(col("really_long_column_name_number_0").cast("long"))
      .collect()
    assert(got.length == 7)
    assert(got(3).getString(149) == "3149")
    // memo columns still work when the TDEF itself is chained
    val f2 = Files.createTempFile("graft_widem", ".mdb").toString
    val memoCols = wideCols.take(120) :+ ("body", MdbFixture.CMemo)
    val memoRows = (0 until 3).map(r =>
      (0 until 120).map(c => Some((r * 1000 + c).toString)) :+ Some("m" * 500))
    MdbFixture.writeMdb(f2, "widem", memoCols, memoRows)
    val got2 = MdbReader.read(spark, f2)
      .orderBy(col("really_long_column_name_number_0").cast("long")).collect()
    assert(got2.length == 3 && got2(0).getString(120) == "m" * 500)
  }

  test("preview limit stops early (TOP n parity)") {
    val (_, r) = MdbReader.readRows(writeFixture(), maxRows = 2)
    assert(r.length == 2)
  }

  test("DATETIME, MONEY, and GUID columns decode to display strings") {
    val f = Files.createTempFile("graft_rich", ".mdb").toString
    val c = Seq(("id", MdbFixture.CLong), ("ts", MdbFixture.CDate),
      ("amount", MdbFixture.CMoney), ("gid", MdbFixture.CGuid))
    val r = Seq(
      Seq(Some("1"), Some("2021-06-05 13:45:12"), Some("172799.49"),
        Some("{0000002a-0000-0000-0000-00000000002a}")),
      Seq(Some("2"), Some("2021-06-05"), Some("10.5000"), None),
      Seq(Some("3"), None, Some("-3.0001"),
        Some("{deadbeef-cafe-f00d-0123-456789abcdef}")),
      Seq(Some("4"), Some("1899-12-30"), Some("0"), None))
    MdbFixture.writeMdb(f, "rich", c, r)
    val got = MdbReader.read(spark, f).orderBy(col("id")).collect()
      .map(x => (0 until 4).map(x.getString))
    assert(got(0) == Seq("1", "2021-06-05 13:45:12", "172799.49",
      "{0000002a-0000-0000-0000-00000000002a}"))
    assert(got(1) == Seq("2", "2021-06-05", "10.5", null)) // midnight → date-only; money trims
    assert(got(2) == Seq("3", null, "-3.0001",
      "{deadbeef-cafe-f00d-0123-456789abcdef}"))
    assert(got(3) == Seq("4", "1899-12-30", "0", null)) // the Jet date epoch itself
  }

  test("MEMO decodes all three storage forms: inline, LVAL row, chained LVAL") {
    val f = Files.createTempFile("graft_memo", ".mdb").toString
    val c = Seq(("id", MdbFixture.CLong), ("body", MdbFixture.CMemo))
    val small = "short note"                       // ≤64 B encoded → inline
    val medium = "m" * 500                         // one LVAL row
    val large = (0 until 400).map(i => s"w$i").mkString(" ") * 4 // chained
    assert(large.length * 2 > 4096, "large memo must not fit one page")
    val r = Seq(
      Seq(Some("1"), Some(small)),
      Seq(Some("2"), Some(medium)),
      Seq(Some("3"), Some(large)),
      Seq(Some("4"), None),
      Seq(Some("5"), Some(""))) // empty inline ≠ null
    MdbFixture.writeMdb(f, "memos", c, r)
    val got = MdbReader.read(spark, f).orderBy(col("id")).collect()
      .map(x => x.getString(1))
    assert(got.toSeq == Seq(small, medium, large, null, ""))
    // compressed-text encoding round-trips through the same three forms
    val fc = Files.createTempFile("graft_memoc", ".mdb").toString
    MdbFixture.writeMdb(fc, "memos", c, r, compressText = true)
    assert(MdbReader.read(spark, fc).orderBy(col("id")).collect()
      .map(x => x.getString(1)).toSeq == Seq(small, medium, large, null, ""))
  }

  test("overflow rows are read from their owner-tagged overflow page, once") {
    val f = Files.createTempFile("graft_ovf", ".mdb").toString
    val c = Seq(("id", MdbFixture.CLong), ("name", MdbFixture.CText))
    val r = (0 until 6).map(i => Seq(Some(i.toString), Some(s"row_$i")))
    MdbFixture.writeMdbWithOverflow(f, "ovf", c, r, overflowIdx = Set(1, 4))
    val got = MdbReader.read(spark, f).orderBy(col("id").cast("long")).collect()
      .map(x => (x.getString(0), x.getString(1)))
    assert(got.toSeq == (0 until 6).map(i => (i.toString, s"row_$i")))
  }

  test("a valued unsupported column type raises a typed error naming the column") {
    val f = writeFixture()
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(f))
    // user TDEF is page 4: stomp the first column descriptor's type
    // byte (LONG 0x04 → COMPLEX 0x12); its 4-byte values are now
    // claimed by a type the reader must refuse, not null out
    val tdef = 4 * 4096
    assert(bytes(tdef + 0x3f) == 0x04)
    bytes(tdef + 0x3f) = 0x12
    Files.write(java.nio.file.Paths.get(f), bytes)
    val e = intercept[UnsupportedOperationException](
      MdbReader.readRows(f, 100))
    assert(e.getMessage.contains("0x12") && e.getMessage.contains("'id'"))
  }

  test("NUMERIC, BINARY, OLE, and fixed TEXT columns decode to display strings") {
    val f = Files.createTempFile("graft_bin", ".mdb").toString
    val c = Seq(("id", MdbFixture.CLong),
      ("num", MdbFixture.CNumeric(18, 4)),
      ("raw", MdbFixture.CBinary),
      ("obj", MdbFixture.COle),
      ("tag", MdbFixture.CFixedText(20)))
    def b64(bytes: Array[Byte]) = java.util.Base64.getEncoder.encodeToString(bytes)
    val tinyOle = b64(Array[Byte](1, 2, 3))                          // inline
    val midOle = b64(Array.tabulate[Byte](500)(_.toByte))            // one LVAL row
    val bigOle = b64(Array.tabulate[Byte](9000)(i => (i * 31).toByte)) // chained
    val r = Seq(
      Seq(Some("1"), Some("12345.6789"), Some("00ff10ab"), Some(tinyOle), Some("alpha")),
      Seq(Some("2"), Some("-0.5"), Some(""), Some(midOle), Some("")),
      Seq(Some("3"), Some("99999999999999.9999"), None, Some(bigOle), None),
      Seq(Some("4"), Some("0"), Some("deadbeef"), None, Some("ten chars!")))
    MdbFixture.writeMdb(f, "bin", c, r)
    val got = MdbReader.read(spark, f).orderBy(col("id")).collect()
      .map(x => (0 until 5).map(x.getString))
    assert(got(0) == Seq("1", "12345.6789", "00ff10ab", tinyOle, "alpha"))
    assert(got(1) == Seq("2", "-0.5", "", midOle, "")) // sign byte; empty ≠ null
    assert(got(2) == Seq("3", "99999999999999.9999", null, bigOle, null))
    assert(got(3) == Seq("4", "0", "deadbeef", null, "ten chars!"))
  }

  test(".accdb (ACE v0x02–v0x05) round-trips through the dispatching reader") {
    // 0x02/0x03 = Access 2007/2010; 0x04/0x05 = 2013/2016+ — identical
    // page/TDEF/row layout, so all four read through the Jet4 path
    for (v <- Seq(0x02, 0x03, 0x04, 0x05)) {
      val f = Files.createTempFile("graft_ace", ".accdb").toString
      MdbFixture.writeMdb(f, "people", cols, rows, versionByte = v)
      val df = Readers.read(spark, f)
      assert(df.columns.toSeq == Seq("id", "name", "score", "active", "note"))
      val got = df.orderBy(col("id").cast("long")).collect()
        .map(r => (0 until 5).map(r.getString))
      assert(got(1) == Seq("1", "alpha", "3", "1", "first note"), s"v=$v")
      assert(got.length == 4)
    }
  }

  test("Jet3 fixture round-trips: 2 KB pages, cp1252 text, jump-table rows") {
    val f = Files.createTempFile("graft_jet3", ".mdb").toString
    val c = Seq(("id", MdbFixture.CLong), ("name", MdbFixture.CText),
      ("score", MdbFixture.CDouble), ("active", MdbFixture.CBool),
      ("note", MdbFixture.CText))
    val short = "petite note"
    val oneJump = "a" * 300   // row crosses one 256-byte boundary
    val twoJump = "béta çédille " * 45 // ~585 cp1252 bytes: two boundaries
    val r = Seq(
      Seq(Some("1"), Some("ada"), Some("3.0"), Some("1"), Some(short)),
      Seq(Some("2"), Some("grace héd"), Some("2.5"), Some("0"), Some(oneJump)),
      Seq(Some("3"), None, None, Some("1"), Some(twoJump)),
      Seq(Some("4"), Some("max"), Some("-1.25"), Some("0"), Some("")),
      Seq(Some("5"), Some("nul"), Some("0.5"), Some("1"), None))
    MdbFixture.writeMdb3(f, "people", c, r)
    val df = Readers.read(spark, f)
    assert(df.columns.toSeq == Seq("id", "name", "score", "active", "note"))
    val got = df.orderBy(col("id").cast("long")).collect()
      .map(x => (0 until 5).map(x.getString))
    assert(got(0) == Seq("1", "ada", "3", "1", short))
    assert(got(1) == Seq("2", "grace héd", "2.5", "0", oneJump))
    assert(got(2) == Seq("3", null, null, "1", twoJump))
    assert(got(3) == Seq("4", "max", "-1.25", "0", ""))
    assert(got(4) == Seq("5", "nul", "0.5", "1", null))
    // multi-page: 300 rows on 2 KB pages forces several data pages
    val f2 = Files.createTempFile("graft_jet3big", ".mdb").toString
    val big = (0 until 300).map(i =>
      Seq(Some(i.toString), Some(s"name_$i"), Some((i / 2.0).toString),
        Some((i % 2).toString), Some("n" * 40)))
    MdbFixture.writeMdb3(f2, "big", c, big)
    val gotBig = MdbReader.read(spark, f2)
    assert(gotBig.count() == 300)
    assert(gotBig.filter(col("id") === "299").collect()(0).getString(1) == "name_299")
  }

  test("Jet3 MEMO/OLE read through 2 KB LVAL pages (inline, single-row, chained)") {
    val f = Files.createTempFile("graft_jet3memo", ".mdb").toString
    val c = Seq(("id", MdbFixture.CLong), ("note", MdbFixture.CMemo),
      ("blob", MdbFixture.COle))
    val inline = "façade à 64" // ≤64 cp1252 bytes → inline form
    val single = "mémo çédille " * 30 // ~390 B → one LVAL row
    val chained = "x" * 5000 // > one 2 KB page → chained LVAL rows
    val oleRaw = Array.tabulate[Byte](700)(i => (i * 31).toByte)
    val oleB64 = java.util.Base64.getEncoder.encodeToString(oleRaw)
    val r = Seq(
      Seq(Some("1"), Some(inline), Some(oleB64)),
      Seq(Some("2"), Some(single), None),
      Seq(Some("3"), Some(chained), None),
      Seq(Some("4"), None, None))
    MdbFixture.writeMdb3(f, "memos", c, r)
    val got = MdbReader.read(spark, f).orderBy(col("id").cast("long"))
      .collect().map(x => (0 until 3).map(x.getString))
    assert(got(0)(1) == inline)
    assert(got(0)(2) == oleB64)
    assert(got(1)(1) == single)
    assert(got(2)(1) == chained)
    assert(got(3)(1) == null && got(3)(2) == null)
  }

  test("RC4 conforms to the published test vectors") {
    // RFC 6229, 40-bit key 0x0102030405: first keystream bytes
    val ks = MdbReader.rc4Keystream(Array[Byte](1, 2, 3, 4, 5), 16)
    assert(ks.map(b => f"$b%02x").mkString ==
      "b2396305f03dc027ccc3524a0a1118a8")
    // classic vector: RC4("Key") keystream XOR "Plaintext" = ciphertext
    val pt = "Plaintext".getBytes("US-ASCII")
    val ct = MdbReader.rc4Keystream("Key".getBytes("US-ASCII"), pt.length)
      .zip(pt).map { case (k, p) => (k ^ p).toByte }
    assert(ct.map(b => f"$b%02x").mkString == "bbf316e8d940af0ad3")
  }

  test("RC4-encoded databases read transparently (Jet4, ACE, Jet3)") {
    // Jet4 with a chained memo: LVAL pages must decode too
    val f4 = Files.createTempFile("graft_enc4", ".mdb").toString
    val c4 = Seq(("id", MdbFixture.CLong), ("name", MdbFixture.CText),
      ("note", MdbFixture.CMemo))
    val big = "carol chained memo " * 300
    val r4 = Seq(
      Seq(Some("1"), Some("alice"), Some("inline note")),
      Seq(Some("2"), Some("bob"), Some(big)),
      Seq(Some("3"), None, None))
    MdbFixture.writeMdb(f4, "enc", c4, r4)
    val plain = Files.readAllBytes(java.nio.file.Paths.get(f4))
    MdbFixture.encodeMdb(f4, 0x5eed1234)
    // not vacuous: pages really are scrambled on disk
    assert(!java.util.Arrays.equals(plain, Files.readAllBytes(java.nio.file.Paths.get(f4))))
    intercept[Exception] { // and unreadable without the decode step:
      val noKey = Files.readAllBytes(java.nio.file.Paths.get(f4))
      putAt(noKey, 0x3e, 0xe15e01b9) // forge "un-encoded" marker
      val forged = Files.createTempFile("graft_enc4f", ".mdb").toString
      Files.write(java.nio.file.Paths.get(forged), noKey)
      MdbReader.read(spark, forged).collect()
    }
    val got4 = MdbReader.read(spark, f4).orderBy(col("id").cast("long"))
      .collect().map(x => (0 until 3).map(x.getString))
    assert(got4(0) == Seq("1", "alice", "inline note"))
    assert(got4(1) == Seq("2", "bob", big))
    assert(got4(2) == Seq("3", null, null))
    // ACE .accdb
    val fa = Files.createTempFile("graft_enca", ".accdb").toString
    MdbFixture.writeMdb(fa, "enc", c4.take(2), r4.map(_.take(2)), versionByte = 0x03)
    MdbFixture.encodeMdb(fa, 77)
    assert(MdbReader.read(spark, fa).orderBy(col("id").cast("long"))
      .collect().map(_.getString(1)).toSeq == Seq("alice", "bob", null))
    // Jet3 (2 KB pages — the per-format page stride matters)
    val f3 = Files.createTempFile("graft_enc3", ".mdb").toString
    val c3 = Seq(("id", MdbFixture.CLong), ("name", MdbFixture.CText))
    val r3 = (0 until 120).map(i => Seq(Some(i.toString), Some(s"nom_$i")))
    MdbFixture.writeMdb3(f3, "enc3", c3, r3)
    MdbFixture.encodeMdb(f3, -977)
    val got3 = MdbReader.read(spark, f3)
    assert(got3.count() == 120)
    assert(got3.filter(col("id") === "77").collect()(0).getString(1) == "nom_77")
  }

  private def putAt(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
  }

  test("unknown versions and magic/version mismatches raise typed errors") {
    // ACE-signed with an unknown version
    val ace9 = Files.createTempFile("graft_ace9", ".accdb").toString
    MdbFixture.writeMdb(ace9, "t", cols.take(2), rows.take(1).map(_.take(2)),
      versionByte = 0x09)
    val eA = intercept[UnsupportedOperationException](MdbReader.read(spark, ace9))
    assert(eA.getMessage.contains("ACE") && eA.getMessage.contains("0x09"))
    // Jet-signed with an ACE version byte (header corruption)
    val mix = Files.createTempFile("graft_mix", ".mdb").toString
    MdbFixture.writeMdb(mix, "t", cols.take(2), rows.take(1).map(_.take(2)))
    val mb = Files.readAllBytes(java.nio.file.Paths.get(mix))
    mb(0x14) = 0x02
    Files.write(java.nio.file.Paths.get(mix), mb)
    val eM = intercept[UnsupportedOperationException](MdbReader.read(spark, mix))
    assert(eM.getMessage.contains("unknown version"))
  }

  test("non-Jet bytes raise the typed signature error through the dispatcher") {
    for (ext <- Seq(".mdb", ".accdb")) {
      val junk = Files.createTempFile("graft_junk", ext)
      Files.write(junk, Array.fill[Byte](5000)(42))
      val e = intercept[IllegalArgumentException](
        Readers.read(spark, junk.toString))
      assert(e.getMessage.contains("signature"), ext)
    }
  }

  test("fuzz: arbitrary bytes after a valid header only ever raise the typed errors") {
    // quarantine invariant (same standard as the AVI demux): random
    // page contents, bit-flipped fixtures, and truncations must never
    // escape as deep binary errors (ArrayIndexOutOfBounds, NPE, ...)
    val fixture = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(writeFixture()))
    val rnd = new scala.util.Random(13)
    def attempt(bytes: Array[Byte]): Unit = {
      val f = Files.createTempFile("graft_fuzz", ".mdb")
      Files.write(f, bytes)
      // delete per attempt: ~180 fuzz files per suite run otherwise
      // accumulate in /tmp forever on a long-lived host
      try MdbReader.readRows(f.toString, 100)
      catch {
        case _: UnsupportedOperationException => ()
        case _: IllegalArgumentException => ()
      } finally Files.deleteIfExists(f)
    }
    (0 until 60).foreach { i =>
      // valid page-0 header + random garbage pages
      val garbage = new Array[Byte](4096 * (1 + rnd.nextInt(4)))
      rnd.nextBytes(garbage)
      attempt(java.util.Arrays.copyOf(fixture, 4096) ++ garbage)
      // bit-flipped real fixture
      val flipped = fixture.clone()
      (0 until 20).foreach { _ =>
        val p = 4096 + rnd.nextInt(flipped.length - 4096)
        flipped(p) = (flipped(p) ^ (1 << rnd.nextInt(8))).toByte
      }
      attempt(flipped)
      // truncations
      attempt(java.util.Arrays.copyOf(fixture, 4096 + i * 367))
    }
  }

  test("corrupt catalog surfaces the typed unreadable error, not a deep crash") {
    val f = writeFixture()
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(f))
    // stomp the catalog TDEF page type
    bytes(2 * 4096) = 0x07
    Files.write(java.nio.file.Paths.get(f), bytes)
    val e = intercept[Exception](MdbReader.read(spark, f))
    assert(e.isInstanceOf[UnsupportedOperationException] ||
      e.isInstanceOf[IllegalArgumentException])
  }
}
