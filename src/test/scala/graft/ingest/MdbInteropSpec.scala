package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Interop evidence for [[MdbReader]] beyond its own fixture's bytes.
  *
  * [[MdbFixture]] and [[MdbReader]] share an author, so layouts the
  * fixture never produces are blind spots (no independent Access file
  * generator exists in this offline environment — no mdbtools binary,
  * no real-world sample; this spec is the closest available
  * substitute, and README documents the residual risk). The builder
  * below is written directly from the published Jet4 page layout and
  * deliberately makes DIFFERENT choices everywhere the format allows
  * them, all of which real Access files produce after schema edits,
  * deletes, and index creation:
  *
  *   - column DESCRIPTOR order ≠ column-number order (Access appends
  *     re-added columns at the descriptor tail but keeps their ordinal
  *     position — the reader must sort by column number, not trust
  *     file order);
  *   - nonzero `numRealIdx` with real 12-byte index blocks between the
  *     TDEF header and the descriptors (every primary-keyed Access
  *     table has these; MdbFixture always writes zero);
  *   - row directory order ≠ physical placement order, with free space
  *     BETWEEN rows (the post-delete/update layout — rows are not
  *     packed back-to-back from the page end);
  *   - deleted rows: directory entries flagged 0x8000 whose old bytes
  *     still sit on the page and must not be returned, while still
  *     delimiting their neighbours' extents;
  *   - interleaved data pages owned by a DIFFERENT table between the
  *     user table's pages (multi-table files interleave allocation);
  *   - a catalog (MSysObjects) with extra columns around the four the
  *     reader keys on, in a different column order than MdbFixture's,
  *     so catalog-by-name lookup is actually exercised;
  *   - rows placed leaving the page's free-space counter stale (real
  *     files routinely carry stale free-space hints; the reader must
  *     not use it).
  */
class MdbInteropSpec extends SparkSpec {

  import MdbInterop._

  test("reader handles a foreign layout: shuffled descriptors, index blocks, " +
    "deleted rows, unpacked pages, interleaved owners") {
    val f = Files.createTempFile("graft_interop", ".mdb").toString
    writeForeignLayout(f)
    val df = MdbReader.read(spark, f)
    // column order must follow column NUMBERS (id, name, score), not
    // the shuffled descriptor order (score, id, name)
    assert(df.columns.toSeq == Seq("id", "name", "score"))
    val got = df.orderBy(col("id").cast("long")).collect()
      .map(r => (0 until 3).map(r.getString))
    // row 2 is deleted on-page; rows 0,1,3,4 survive in two pages with
    // a foreign-owner page between them
    assert(got.length == 4)
    assert(got.map(_.head).toSeq == Seq("10", "11", "13", "14"))
    assert(got(0) == Seq("10", "ada", "1.5"))
    assert(got(1) == Seq("11", "grace héd", "-2")) // non-latin char, int-trimmed double
    assert(got(2) == Seq("13", null, "0.25"))      // null text via mask
    assert(got(3) == Seq("14", "", "99"))          // empty ≠ null
  }
}

/** Minimal independent Jet4 writer for [[MdbInteropSpec]] — built
  * field-by-field from the published layout, sharing NO code with
  * [[MdbFixture]] (deliberately: a shared encode helper would
  * re-introduce the shared-assumption problem this spec exists to
  * reduce).
  */
object MdbInterop {

  private val P = 4096

  private def u16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def i32(b: Array[Byte], o: Int, v: Int): Unit = {
    u16(b, o, v & 0xffff); u16(b, o + 2, (v >> 16) & 0xffff)
  }

  /** One Jet4 data row: u16 colCount, fixed block, var block, then from
    * the tail: null mask, u16 varCount, (varCount+1) u16 offsets.
    * `fixedVals` are (bytes, notNull); `varVals` are Option[String]
    * (UTF-16LE; None = null bit clear, offsets collapse).
    */
  private def row(
      nCols: Int,
      fixedVals: Seq[(Array[Byte], Boolean)],
      varVals: Seq[Option[String]],
      notNullBits: Seq[Int]): Array[Byte] = {
    val fixed = fixedVals.flatMap(_._1).toArray
    val varBytes = varVals.map(_.map(_.getBytes("UTF-16LE")).getOrElse(Array.empty[Byte]))
    val maskSz = (nCols + 7) / 8
    val nVar = varVals.length
    val len = 2 + fixed.length + varBytes.map(_.length).sum + 2 * (nVar + 1) + 2 + maskSz
    val r = new Array[Byte](len)
    u16(r, 0, nCols)
    System.arraycopy(fixed, 0, r, 2, fixed.length)
    var off = 2 + fixed.length
    val offs = scala.collection.mutable.ArrayBuffer(off)
    varBytes.foreach { vb =>
      System.arraycopy(vb, 0, r, off, vb.length)
      off += vb.length
      offs += off
    }
    val tail = len - maskSz
    u16(r, tail - 2, nVar)
    offs.zipWithIndex.foreach { case (o, i) => u16(r, tail - 2 - 2 * (i + 1), o) }
    val mask = new Array[Byte](maskSz)
    notNullBits.foreach(c => mask(c / 8) = (mask(c / 8) | (1 << (c % 8))).toByte)
    System.arraycopy(mask, 0, r, len - maskSz, maskSz)
    r
  }

  /** TDEF page with explicit descriptor entries `(typeCode, colNum,
    * offV, offF, fixedFlag, len)` in FILE order and `names` parallel to
    * them, plus `nIdx` fake-but-present 12-byte real-index blocks.
    */
  private def tdef(
      descs: Seq[(Int, Int, Int, Int, Boolean, Int)],
      names: Seq[String],
      nIdx: Int,
      numRows: Int): Array[Byte] = {
    val p = new Array[Byte](P)
    p(0) = 0x02; p(1) = 0x01
    i32(p, 4, 0)
    i32(p, 0x10, numRows)
    u16(p, 0x28, descs.length)
    u16(p, 0x2a, descs.count(!_._5))
    u16(p, 0x2c, descs.length)
    i32(p, 0x2e, nIdx)
    i32(p, 0x32, nIdx)
    var o = 0x3f
    (0 until nIdx).foreach { i => // index blocks: reader must skip them
      i32(p, o, 0x1ab0 + i); i32(p, o + 4, 0x7f7f7f7f); i32(p, o + 8, i)
      o += 12
    }
    descs.foreach { case (typ, num, offV, offF, fixed, len) =>
      p(o) = typ.toByte
      u16(p, o + 5, num)
      u16(p, o + 7, if (fixed) 0xffff else offV)
      u16(p, o + 9, num)
      p(o + 15) = (if (fixed) 0x03 else 0x02).toByte
      u16(p, o + 21, offF)
      u16(p, o + 23, len)
      o += 25
    }
    names.foreach { n =>
      val nb = n.getBytes("UTF-16LE")
      u16(p, o, nb.length)
      System.arraycopy(nb, 0, p, o + 2, nb.length)
      o += 2 + nb.length
    }
    i32(p, 8, o - 0x3f)
    p
  }

  /** Data page laying rows out at EXPLICIT positions: `slots` maps each
    * directory index to (startOffset | flags, rowBytes-or-null). Rows
    * are placed wherever their offset says — including with gaps — and
    * the free-space counter is left deliberately stale (0xBEE) to prove
    * the reader ignores it.
    */
  private def dataPage(owner: Int, slots: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val p = new Array[Byte](P)
    p(0) = 0x01; p(1) = 0x01
    u16(p, 2, 0xbee) // stale free-space hint
    i32(p, 4, owner)
    u16(p, 0x0c, slots.length)
    slots.zipWithIndex.foreach { case ((rawOff, bytes), i) =>
      u16(p, 0x0e + 2 * i, rawOff)
      if (bytes != null)
        System.arraycopy(bytes, 0, p, rawOff & 0x1fff, bytes.length)
    }
    p
  }

  private def longCol(v: Long): (Array[Byte], Boolean) = {
    val b = new Array[Byte](4); i32(b, 0, v.toInt); (b, true)
  }
  private def doubleCol(v: Double): (Array[Byte], Boolean) = {
    val b = new Array[Byte](8)
    val bits = java.lang.Double.doubleToLongBits(v)
    (0 until 8).foreach(k => b(k) = ((bits >> (8 * k)) & 0xff).toByte)
    (b, true)
  }

  def writeForeignLayout(path: String): Unit = {
    // --- user table: logical columns (by number) id LONG(0), name
    // TEXT(1), score DOUBLE(2); DESCRIPTOR order score, id, name
    val userTdefPg = 4
    val userDescs = Seq(
      (0x07, 2, 0, 4, true, 8),   // score DOUBLE at fixed offset 4
      (0x04, 0, 0, 0, true, 4),   // id LONG at fixed offset 0
      (0x0a, 1, 0, 0, false, 0))  // name TEXT, var index 0
    val userNames = Seq("score", "id", "name")

    def userRow(id: Long, name: Option[String], score: Double): Array[Byte] = {
      val notNull = Seq(0) ++ (if (name.isDefined) Seq(1) else Nil) ++ Seq(2)
      // fixed block in OFFSET order: id at 0, score at 4
      row(3, Seq(longCol(id), doubleCol(score)), Seq(name), notNull)
    }

    val r10 = userRow(10, Some("ada"), 1.5)
    val r11 = userRow(11, Some("grace héd"), -2.0)
    val r12 = userRow(12, Some("DELETED ROW"), 7.0) // bytes stay, flag 0x8000
    val r13 = userRow(13, None, 0.25)
    val r14 = userRow(14, Some(""), 99.0)

    // page 5: three directory entries; placement order scrambled vs
    // directory order, slot 1 deleted mid-page. Rows stay contiguous —
    // Jet4 extents end where the next-higher offset begins and the row
    // tail is parsed from the extent end, so a conforming writer can
    // scramble ORDER but not leave inter-row slack.
    val s12 = P - r12.length                  // highest: the deleted row
    val s10 = s12 - r10.length
    val s11 = s10 - r11.length
    val page5 = dataPage(userTdefPg, Seq(
      (s10, r10),
      (s12 | 0x8000, r12), // deleted: flagged, bytes still on page
      (s11, r11)))

    // page 6: owned by a DIFFERENT tdef page (99) — must be skipped
    val foreign = dataPage(99, Seq((P - 32, Array.fill[Byte](32)(0x5a))))

    // page 7: remaining rows, directory reversed vs placement
    val s14 = P - r14.length
    val s13 = s14 - r13.length
    val page7 = dataPage(userTdefPg, Seq((s13, r13), (s14, r14)))

    // --- catalog: six columns in an order MdbFixture never writes,
    // with the reader's four (Id/Name/Type/Flags) scattered among
    // decoys; all LONG except Name
    val catDescs = Seq(
      (0x04, 0, 0, 0, true, 4),   // DateCreate (decoy)
      (0x04, 1, 0, 4, true, 4),   // Id
      (0x0a, 2, 0, 0, false, 0),  // Name
      (0x04, 3, 0, 8, true, 4),   // ParentId (decoy)
      (0x04, 4, 0, 12, true, 4),  // Type
      (0x04, 5, 0, 16, true, 4))  // Flags
    val catNames = Seq("DateCreate", "Id", "Name", "ParentId", "Type", "Flags")
    def catRow(id: Int, name: String, typ: Int, flags: Int): Array[Byte] =
      row(6,
        Seq(longCol(77), longCol(id), longCol(3), longCol(typ), longCol(flags)),
        Seq(Some(name)), Seq(0, 1, 2, 3, 4, 5))
    // system + deep-hidden + user rows; the user table LAST
    val catRows = Seq(
      catRow(2, "MSysObjects", 1, 0),
      catRow(20, "MSysACEs", 1, 0),
      catRow(30, "hidden_sys", 1, 0x2), // hidden-flag bit set → skipped
      catRow(userTdefPg, "people", 1, 0))
    var cend = P
    val cslots = catRows.map { r => cend -= r.length; (cend, r) }
    val page3 = dataPage(2, cslots)

    val pages = Seq(
      header(),
      new Array[Byte](P), // page 1: bitmap placeholder
      tdef(catDescs, catNames, nIdx = 1, numRows = catRows.length), // page 2
      page3,
      tdef(userDescs, userNames, nIdx = 2, numRows = 4), // page 4
      page5, foreign, page7)
    val out = new java.io.ByteArrayOutputStream()
    pages.foreach(out.write)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), out.toByteArray)
  }

  private def header(): Array[Byte] = {
    val p = new Array[Byte](P)
    p(0) = 0x00; p(1) = 0x01
    val m = "Standard Jet DB".getBytes("US-ASCII")
    System.arraycopy(m, 0, p, 4, m.length)
    p(0x14) = 0x01
    p
  }
}
