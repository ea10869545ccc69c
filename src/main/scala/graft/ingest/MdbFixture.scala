package graft.ingest

import java.io.ByteArrayOutputStream

/** Jet4 `.mdb` fixture writer — the [[MdbReader]] counterpart of
  * [[BiffFixture]] (which plays the same role for BIFF8 `.xls`): emits
  * a structurally real Jet4 database so the reader's page walk, system
  * catalog traversal, TDEF parsing and row decoding are exercised
  * against genuine bytes, not mocks. Layout per the published Jet4
  * format (mdbtools format notes; see [[MdbReader]] scaladoc):
  *
  *   - page 0: `Standard Jet DB` header, version 0x01;
  *   - page 1: page-usage bitmap placeholder (readers that scan don't
  *     need it; kept so page numbering matches real files);
  *   - page 2: MSysObjects TDEF (Id LONG, Name TEXT, Type LONG,
  *     Flags LONG — the columns every catalog reader keys on by name);
  *   - page 3: catalog data page listing (in order) an `MSys*` system
  *     row, a non-table object, and the user table — so "first USER
  *     table" selection is actually exercised;
  *   - page 4: the user table's TDEF;
  *   - pages 5+: user data pages, rows packed from the page end with
  *     the Jet4 tail (null mask, u16 var count, u16 offset table).
  *
  * Strings write as plain UTF-16LE; `compressText = true` writes the
  * 0xFF 0xFE compressed variant for latin-1-only values instead
  * (covering the reader's other decode path).
  */
object MdbFixture {

  sealed trait ColType
  case object CText extends ColType
  case object CLong extends ColType
  case object CBool extends ColType
  case object CDouble extends ColType

  private val PageSize = 4096

  def writeMdb(
      path: String,
      tableName: String,
      columns: Seq[(String, ColType)],
      rows: Seq[Seq[Option[String]]],
      compressText: Boolean = false,
      versionByte: Int = 0x01): Unit = {
    val userTdefPg = 4
    val catalogCols = Seq(
      ("Id", CLong), ("Name", CText), ("Type", CLong), ("Flags", CLong))
    // catalog rows: system + non-table objects FIRST — the reader must
    // skip both to find the user table
    val catalogRows = Seq(
      Seq(Some("2"), Some("MSysObjects"), Some("1"), Some("-2147483646")),
      Seq(Some("0"), Some("Relationships"), Some("3"), Some("0")),
      Seq(Some(userTdefPg.toString), Some(tableName), Some("1"), Some("0")))

    val pages = ArrayBufferOfPages()
    pages += headerPage(versionByte)
    pages += new Array[Byte](PageSize) // page 1: usage bitmap placeholder
    pages += tdefPage(catalogCols, catalogRows.length)
    pages += null // page 3 reserved: catalog data (owner = 2)
    pages += tdefPage(columns, rows.length)
    val catData = dataPages(2, catalogCols, catalogRows, compressText = false)
    require(catData.length == 1, "catalog fixture must fit one page")
    pages.buf(3) = catData.head
    dataPages(userTdefPg, columns, rows, compressText).foreach(pages += _)

    val out = new ByteArrayOutputStream()
    pages.buf.foreach(out.write)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), out.toByteArray)
  }

  // tiny growable page list with slot replacement (page 3 is reserved
  // before its content exists — its owner TDEF must be written first)
  private final case class ArrayBufferOfPages(
      buf: scala.collection.mutable.ArrayBuffer[Array[Byte]] =
        scala.collection.mutable.ArrayBuffer.empty) {
    def +=(p: Array[Byte]): Unit = buf += p
  }

  private def headerPage(versionByte: Int): Array[Byte] = {
    val p = new Array[Byte](PageSize)
    p(0) = 0x00; p(1) = 0x01
    val magic = "Standard Jet DB".getBytes("US-ASCII")
    System.arraycopy(magic, 0, p, 4, magic.length)
    p(0x14) = versionByte.toByte
    p
  }

  private def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putI32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
  }

  private def fixedLen(t: ColType): Int = t match {
    case CLong => 4
    case CDouble => 8
    case CBool => 0 // value lives in the null mask
    case CText => 0
  }
  private def typeCode(t: ColType): Int = t match {
    case CBool => 0x01
    case CLong => 0x04
    case CDouble => 0x07
    case CText => 0x0a
  }

  private def tdefPage(columns: Seq[(String, ColType)], numRows: Int): Array[Byte] = {
    val p = new Array[Byte](PageSize)
    p(0) = 0x02; p(1) = 0x01
    putI32(p, 4, 0) // single-page TDEF
    putI32(p, 0x10, numRows)
    val varCols = columns.filter(_._2 == CText)
    putU16(p, 0x28, columns.length)
    putU16(p, 0x2a, varCols.length)
    putU16(p, 0x2c, columns.length)
    putI32(p, 0x2e, 0) // numIdx
    putI32(p, 0x32, 0) // numRealIdx
    var o = 0x3f
    var fixedOff = 0
    var varIdx = 0
    columns.zipWithIndex.foreach { case ((_, t), i) =>
      p(o) = typeCode(t).toByte
      putU16(p, o + 5, i)
      putU16(p, o + 7, if (t == CText) { val v = varIdx; varIdx += 1; v } else 0xffff)
      putU16(p, o + 9, i)
      p(o + 15) = (if (t == CText) 0x02 else 0x03).toByte // bit 0: fixed
      putU16(p, o + 21, if (t == CText) 0 else { val f = fixedOff; fixedOff += fixedLen(t); f })
      putU16(p, o + 23, fixedLen(t))
      o += 25
    }
    columns.foreach { case (name, _) =>
      val nb = name.getBytes("UTF-16LE")
      putU16(p, o, nb.length)
      System.arraycopy(nb, 0, p, o + 2, nb.length)
      o += 2 + nb.length
    }
    putI32(p, 8, o - 0x3f) // tdefLen
    p
  }

  private def encodeText(s: String, compress: Boolean): Array[Byte] =
    if (compress && s.forall(c => c < 256 && c != 0)) {
      val b = new Array[Byte](2 + s.length)
      b(0) = 0xff.toByte; b(1) = 0xfe.toByte
      var i = 0
      while (i < s.length) { b(2 + i) = s.charAt(i).toByte; i += 1 }
      b
    } else s.getBytes("UTF-16LE")

  private def encodeRow(
      columns: Seq[(String, ColType)], values: Seq[Option[String]],
      compressText: Boolean): Array[Byte] = {
    val n = columns.length
    val maskSz = (n + 7) / 8
    val fixed = new ByteArrayOutputStream()
    val mask = new Array[Byte](maskSz)
    def setNotNull(i: Int): Unit = mask(i / 8) = (mask(i / 8) | (1 << (i % 8)).toByte).toByte
    columns.zipWithIndex.foreach { case ((_, t), i) =>
      val v = values(i)
      t match {
        case CLong =>
          val b = new Array[Byte](4); v.foreach(s => putI32(b, 0, s.toInt))
          fixed.write(b); if (v.isDefined) setNotNull(i)
        case CDouble =>
          val b = new Array[Byte](8)
          v.foreach { s =>
            val bits = java.lang.Double.doubleToLongBits(s.toDouble)
            (0 until 8).foreach(k => b(k) = ((bits >> (8 * k)) & 0xff).toByte)
          }
          fixed.write(b); if (v.isDefined) setNotNull(i)
        case CBool => if (v.exists(s => s == "1" || s.equalsIgnoreCase("true"))) setNotNull(i)
        case CText => if (v.isDefined) setNotNull(i)
      }
    }
    val varCols = columns.zipWithIndex.filter(_._1._2 == CText)
    val varData = new ByteArrayOutputStream()
    val fixedBytes = fixed.toByteArray
    val varBase = 2 + fixedBytes.length
    val offsets = ArrayBuffer(varBase)
    varCols.foreach { case (_, i) =>
      values(i).foreach(s => varData.write(encodeText(s, compressText)))
      offsets += varBase + varData.size()
    }
    val varBytes = varData.toByteArray
    val nVar = varCols.length
    val rowLen = 2 + fixedBytes.length + varBytes.length + 2 * (nVar + 1) + 2 + maskSz
    val row = new Array[Byte](rowLen)
    putU16(row, 0, n)
    System.arraycopy(fixedBytes, 0, row, 2, fixedBytes.length)
    System.arraycopy(varBytes, 0, row, varBase, varBytes.length)
    // tail: offsets backward (off_0 nearest the count), u16 count, mask
    val tail = rowLen - maskSz
    putU16(row, tail - 2, nVar)
    offsets.zipWithIndex.foreach { case (off, i) =>
      putU16(row, tail - 2 - 2 * (i + 1), off)
    }
    System.arraycopy(mask, 0, row, rowLen - maskSz, maskSz)
    row
  }

  private val ArrayBuffer = scala.collection.mutable.ArrayBuffer

  private def dataPages(
      ownerTdefPg: Int,
      columns: Seq[(String, ColType)],
      rows: Seq[Seq[Option[String]]],
      compressText: Boolean): Seq[Array[Byte]] = {
    val pages = ArrayBuffer.empty[Array[Byte]]
    var cur = ArrayBuffer.empty[Array[Byte]]
    var dirEnd = 0x0e
    var dataStart = PageSize
    def flush(): Unit = if (cur.nonEmpty) {
      val p = new Array[Byte](PageSize)
      p(0) = 0x01; p(1) = 0x01
      putI32(p, 4, ownerTdefPg)
      putU16(p, 0x0c, cur.length)
      var end = PageSize
      cur.zipWithIndex.foreach { case (r, i) =>
        val start = end - r.length
        System.arraycopy(r, 0, p, start, r.length)
        putU16(p, 0x0e + 2 * i, start)
        end = start
      }
      putU16(p, 2, end - (0x0e + 2 * cur.length)) // free space
      pages += p
      cur = ArrayBuffer.empty[Array[Byte]]
      dirEnd = 0x0e
      dataStart = PageSize
    }
    rows.foreach { values =>
      val r = encodeRow(columns, values, compressText)
      if (dataStart - r.length < dirEnd + 2) flush()
      require(dataStart - r.length >= dirEnd + 2, "row larger than a page")
      dataStart -= r.length
      dirEnd += 2
      cur += r
    }
    flush()
    pages.toSeq
  }
}
