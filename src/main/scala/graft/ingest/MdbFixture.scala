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
  /** value = decimal string, ≤4 fraction digits (scaled-int64 storage) */
  case object CMoney extends ColType
  /** value = `yyyy-MM-dd` or `yyyy-MM-dd HH:mm:ss` (double-days storage) */
  case object CDate extends ColType
  /** value = braced registry-format guid */
  case object CGuid extends ColType
  /** long text; storage auto-selected by encoded size — inline (≤64 B),
    * one LVAL row (≤[[LvalChunk]] B), or a chained multi-row LVAL walk
    */
  case object CMemo extends ColType
  /** value = lowercase hex string; stored as variable-length raw bytes */
  case object CBinary extends ColType
  /** value = base64 string; OLE object storage = MEMO's LVAL forms with
    * raw (non-text) payload bytes
    */
  case object COle extends ColType
  /** value = decimal string; 17-byte fixed-point (sign byte, 0x80 =
    * negative, + 16-byte big-endian magnitude at `scale`), precision/
    * scale written to descriptor bytes 11/12 per the Jet4 layout
    */
  final case class CNumeric(prec: Int, scale: Int) extends ColType
  /** fixed-length TEXT: `len` bytes of UTF-16LE, zero-padded — rare but
    * legal in Jet4 (the fixed flag + type 0x0a combination)
    */
  final case class CFixedText(len: Int) extends ColType

  private val PageSize = 4096

  /** Max LVAL row payload per chunk — small enough that several chunk
    * rows share a page, large enough that big memos chain across pages.
    */
  private val LvalChunk = 1800
  private val InlineMax = 64

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
    // user TDEF at page 4; wide tables chain continuation pages at 5..
    val userTdef = tdefPagesOf(tdefStreamBytes(columns, rows.length), contStart = 5)
    userTdef.foreach(pages += _)
    val catData = dataPages(2, catalogCols, catalogRows, compressText = false,
      Seq.fill(catalogRows.length)(Map.empty[Int, Array[Byte]]))
    require(catData.length == 1, "catalog fixture must fit one page")
    pages.buf(3) = catData.head
    // memo plan: every CMemo value becomes a 12-byte header (+ inline
    // bytes) in its row's variable block; non-inline values also place
    // rows on LVAL pages, which follow the TDEF chain so their record
    // pointers are known before the data pages are encoded
    val memoCols = columns.zipWithIndex.collect {
      case ((_, t @ (CMemo | COle)), i) => (i, t)
    }
    val lval = new LvalAlloc(firstPg = 4 + userTdef.length)
    val memoPlan: Seq[Map[Int, Array[Byte]]] = rows.map { values =>
      memoCols.flatMap { case (ci, t) =>
        values(ci).map { s =>
          val payload =
            if (t == COle) java.util.Base64.getDecoder.decode(s)
            else encodeText(s, compressText)
          ci -> lval.memoField(payload)
        }
      }.toMap
    }
    lval.pages().foreach(pages += _)
    dataPages(userTdefPg, columns, rows, compressText, memoPlan).foreach(pages += _)

    val out = new ByteArrayOutputStream()
    pages.buf.foreach(out.write)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), out.toByteArray)
  }

  /** Jet3 (Access 95/97) fixture: 2 KB pages, version byte 0x00,
    * 18-byte column descriptors from 0x2b with u8-length cp1252 names,
    * data-page row directory at 0x08, and Jet3 row encoding — u8
    * column count, u8 var offsets with the mod-256 jump table (byte
    * placement per the convention documented on
    * `MdbReader.jet3VarOffsets`). Column types: CLong, CDouble, CBool,
    * CText, plus CMemo/COle via 2 KB `LVAL` pages (same field header
    * and storage forms as Jet4; cp1252 text payloads).
    */
  def writeMdb3(
      path: String,
      tableName: String,
      columns: Seq[(String, ColType)],
      rows: Seq[Seq[Option[String]]]): Unit = {
    require(columns.forall(c => Seq(CLong, CDouble, CBool, CText, CMemo, COle).contains(c._2)),
      "Jet3 fixture supports CLong/CDouble/CBool/CText/CMemo/COle")
    val P3 = 2048
    val userTdefPg = 4
    val catalogCols = Seq(
      ("Id", CLong), ("Name", CText), ("Type", CLong), ("Flags", CLong))
    val catalogRows = Seq(
      Seq(Some("2"), Some("MSysObjects"), Some("1"), Some("-2147483646")),
      Seq(Some(userTdefPg.toString), Some(tableName), Some("1"), Some("0")))

    def tdef3(cols: Seq[(String, ColType)]): Array[Byte] = {
      val p = new Array[Byte](P3)
      p(0) = 0x02; p(1) = 0x01
      putI32(p, 4, 0)
      putU16(p, 0x19, cols.length)
      putI32(p, 0x1f, 0) // numRealIdx
      var o = 0x2b
      var fixedOff = 0
      var varIdx = 0
      cols.zipWithIndex.foreach { case ((_, t), i) =>
        p(o) = typeCode(t).toByte
        putU16(p, o + 1, i)
        putU16(p, o + 3, if (isVar(t)) { val v = varIdx; varIdx += 1; v } else 0xffff)
        p(o + 13) = (if (isVar(t)) 0x02 else 0x03).toByte
        putU16(p, o + 14, if (isVar(t)) 0 else { val f = fixedOff; fixedOff += fixedLen(t); f })
        putU16(p, o + 16, fixedLen(t))
        o += 18
      }
      cols.foreach { case (name, _) =>
        val nb = name.getBytes("windows-1252")
        p(o) = nb.length.toByte
        System.arraycopy(nb, 0, p, o + 1, nb.length)
        o += 1 + nb.length
      }
      p
    }

    def encodeRow3(cols: Seq[(String, ColType)], values: Seq[Option[String]],
        memo: Map[Int, Array[Byte]] = Map.empty): Array[Byte] = {
      val n = cols.length
      val maskSz = (n + 7) / 8
      val fixed = new ByteArrayOutputStream()
      val mask = new Array[Byte](maskSz)
      def setNotNull(i: Int): Unit =
        mask(i / 8) = (mask(i / 8) | (1 << (i % 8)).toByte).toByte
      cols.zipWithIndex.foreach { case ((_, t), i) =>
        val v = values(i)
        t match {
          case CLong =>
            val b = new Array[Byte](4); v.foreach(s => putI32(b, 0, s.toInt))
            fixed.write(b); if (v.isDefined) setNotNull(i)
          case CDouble =>
            val b = new Array[Byte](8)
            v.foreach(s => putI64(b, 0, java.lang.Double.doubleToLongBits(s.toDouble)))
            fixed.write(b); if (v.isDefined) setNotNull(i)
          case CBool =>
            if (v.exists(s => s == "1" || s.equalsIgnoreCase("true"))) setNotNull(i)
          case _ => if (v.isDefined) setNotNull(i)
        }
      }
      val varCols = cols.zipWithIndex.filter(c => isVar(c._1._2))
      val nVar = varCols.length
      val fixedBytes = fixed.toByteArray
      val varData = new ByteArrayOutputStream()
      val varBase = 1 + fixedBytes.length
      val offsAbs = scala.collection.mutable.ArrayBuffer(varBase)
      varCols.foreach { case ((_, _), i) =>
        values(i).foreach(s =>
          varData.write(memo.getOrElse(i, s.getBytes("windows-1252"))))
        offsAbs += varBase + varData.size()
      }
      val varBytes = varData.toByteArray
      // row length depends on the jump-table size which depends on row
      // length — iterate to the (≤2-step) fixpoint
      var numJumps = 0
      var rowLen = 0
      var settled = false
      while (!settled) {
        rowLen = 1 + fixedBytes.length + varBytes.length + (nVar + 1) + 1 +
          numJumps + maskSz
        val nj = (rowLen - 1) / 256
        if (nj == numJumps) settled = true else numJumps = nj
      }
      val row = new Array[Byte](rowLen)
      row(0) = n.toByte
      System.arraycopy(fixedBytes, 0, row, 1, fixedBytes.length)
      System.arraycopy(varBytes, 0, row, varBase, varBytes.length)
      val cntAt = rowLen - maskSz - numJumps - 1
      row(cntAt) = nVar.toByte
      offsAbs.zipWithIndex.foreach { case (off, i) =>
        row(cntAt - 1 - i) = (off & 0xff).toByte
      }
      (0 until numJumps).foreach { j =>
        val entry = offsAbs.indexWhere(_ >= 256 * (j + 1))
        row(rowLen - maskSz - 1 - j) =
          (if (entry < 0) 0xff else entry).toByte // 0xff: block never reached
      }
      System.arraycopy(mask, 0, row, rowLen - maskSz, maskSz)
      row
    }

    def dataPages3(owner: Int, cols: Seq[(String, ColType)],
        rs: Seq[Seq[Option[String]]],
        memoPlan: Seq[Map[Int, Array[Byte]]] = Seq.empty): Seq[Array[Byte]] = {
      val pages = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var dirEnd = 0x0a
      var dataStart = P3
      def flush(): Unit = if (cur.nonEmpty) {
        val p = new Array[Byte](P3)
        p(0) = 0x01; p(1) = 0x01
        putI32(p, 4, owner)
        putU16(p, 0x08, cur.length)
        var end = P3
        cur.zipWithIndex.foreach { case (r, i) =>
          val start = end - r.length
          System.arraycopy(r, 0, p, start, r.length)
          putU16(p, 0x0a + 2 * i, start)
          end = start
        }
        putU16(p, 2, end - (0x0a + 2 * cur.length))
        pages += p
        cur = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        dirEnd = 0x0a
        dataStart = P3
      }
      rs.zipWithIndex.foreach { case (values, ri) =>
        val r = encodeRow3(cols, values,
          if (memoPlan.isEmpty) Map.empty else memoPlan(ri))
        if (dataStart - r.length < dirEnd + 2) flush()
        require(dataStart - r.length >= dirEnd + 2, "row larger than a Jet3 page")
        dataStart -= r.length
        dirEnd += 2
        cur += r
      }
      flush()
      pages.toSeq
    }

    val header = new Array[Byte](P3)
    header(0) = 0x00; header(1) = 0x01
    val m = "Standard Jet DB".getBytes("US-ASCII")
    System.arraycopy(m, 0, header, 4, m.length)
    header(0x14) = 0x00
    putI32(header, 0x3e, 0xe15e01b9) // un-encoded db-key field
    val catData = dataPages3(2, catalogCols, catalogRows)
    require(catData.length == 1, "Jet3 catalog fixture must fit one page")
    // memo plan mirrors writeMdb: LVAL pages sit right after the user
    // TDEF (page 5..) so record pointers are known before rows encode;
    // Jet3 memo/OLE payloads are cp1252 text / raw base64-decoded bytes
    val memoCols = columns.zipWithIndex.collect {
      case ((_, t @ (CMemo | COle)), i) => (i, t)
    }
    val lval = new LvalAlloc(firstPg = 5, pageSize = P3, rcOff = 0x08)
    val memoPlan: Seq[Map[Int, Array[Byte]]] = rows.map { values =>
      memoCols.flatMap { case (ci, t) =>
        values(ci).map { s =>
          val payload =
            if (t == COle) java.util.Base64.getDecoder.decode(s)
            else s.getBytes("windows-1252")
          ci -> lval.memoField(payload)
        }
      }.toMap
    }
    val pages = Seq(header, new Array[Byte](P3), tdef3(catalogCols),
      catData.head, tdef3(columns)) ++ lval.pages() ++
      dataPages3(userTdefPg, columns, rows, memoPlan)
    val out = new ByteArrayOutputStream()
    pages.foreach(out.write)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), out.toByteArray)
  }

  /** Variant with rows relocated to an overflow page: for each index in
    * `overflowIdx`, the main data page's directory entry is flagged
    * 0x4000 and holds only a 4-byte record pointer to the row's real
    * home on a second, owner-tagged data page — the layout Jet produces
    * when an update outgrows the row's original page. No memo columns.
    */
  def writeMdbWithOverflow(
      path: String,
      tableName: String,
      columns: Seq[(String, ColType)],
      rows: Seq[Seq[Option[String]]],
      overflowIdx: Set[Int]): Unit = {
    require(columns.forall(c => c._2 != CMemo && c._2 != COle),
      "overflow fixture excludes LVAL-backed columns")
    val userTdefPg = 4
    val catalogCols = Seq(
      ("Id", CLong), ("Name", CText), ("Type", CLong), ("Flags", CLong))
    val catalogRows = Seq(
      Seq(Some("2"), Some("MSysObjects"), Some("1"), Some("-2147483646")),
      Seq(Some(userTdefPg.toString), Some(tableName), Some("1"), Some("0")))
    val pages = ArrayBufferOfPages()
    pages += headerPage(0x01)
    pages += new Array[Byte](PageSize)
    pages += tdefPage(catalogCols, catalogRows.length)
    pages += dataPages(2, catalogCols, catalogRows, compressText = false,
      Seq.fill(catalogRows.length)(Map.empty[Int, Array[Byte]])).head
    pages += tdefPage(columns, rows.length)
    val enc = rows.map(v => encodeRow(columns, v, compressText = false, Map.empty))
    val overflowRows = rows.indices.filter(overflowIdx.contains)
    // page 6 holds the relocated rows as ordinary rows
    val mainPg = new Array[Byte](PageSize)
    mainPg(0) = 0x01; mainPg(1) = 0x01
    putI32(mainPg, 4, userTdefPg)
    putU16(mainPg, 0x0c, rows.length)
    var end = PageSize
    rows.indices.foreach { i =>
      val content =
        if (overflowIdx.contains(i)) {
          val ptr = new Array[Byte](4)
          putI32(ptr, 0, (overflowRows.indexOf(i) << 24) | 6)
          ptr
        } else enc(i)
      val start = end - content.length
      System.arraycopy(content, 0, mainPg, start, content.length)
      putU16(mainPg, 0x0e + 2 * i,
        if (overflowIdx.contains(i)) start | 0x4000 else start)
      end = start
    }
    putU16(mainPg, 2, end - (0x0e + 2 * rows.length))
    pages += mainPg
    val ovPg = new Array[Byte](PageSize)
    ovPg(0) = 0x01; ovPg(1) = 0x01
    putI32(ovPg, 4, userTdefPg)
    putU16(ovPg, 0x0c, overflowRows.length)
    var end2 = PageSize
    overflowRows.zipWithIndex.foreach { case (ri, slot) =>
      val start = end2 - enc(ri).length
      System.arraycopy(enc(ri), 0, ovPg, start, enc(ri).length)
      putU16(ovPg, 0x0e + 2 * slot, start)
      end2 = start
    }
    putU16(ovPg, 2, end2 - (0x0e + 2 * overflowRows.length))
    pages += ovPg
    val out = new ByteArrayOutputStream()
    pages.buf.foreach(out.write)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), out.toByteArray)
  }

  /** Allocates LVAL rows across `LVAL`-tagged pages numbered from
    * `firstPg`; chained memos place their chunks in reverse so each
    * chunk's leading next-pointer is known when it is written.
    * `pageSize`/`rcOff` select the page geometry (Jet4: 4 KB with the
    * row count at 0x0c; Jet3: 2 KB at 0x08) — the LVAL tag, record
    * pointers, and 12-byte field headers are generation-invariant.
    */
  private final class LvalAlloc(firstPg: Int, pageSize: Int = PageSize, rcOff: Int = 0x0c) {
    private val dirAt = rcOff + 2
    private val chunk = math.min(LvalChunk, pageSize - dirAt - 8)
    private val pageRows =
      scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[Array[Byte]])
    private var free = pageSize - dirAt

    private def place(content: Array[Byte]): Int = {
      if (content.length + 2 > free) {
        pageRows += scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
        free = pageSize - dirAt
      }
      require(content.length + 2 <= free, "LVAL row larger than a page")
      val ptr = (pageRows.last.length << 24) | (firstPg + pageRows.length - 1)
      pageRows.last += content
      free -= content.length + 2
      ptr
    }

    def memoField(enc: Array[Byte]): Array[Byte] = {
      if (enc.length <= InlineMax) {
        val b = new Array[Byte](12 + enc.length)
        putI32(b, 0, enc.length | 0x80 << 24)
        System.arraycopy(enc, 0, b, 12, enc.length)
        b
      } else if (enc.length <= chunk) {
        val b = new Array[Byte](12)
        putI32(b, 0, enc.length | 0x40 << 24)
        putI32(b, 4, place(enc))
        b
      } else {
        var next = 0
        enc.grouped(chunk).toSeq.reverse.foreach { ch =>
          val content = new Array[Byte](4 + ch.length)
          putI32(content, 0, next)
          System.arraycopy(ch, 0, content, 4, ch.length)
          next = place(content)
        }
        val b = new Array[Byte](12)
        putI32(b, 0, enc.length)
        putI32(b, 4, next)
        b
      }
    }

    def pages(): Seq[Array[Byte]] = pageRows.filter(_.nonEmpty).toSeq.map { rs =>
      val p = new Array[Byte](pageSize)
      p(0) = 0x01; p(1) = 0x01
      System.arraycopy("LVAL".getBytes("US-ASCII"), 0, p, 4, 4)
      putU16(p, rcOff, rs.length)
      var end = pageSize
      rs.zipWithIndex.foreach { case (r, i) =>
        val start = end - r.length
        System.arraycopy(r, 0, p, start, r.length)
        putU16(p, dirAt + 2 * i, start)
        end = start
      }
      putU16(p, 2, end - (dirAt + 2 * rs.length))
      p
    }
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
    // ACE versions (0x02 Access 2007, 0x03 2010+) sign with their own
    // magic; the page machinery below is shared with Jet4, as in real
    // files
    val magic = (if (versionByte >= 0x02) "Standard ACE DB"
      else "Standard Jet DB").getBytes("US-ASCII")
    System.arraycopy(magic, 0, p, 4, magic.length)
    p(0x14) = versionByte.toByte
    // un-encoded db-key field: real files store key 0 XOR'd with the
    // header mask (see MdbReader.DbKeyMask)
    putI32(p, 0x3e, 0xe15e01b9)
    p
  }

  /** Applies the Jet "Encode Database" transform to a written fixture:
    * stores `key ^ mask` in the header's 0x3e field and RC4-encrypts
    * every page except page 0 with the 4-byte LE key `key ^ pageNumber`
    * (the mdbtools-documented scheme). The page size follows the
    * version byte, so Jet3/Jet4/ACE fixtures all encode.
    */
  def encodeMdb(path: String, key: Int): Unit = {
    require(key != 0 && key != 0xe15e01b9, "key 0 / mask collide with the un-encoded marker")
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val ps = if ((bytes(0x14) & 0xff) == 0x00) 2048 else PageSize
    putI32(bytes, 0x3e, key ^ 0xe15e01b9)
    var pg = 1
    while ((pg + 1) * ps <= bytes.length) {
      val k = key ^ pg
      fixtureRc4(Array[Byte](k.toByte, (k >> 8).toByte, (k >> 16).toByte, (k >>> 24).toByte),
        bytes, pg * ps, ps)
      pg += 1
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
  }

  // RC4 for the encoder (the reader has its own copy; both are pinned
  // to the RFC 6229 vectors in MdbSpec, which is what makes the
  // round-trip meaningful — symmetric-cipher bugs would self-cancel)
  private def fixtureRc4(key: Array[Byte], buf: Array[Byte], off: Int, len: Int): Unit = {
    val s = (0 until 256).toArray
    var j = 0
    for (i <- 0 until 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) % 256
      val t = s(i); s(i) = s(j); s(j) = t
    }
    var i = 0
    j = 0
    for (n <- 0 until len) {
      i = (i + 1) % 256
      j = (j + s(i)) % 256
      val t = s(i); s(i) = s(j); s(j) = t
      buf(off + n) = (buf(off + n) ^ s((s(i) + s(j)) % 256)).toByte
    }
  }

  private def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putI64(b: Array[Byte], o: Int, v: Long): Unit =
    (0 until 8).foreach(k => b(o + k) = ((v >> (8 * k)) & 0xff).toByte)
  private def putI32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
  }

  private def fixedLen(t: ColType): Int = t match {
    case CLong => 4
    case CDouble | CMoney | CDate => 8
    case CGuid => 16
    case CNumeric(_, _) => 17
    case CFixedText(n) => n
    case CBool => 0 // value lives in the null mask
    case CText | CMemo | CBinary | COle => 0
  }
  private def typeCode(t: ColType): Int = t match {
    case CBool => 0x01
    case CLong => 0x04
    case CMoney => 0x05
    case CDouble => 0x07
    case CDate => 0x08
    case CBinary => 0x09
    case CText | CFixedText(_) => 0x0a
    case COle => 0x0b
    case CMemo => 0x0c
    case CGuid => 0x0f
    case CNumeric(_, _) => 0x10
  }
  private def isVar(t: ColType): Boolean =
    t == CText || t == CMemo || t == CBinary || t == COle

  private def tdefPage(columns: Seq[(String, ColType)], numRows: Int): Array[Byte] = {
    val s = tdefStreamBytes(columns, numRows)
    require(s.length == PageSize, "this table definition needs tdefPagesOf")
    s
  }

  /** The logical TDEF stream: page-one layout in full, continuing past
    * PageSize when the descriptors + UTF-16 names of a wide table spill
    * over; [[tdefPagesOf]] splits the tail across continuation pages
    * (8-byte page headers, chained via the offset-4 next pointer) the
    * way real Jet4/ACE files store ~90+-column tables.
    */
  private def tdefStreamBytes(
      columns: Seq[(String, ColType)], numRows: Int): Array[Byte] = {
    val sz = 0x3f + 25 * columns.length +
      columns.map(_._1.getBytes("UTF-16LE").length + 2).sum
    val p = new Array[Byte](math.max(PageSize, sz))
    p(0) = 0x02; p(1) = 0x01
    putI32(p, 4, 0) // next TDEF page; patched by tdefPagesOf when chained
    putI32(p, 0x10, numRows)
    val varCols = columns.filter(c => isVar(c._2))
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
      putU16(p, o + 7, if (isVar(t)) { val v = varIdx; varIdx += 1; v } else 0xffff)
      putU16(p, o + 9, i)
      t match { // NUMERIC precision/scale live at descriptor bytes 11/12
        case CNumeric(prec, scale) =>
          p(o + 11) = prec.toByte; p(o + 12) = scale.toByte
        case _ => ()
      }
      p(o + 15) = (if (isVar(t)) 0x02 else 0x03).toByte // bit 0: fixed
      putU16(p, o + 21, if (isVar(t)) 0 else { val f = fixedOff; fixedOff += fixedLen(t); f })
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
    if (sz <= PageSize) java.util.Arrays.copyOf(p, PageSize)
    else java.util.Arrays.copyOf(p, sz)
  }

  /** Split a logical TDEF stream into its page chain: the first page
    * as-is, overflow in (PageSize−8)-byte chunks on continuation pages
    * numbered from `contStart`, linked through the offset-4 pointer.
    */
  private def tdefPagesOf(stream: Array[Byte], contStart: Int): Seq[Array[Byte]] = {
    if (stream.length <= PageSize) Seq(java.util.Arrays.copyOf(stream, PageSize))
    else {
      val first = java.util.Arrays.copyOf(stream, PageSize)
      val chunks = stream.drop(PageSize).grouped(PageSize - 8).toSeq
      val conts = chunks.zipWithIndex.map { case (ch, i) =>
        val pg = new Array[Byte](PageSize)
        pg(0) = 0x02; pg(1) = 0x01
        putI32(pg, 4, if (i == chunks.length - 1) 0 else contStart + i + 1)
        System.arraycopy(ch, 0, pg, 8, ch.length)
        pg
      }
      putI32(first, 4, contStart)
      first +: conts
    }
  }

  private def hexBytes(s: String): Array[Byte] = {
    require(s.length % 2 == 0, s"odd-length hex: $s")
    Array.tabulate(s.length / 2)(i =>
      Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte)
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
      compressText: Boolean, memo: Map[Int, Array[Byte]]): Array[Byte] = {
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
          v.foreach(s => putI64(b, 0, java.lang.Double.doubleToLongBits(s.toDouble)))
          fixed.write(b); if (v.isDefined) setNotNull(i)
        case CMoney =>
          val b = new Array[Byte](8)
          v.foreach(s => putI64(b, 0,
            new java.math.BigDecimal(s).setScale(4).unscaledValue().longValueExact()))
          fixed.write(b); if (v.isDefined) setNotNull(i)
        case CDate =>
          val b = new Array[Byte](8)
          v.foreach { s =>
            val dt =
              if (s.contains(' ')) java.time.LocalDateTime.parse(s.replace(' ', 'T'))
              else java.time.LocalDate.parse(s).atStartOfDay
            val days = java.time.temporal.ChronoUnit.DAYS
              .between(java.time.LocalDate.of(1899, 12, 30), dt.toLocalDate).toDouble +
              dt.toLocalTime.toSecondOfDay / 86400.0
            putI64(b, 0, java.lang.Double.doubleToLongBits(days))
          }
          fixed.write(b); if (v.isDefined) setNotNull(i)
        case CGuid =>
          val b = new Array[Byte](16)
          v.foreach { s =>
            val g = s.stripPrefix("{").stripSuffix("}").split("-")
            require(g.length == 5, s"bad guid: $s")
            putI32(b, 0, java.lang.Long.parseLong(g(0), 16).toInt)
            putU16(b, 4, Integer.parseInt(g(1), 16))
            putU16(b, 6, Integer.parseInt(g(2), 16))
            (0 until 2).foreach(k =>
              b(8 + k) = Integer.parseInt(g(3).substring(2 * k, 2 * k + 2), 16).toByte)
            (0 until 6).foreach(k =>
              b(10 + k) = Integer.parseInt(g(4).substring(2 * k, 2 * k + 2), 16).toByte)
          }
          fixed.write(b); if (v.isDefined) setNotNull(i)
        case CFixedText(len) =>
          val b = new Array[Byte](len)
          v.foreach { s =>
            val eb = s.getBytes("UTF-16LE")
            require(eb.length <= len, s"fixed text overflows $len bytes: $s")
            System.arraycopy(eb, 0, b, 0, eb.length)
          }
          fixed.write(b); if (v.isDefined) setNotNull(i)
        case CNumeric(_, scale) =>
          val b = new Array[Byte](17)
          v.foreach { s =>
            val dec = new java.math.BigDecimal(s).setScale(scale)
            if (dec.signum() < 0) b(0) = 0x80.toByte
            // big-endian; drop toByteArray's sign-guard leading zero
            val mag = dec.unscaledValue().abs().toByteArray.dropWhile(_ == 0)
            require(mag.length <= 16, s"numeric overflows 16 bytes: $s")
            System.arraycopy(mag, 0, b, 17 - mag.length, mag.length)
          }
          fixed.write(b); if (v.isDefined) setNotNull(i)
        case CBool => if (v.exists(s => s == "1" || s.equalsIgnoreCase("true"))) setNotNull(i)
        case CText | CMemo | CBinary | COle => if (v.isDefined) setNotNull(i)
      }
    }
    val varCols = columns.zipWithIndex.filter(c => isVar(c._1._2))
    val varData = new ByteArrayOutputStream()
    val fixedBytes = fixed.toByteArray
    val varBase = 2 + fixedBytes.length
    val offsets = ArrayBuffer(varBase)
    varCols.foreach { case ((_, t), i) =>
      values(i).foreach { s =>
        varData.write(t match {
          case CMemo | COle => memo(i)
          case CBinary => hexBytes(s)
          case _ => encodeText(s, compressText)
        })
      }
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
      compressText: Boolean,
      memoPlan: Seq[Map[Int, Array[Byte]]]): Seq[Array[Byte]] = {
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
    rows.zipWithIndex.foreach { case (values, ri) =>
      val r = encodeRow(columns, values, compressText, memoPlan(ri))
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
