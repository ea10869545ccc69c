package graft.ingest

import java.io.ByteArrayOutputStream

import scala.collection.mutable.ArrayBuffer

/** Minimal BIFF8 .xls writer (hand-built OLE2 + BIFF records) — exists
  * so the legacy-Excel read path can be exercised end-to-end offline:
  * tests and the verify gate generate a real .xls, then read it back
  * through [[XlsReader]]. Not a product feature (the reference only
  * READS Excel). Deliberately exercises the format's sharp edges:
  * shared strings (SST) with an optional CONTINUE split mid-string,
  * compressed and UTF-16 strings, RK and full-double numerics, and both
  * OLE2 stream layouts (mini-FAT for < 4096-byte workbooks, regular FAT
  * above).
  */
object BiffFixture {

  private final class Buf {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): this.type = { out.write(v & 0xff); this }
    def u16(v: Int): this.type = { u8(v); u8(v >> 8); this }
    def i32(v: Int): this.type = { u16(v); u16(v >> 16); this }
    def bytes(b: Array[Byte]): this.type = { out.write(b); this }
    def record(id: Int, data: Array[Byte]): this.type = {
      u16(id); u16(data.length); bytes(data); this
    }
    def result: Array[Byte] = out.toByteArray
    def size: Int = out.size()
  }

  private def strBytes(s: String, forceUtf16: Boolean = false): (Array[Byte], Boolean) = {
    val high = forceUtf16 || s.exists(_ > 0xFF)
    val b =
      if (high) s.getBytes("UTF-16LE")
      else s.map(_.toByte).toArray
    (b, high)
  }

  /** Write rows (first row = headers) as the first sheet. All cells
    * become SST strings except numeric-looking cells, which exercise the
    * NUMBER/RK records (they read back identically through the string
    * rendering). `splitSst` forces a CONTINUE boundary inside the first
    * SST string's character data — the format's classic trap.
    */
  def writeXls(
      path: String,
      rows: Seq[Seq[String]],
      splitSst: Boolean = false): Unit = {
    // ---- partition cells into strings (SST) and numbers
    val sstStrings = ArrayBuffer.empty[String]
    val sstIndex = scala.collection.mutable.HashMap.empty[String, Int]
    def sstOf(s: String): Int =
      sstIndex.getOrElseUpdate(s, { sstStrings += s; sstStrings.length - 1 })
    def numeric(s: String): Option[Double] =
      // exercise numeric records only for cells whose rendered readback
      // is byte-identical to the input: no leading zeros, no trailing
      // fraction zeros (the reader renders "3.0" as "3"), no "-0"
      if (s.matches("-?(0|[1-9]\\d*)(\\.\\d*[1-9])?") && s != "-0" && s.length < 15)
        s.toDoubleOption
      else None
    case class Cell(row: Int, col: Int, v: Either[Int, Double])
    val cells = rows.zipWithIndex.flatMap { case (r, ri) =>
      r.zipWithIndex.map { case (v, ci) =>
        Cell(ri, ci, numeric(v).filter(_ => ri > 0).map(Right(_)).getOrElse(Left(sstOf(v))))
      }
    }

    // ---- globals substream (assembled twice: BOUNDSHEET needs the
    // absolute sheet offset, which depends on the globals' own length)
    def globals(sheetPos: Int): Array[Byte] = {
      val g = new Buf
      g.record(0x0809, new Buf().u16(0x0600).u16(0x0005).u16(0).u16(0)
        .i32(0).i32(0).result) // BOF: BIFF8, globals
      // SST: total = unique here; strings as XLUnicodeRichExtendedString.
      // With splitSst, string 0's character data is cut mid-way and the
      // remainder — plus EVERY subsequent string — lives in a CONTINUE
      // record that restarts with its own flags byte (UTF-16 there, to
      // also exercise a compressed→uncompressed switch at the boundary).
      val sstBody = new Buf().i32(sstStrings.length).i32(sstStrings.length)
      var cont: Buf = null // once the split happens, all bytes go here
      sstStrings.zipWithIndex.foreach { case (s, i) =>
        if (splitSst && i == 0 && s.length >= 2) {
          val splitAt = s.length / 2
          val high = s.exists(_ > 0xFF)
          val (h1, _) = strBytes(s.take(splitAt), forceUtf16 = high)
          val (h2, _) = strBytes(s.drop(splitAt), forceUtf16 = true)
          sstBody.u16(s.length).u8(if (high) 1 else 0).bytes(h1)
          cont = new Buf().u8(1).bytes(h2) // continuation flags byte
        } else {
          val (chars, high) = strBytes(s)
          val sink = if (cont != null) cont else sstBody
          sink.u16(s.length).u8(if (high) 1 else 0).bytes(chars)
        }
      }
      g.record(0x00FC, sstBody.result)
      if (cont != null) g.record(0x003C, cont.result)
      // BOUNDSHEET: absolute stream position of the sheet BOF
      val (nameB, nameHigh) = strBytes("Sheet1")
      g.record(0x0085, new Buf().i32(sheetPos).u16(0)
        .u8("Sheet1".length).u8(if (nameHigh) 1 else 0).bytes(nameB).result)
      g.record(0x000A, Array.emptyByteArray) // EOF
      g.result
    }

    // ---- worksheet substream
    val sheet = {
      val s = new Buf
      s.record(0x0809, new Buf().u16(0x0600).u16(0x0010).u16(0).u16(0)
        .i32(0).i32(0).result) // BOF: worksheet
      cells.foreach {
        case Cell(r, c, Left(idx)) =>
          s.record(0x00FD, new Buf().u16(r).u16(c).u16(0).i32(idx).result)
        case Cell(r, c, Right(d)) =>
          val asInt = d == math.rint(d) && math.abs(d) < (1 << 29)
          if (asInt) // RK integer encoding
            s.record(0x027E, new Buf().u16(r).u16(c).u16(0)
              .i32((d.toInt << 2) | 2).result)
          else { // full IEEE double NUMBER record
            val bits = java.lang.Double.doubleToLongBits(d)
            s.record(0x0203, new Buf().u16(r).u16(c).u16(0)
              .i32(bits.toInt).i32((bits >>> 32).toInt).result)
          }
      }
      s.record(0x000A, Array.emptyByteArray)
      s.result
    }

    val globalsLen = globals(0).length // layout-stable: offset field is fixed i32
    val workbook = new Buf().bytes(globals(globalsLen)).bytes(sheet).result
    writeOle2(path, workbook)
  }

  /** Wrap a Workbook stream into a minimal OLE2 compound file. Streams
    * under 4096 bytes go through the mini-FAT/ministream path (as real
    * writers do); larger ones use the regular FAT.
    */
  private def writeOle2(path: String, workbook: Array[Byte]): Unit = {
    val sectorSize = 512
    val mini = workbook.length < 4096
    def pad(b: Array[Byte], unit: Int): Array[Byte] = {
      val n = ((b.length + unit - 1) / unit) * unit
      java.util.Arrays.copyOf(b, math.max(n, unit))
    }

    // sector plan (regular sectors, in order):
    //   [FAT] [directory] then either [ministream sectors + miniFAT]
    //   or [workbook sectors]
    val dirSectorId = 1
    val afterDir = 2
    val (payloadSectors, miniFatSectorId, ministreamStart, wbStartMini) =
      if (mini) {
        val ministream = pad(workbook, 64)
        val msSectors = ministream.length / sectorSize +
          (if (ministream.length % sectorSize == 0) 0 else 1)
        (msSectors + 1, afterDir + msSectors, afterDir, 0)
      } else {
        val wbPadded = pad(workbook, sectorSize)
        (wbPadded.length / sectorSize, -1, afterDir, -1)
      }
    val totalSectors = afterDir + payloadSectors

    // FAT (one sector: supports files up to 128 sectors ≈ 64 KB; fixture
    // scale only — require loudly otherwise)
    require(totalSectors <= sectorSize / 4, "fixture workbook too large for one FAT sector")
    val fat = Array.fill(sectorSize / 4)(0xFFFFFFFF)
    fat(0) = 0xFFFFFFFD // FAT sector marker
    fat(dirSectorId) = 0xFFFFFFFE // directory: single-sector chain
    if (mini) {
      val msSectors = payloadSectors - 1
      for (k <- 0 until msSectors)
        fat(afterDir + k) = if (k == msSectors - 1) 0xFFFFFFFE else afterDir + k + 1
      fat(miniFatSectorId) = 0xFFFFFFFE
    } else
      for (k <- 0 until payloadSectors)
        fat(afterDir + k) = if (k == payloadSectors - 1) 0xFFFFFFFE else afterDir + k + 1

    // miniFAT: workbook chain in 64-byte units
    val miniFat = Array.fill(sectorSize / 4)(0xFFFFFFFF)
    val nMiniSectors = if (mini) (pad(workbook, 64).length / 64) else 0
    if (mini) {
      require(nMiniSectors <= sectorSize / 4, "fixture ministream too large")
      for (k <- 0 until nMiniSectors)
        miniFat(k) = if (k == nMiniSectors - 1) 0xFFFFFFFE else k + 1
    }

    // directory: root + Workbook
    def dirEntry(name: String, typ: Int, start: Int, size: Int,
        color: Int = 1, child: Int = -1): Array[Byte] = {
      val b = new Buf
      val nameB = name.getBytes("UTF-16LE")
      b.bytes(java.util.Arrays.copyOf(nameB, 64))
      b.u16(nameB.length + 2) // incl. terminator
      b.u8(typ).u8(color)
      b.i32(-1).i32(-1).i32(child) // left/right sibling, child
      b.bytes(new Array[Byte](16)) // CLSID
      b.i32(0).i32(0).i32(0).i32(0).i32(0) // state, times
      b.i32(start).i32(size).i32(0)
      b.result
    }
    val ministreamBytes = if (mini) pad(workbook, 64) else Array.emptyByteArray
    val dir = new Buf()
      .bytes(dirEntry("Root Entry", 5,
        if (mini) ministreamStart else 0xFFFFFFFE,
        if (mini) ministreamBytes.length else 0, child = 1))
      .bytes(dirEntry("Workbook", 2,
        if (mini) wbStartMini else afterDir, workbook.length))
      .bytes(new Array[Byte](256)) // two free entries pad to one sector
      .result

    // header
    val h = new Buf
    h.bytes(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    h.bytes(new Array[Byte](16)) // CLSID
    h.u16(0x003E).u16(0x0003) // minor/major version
    h.u16(0xFFFE) // little-endian BOM
    h.u16(9).u16(6) // sector 512, mini 64
    h.bytes(new Array[Byte](6))
    h.i32(0) // directory sector count (v3: zero)
    h.i32(1) // FAT sectors
    h.i32(dirSectorId) // first directory sector
    h.i32(0) // transaction
    h.i32(4096) // mini cutoff
    h.i32(if (mini) miniFatSectorId else 0xFFFFFFFE) // first miniFAT sector
    h.i32(if (mini) 1 else 0) // miniFAT sector count
    h.i32(0xFFFFFFFE) // first DIFAT sector
    h.i32(0) // DIFAT sector count
    h.i32(0) // DIFAT[0] = FAT sector id 0
    for (_ <- 1 until 109) h.i32(0xFFFFFFFF)

    val out = new ByteArrayOutputStream()
    out.write(h.result)
    val fatBuf = new Buf; fat.foreach(fatBuf.i32); out.write(fatBuf.result)
    out.write(dir)
    if (mini) {
      out.write(pad(ministreamBytes, sectorSize))
      val mfBuf = new Buf; miniFat.foreach(mfBuf.i32); out.write(mfBuf.result)
    } else
      out.write(pad(workbook, sectorSize))
    java.nio.file.Files.write(java.nio.file.Paths.get(path), out.toByteArray)
  }
}
