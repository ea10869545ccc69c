package graft.ingest

import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal .xlsx writer (JDK zip + hand-built OOXML, inline strings
  * only) — exists so the Excel read path (S2) can be exercised
  * end-to-end offline: tests and the verify gate generate a workbook,
  * then read it back through [[ExcelReader]]. Not a product feature
  * (the reference only READS Excel).
  */
object ExcelFixture {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
      // XML 1.0 forbids most control chars even escaped — strip them so
      // a fixture carrying dirty data still produces a parseable workbook
      // (real Excel writers do the same)
      .filter(c => c == '\t' || c == '\n' || c == '\r' || c >= ' ')

  private def colName(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) {
      val r = (n - 1) % 26
      sb.insert(0, ('A' + r).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  /** Write rows (first row = headers) as Sheet1 of a minimal workbook.
    * A second junk sheet is included to prove first-sheet-only reads
    * (FIXTURES.md A4).
    */
  def writeXlsx(
      path: String,
      rows: Seq[Seq[String]],
      junkSecondSheet: Boolean = true): Unit = {
    def sheetXml(data: Seq[Seq[String]]): String = {
      val body = data.zipWithIndex.map { case (r, ri) =>
        val cells = r.zipWithIndex.map { case (v, ci) =>
          s"""<c r="${colName(ci)}${ri + 1}" t="inlineStr"><is><t>${esc(v)}</t></is></c>"""
        }.mkString
        s"""<row r="${ri + 1}">$cells</row>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>"""
    }
    val sheets =
      if (junkSecondSheet)
        Seq("sheet1.xml" -> sheetXml(rows),
          "sheet2.xml" -> sheetXml(Seq(Seq("junk"), Seq("ignored"))))
      else Seq("sheet1.xml" -> sheetXml(rows))
    val sheetRefs = sheets.indices.map { i =>
      s"""<sheet name="Sheet${i + 1}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>$sheetRefs</sheets></workbook>"""
    val rels = sheets.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
    }.mkString
    val wbRels =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels</Relationships>"""
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/></Types>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""

    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    try {
      def put(name: String, content: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes(StandardCharsets.UTF_8))
        zos.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", workbook)
      put("xl/_rels/workbook.xml.rels", wbRels)
      sheets.foreach { case (name, xml) => put(s"xl/worksheets/$name", xml) }
    } finally zos.close()
  }
}
