package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.io.{FileInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.parsers.DocumentBuilderFactory

/** Minimal dependency-free XLSX (OOXML) pull/push — the reference's xlsx
  * format plugins (/root/reference/pybabe/format_xlsx.py:16-33 read,
  * 36-46 write; xls read format_xls.py:10-26 is covered by this xlsx path,
  * documented as the modern container).
  *
  * xlsx is a zip of XML parts; this implements the subset the reference
  * uses: one worksheet, first row = field names, inline or shared strings,
  * numbers. Driver-side by design — spreadsheets are a small-data exchange
  * format (goldens, mail attachments); bulk data belongs in parquet/csv.
  */
object Xlsx {

  private def colRef(i: Int): String = {
    var n = i; var s = ""
    do { s = ('A' + n % 26).toChar.toString + s; n = n / 26 - 1 } while (n >= 0)
    s
  }

  /** 0-based column index from a cell reference like "C5" (inverse of
    * colRef; the row digits are ignored).
    */
  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((acc, ch) =>
      acc * 26 + (ch.toUpper - 'A' + 1)) - 1

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Write a (small, collected) DataFrame as a one-sheet xlsx file. */
  def write(df: DataFrame, path: String): Unit = {
    val rows = df.columns.toSeq +: df.collect().toSeq.map(_.toSeq.map {
      case null => ""
      case v    => v.toString
    })
    val sheet = {
      val sb = new StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      rows.zipWithIndex.foreach { case (cells, r) =>
        sb.append(s"""<row r="${r + 1}">""")
        cells.zipWithIndex.foreach { case (v, c) =>
          sb.append(s"""<c r="${colRef(c)}${r + 1}" t="inlineStr"><is><t xml:space="preserve">${escape(v.toString)}</t></is></c>""")
        }
        sb.append("</row>")
      }
      sb.append("</sheetData></worksheet>")
      sb.toString
    }
    val parts = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""",
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""",
      "xl/workbook.xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""",
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""",
      "xl/worksheets/sheet1.xml" -> sheet)
    val zos = new ZipOutputStream(new FileOutputStream(path))
    try parts.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
  }

  /** Read a one-sheet xlsx into a string DataFrame; first row = field names
    * (reference format_xlsx.py:16-33, incl. stop at first all-empty row).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    var sheetXml: Array[Byte] = null
    var sharedXml: Array[Byte] = null
    val zin = new ZipInputStream(new FileInputStream(path))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName.matches("xl/worksheets/sheet1\\.xml")) sheetXml = zin.readAllBytes()
        else if (e.getName == "xl/sharedStrings.xml") sharedXml = zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    require(sheetXml != null, s"xlsx: no sheet1 in $path")

    def parse(bytes: Array[Byte]) = {
      val f = DocumentBuilderFactory.newInstance()
      f.setNamespaceAware(false)
      f.newDocumentBuilder().parse(new java.io.ByteArrayInputStream(bytes))
    }
    val shared: IndexedSeq[String] = if (sharedXml == null) IndexedSeq.empty else {
      val doc = parse(sharedXml)
      val sis = doc.getElementsByTagName("si")
      (0 until sis.getLength).map(i => sis.item(i).getTextContent)
    }
    val doc = parse(sheetXml)
    val rowNodes = doc.getElementsByTagName("row")
    val rows: Seq[Seq[String]] = (0 until rowNodes.getLength).map { r =>
      val row = rowNodes.item(r).asInstanceOf[org.w3c.dom.Element]
      val cells = row.getElementsByTagName("c")
      // Writers (Excel included) omit empty cells entirely, so values are
      // placed by each cell's `r` column letters, padding gaps with "";
      // cells without an `r` attribute fall back to the next position.
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      var next = 0
      (0 until cells.getLength).foreach { c =>
        val cell = cells.item(c).asInstanceOf[org.w3c.dom.Element]
        val t = cell.getAttribute("t")
        val text = cell.getTextContent
        val value = if (t == "s") shared(text.trim.toInt) else text
        val ref = cell.getAttribute("r")
        val idx = if (ref != null && ref.exists(_.isLetter)) colIndex(ref) else next
        while (buf.length < idx) buf += ""
        if (buf.length == idx) buf += value else buf(idx) = value
        next = idx + 1
      }
      buf.toSeq
    }.takeWhile(_.exists(_.nonEmpty)) // stop at first all-empty row
    require(rows.nonEmpty, s"xlsx: empty sheet in $path")
    val header = rows.head.map(graft.operators.KeyNormalize(_))
    val data = rows.tail.map(r => r.padTo(header.length, ""))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      data.map(r => org.apache.spark.sql.Row.fromSeq(r)).asJava,
      org.apache.spark.sql.types.StructType(header.map(h =>
        org.apache.spark.sql.types.StructField(h, org.apache.spark.sql.types.StringType))))
  }
}
