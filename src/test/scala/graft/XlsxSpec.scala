package graft

import graft.sinks.Xlsx

/** xlsx push/pull — reference format_xlsx.py; round-trip + the reference's
  * own binary fixture (tests/test.xlsx: openpyxl-written, shared strings).
  */
class XlsxSpec extends SparkSpec {
  import spark.implicits._

  test("xlsx write -> read round-trip") {
    val path = tmp("xlsx") + "/out.xlsx"
    val df = Seq(("1", "a,b", "x<y"), ("2", "", "z")).toDF("k", "v", "w")
    Xlsx.write(df, path)
    val back = Xlsx.read(spark, path)
    assert(back.columns.toSeq == Seq("k", "v", "w"))
    assert(back.orderBy("k").collect().map(_.toSeq).toSeq ==
      Seq(Seq("1", "a,b", "x<y"), Seq("2", "", "z")))
  }

  test("sparse rows map cells by their r reference, not position") {
    // Excel omits empty cells: row 2 has only A2 and C2 — the value "right"
    // must land in the third column, with the middle column empty.
    val dir = tmp("xlsx_sparse")
    val path = s"$dir/sparse.xlsx"
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="inlineStr"><is><t>a</t></is></c>""" +
        """<c r="B1" t="inlineStr"><is><t>b</t></is></c>""" +
        """<c r="C1" t="inlineStr"><is><t>c</t></is></c></row>""" +
        """<row r="2"><c r="A2" t="inlineStr"><is><t>left</t></is></c>""" +
        """<c r="C2" t="inlineStr"><is><t>right</t></is></c></row>""" +
        """</sheetData></worksheet>"""
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    try {
      zos.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
      zos.write(sheet.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
    val df = Xlsx.read(spark, path)
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    assert(df.collect().map(_.toSeq).toSeq == Seq(Seq("left", "", "right")))
  }

  test("xlsx writer verified by an INDEPENDENT reader (javax DOM) over sf0.001 data") {
    // The round-trip test shares one implementation on both sides, so a
    // symmetric escaping/reference bug would cancel out. This reads the
    // written OOXML back with the JDK's own zip + namespace-aware DOM
    // parser — a fully independent implementation — over real generated
    // data (orders at sf0.001), not a hand fixture, and cross-checks all
    // three: source rows == DOM grid == Xlsx.read grid.
    val src = "/root/testdata/sf0.001/orders.parquet"
    assume(new java.io.File(src).exists())
    val df = spark.read.parquet(src)
      .orderBy("o_orderkey").limit(25)
      .selectExpr("CAST(o_orderkey AS STRING) AS o_orderkey",
        "o_orderstatus",
        // derived column forces the escaping path on every row
        "concat(o_orderpriority, ' <&\"> ', o_orderstatus) AS mix")
    val expected = df.collect().map(_.toSeq.map(String.valueOf)).toSeq
    val path = tmp("xlsx_indep") + "/orders.xlsx"
    Xlsx.write(df, path)
    // independent read: JDK zip + javax.xml DOM (not Xlsx.read's scanner)
    val zf = new java.util.zip.ZipFile(path)
    val grid: Seq[Seq[String]] =
      try {
        val entry = zf.getEntry("xl/worksheets/sheet1.xml")
        val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        dbf.setNamespaceAware(true)
        val doc = dbf.newDocumentBuilder().parse(zf.getInputStream(entry))
        val rows = doc.getElementsByTagNameNS("*", "row")
        (0 until rows.getLength).map { r =>
          val cells = rows.item(r).asInstanceOf[org.w3c.dom.Element]
            .getElementsByTagNameNS("*", "c")
          (0 until cells.getLength).map { c =>
            val el = cells.item(c).asInstanceOf[org.w3c.dom.Element]
            // independent column mapping from the cell's r= reference
            val ref = el.getAttribute("r").takeWhile(_.isLetter)
            val idx = ref.foldLeft(0)((a, ch) => a * 26 + (ch - 'A' + 1)) - 1
            assert(idx == c, s"cell $ref not dense at row ${r + 1}")
            el.getTextContent
          }
        }
      } finally zf.close()
    assert(grid.head == df.columns.toSeq)
    assert(grid.tail == expected, "DOM grid != source rows")
    // and the engine's own reader agrees with the independent one
    val back = Xlsx.read(spark, path).collect().map(_.toSeq.map(String.valueOf)).toSeq
    assert(back.toSet == expected.toSet, "Xlsx.read != DOM grid")
  }

  test("reads the reference's own openpyxl fixture (tests/test.xlsx)") {
    val fixture = "/root/reference/tests/test.xlsx"
    assume(new java.io.File(fixture).exists())
    val df = Xlsx.read(spark, fixture)
    // reference fixture: same content as tests/test.csv (foo/bar/f/d header)
    assert(df.columns.nonEmpty && df.count() > 0)
  }
}
