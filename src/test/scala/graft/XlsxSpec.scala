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

  test("reads the reference's own openpyxl fixture (tests/test.xlsx)") {
    val fixture = "/root/reference/tests/test.xlsx"
    assume(new java.io.File(fixture).exists())
    val df = Xlsx.read(spark, fixture)
    // reference fixture: same content as tests/test.csv (foo/bar/f/d header)
    assert(df.columns.nonEmpty && df.count() > 0)
  }
}
