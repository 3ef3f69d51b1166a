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

  test("reads the reference's own openpyxl fixture (tests/test.xlsx)") {
    val fixture = "/root/reference/tests/test.xlsx"
    assume(new java.io.File(fixture).exists())
    val df = Xlsx.read(spark, fixture)
    // reference fixture: same content as tests/test.csv (foo/bar/f/d header)
    assert(df.columns.nonEmpty && df.count() > 0)
  }
}
