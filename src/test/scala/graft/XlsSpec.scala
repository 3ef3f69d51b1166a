package graft

import graft.sinks.Xls

/** Legacy BIFF8 .xls read — reference format_xls.py:10-26. No xls writer
  * exists in this environment (xlrd/xlwt are absent and the reference ships
  * only an xlsx fixture), so the fixture is hand-built from the public
  * [MS-CFB] + [MS-XLS] layouts: an OLE2 container whose Workbook stream
  * lives in the MINISTREAM (streams < 4096 bytes — the layout real small
  * .xls files use), with SST/LABELSST, inline LABEL, NUMBER, RK and MULRK
  * cell records.
  */
class XlsSpec extends SparkSpec {

  private def le16(out: Array[Byte], i: Int, v: Int): Unit = {
    out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
  }
  private def le32(out: Array[Byte], i: Int, v: Int): Unit = {
    out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
    out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
  }

  private def rec(typ: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](4 + payload.length)
    le16(out, 0, typ); le16(out, 2, payload.length)
    payload.copyToArray(out, 4)
    out
  }
  private def compressedStr(s: String): Array[Byte] = {
    val out = new Array[Byte](3 + s.length)
    le16(out, 0, s.length); out(2) = 0
    s.getBytes("ISO-8859-1").copyToArray(out, 3)
    out
  }

  /** BIFF8 workbook stream: globals (BOF, BOUNDSHEET, SST, EOF) + sheet. */
  private def makeWorkbookStream(sstStrings: Seq[String],
                                 sheet: Array[Byte]): Array[Byte] = {
    val bofG = { val p = new Array[Byte](16); le16(p, 0, 0x0600); le16(p, 2, 0x0005); rec(0x0809, p) }
    val sstPayload = {
      val head = new Array[Byte](8)
      le32(head, 0, sstStrings.length); le32(head, 4, sstStrings.length)
      head ++ sstStrings.toArray.flatMap(compressedStr)
    }
    val sst = rec(0x00FC, sstPayload)
    val sheetName = "Sheet1"
    val bsPayload = new Array[Byte](8 + sheetName.length)
    // lbPlyPos patched below once the globals length is known
    le16(bsPayload, 4, 0); bsPayload(6) = sheetName.length.toByte; bsPayload(7) = 0
    sheetName.getBytes("ISO-8859-1").copyToArray(bsPayload, 8)
    val boundsheet = rec(0x0085, bsPayload)
    val eof = rec(0x000A, Array.emptyByteArray)
    val globalsLen = bofG.length + boundsheet.length + sst.length + eof.length
    le32(boundsheet, 4, globalsLen) // sheet BOF follows the globals
    bofG ++ boundsheet ++ sst ++ eof ++ sheet
  }

  private def labelSst(row: Int, col: Int, isst: Int): Array[Byte] = {
    val p = new Array[Byte](10)
    le16(p, 0, row); le16(p, 2, col); le32(p, 6, isst)
    rec(0x00FD, p)
  }
  private def rkCell(row: Int, col: Int, intVal: Int): Array[Byte] = {
    val p = new Array[Byte](10)
    le16(p, 0, row); le16(p, 2, col); le32(p, 6, (intVal << 2) | 0x02)
    rec(0x027E, p)
  }
  private def numberCell(row: Int, col: Int, d: Double): Array[Byte] = {
    val p = new Array[Byte](14)
    le16(p, 0, row); le16(p, 2, col)
    val bits = java.lang.Double.doubleToLongBits(d)
    (0 until 8).foreach(k => p(6 + k) = ((bits >> (8 * k)) & 0xFF).toByte)
    rec(0x0203, p)
  }

  /** OLE2 container with the stream in the ministream (size < 4096). */
  private def makeCfb(stream: Array[Byte], streamName: String = "Workbook"): Array[Byte] = {
    val ssz = 512; val msz = 64
    val nMini = (stream.length + msz - 1) / msz
    val miniBytes = nMini * msz
    val nMiniSectors = (miniBytes + ssz - 1) / ssz
    val out = new Array[Byte]((1 + 3 + nMiniSectors) * ssz)
    // header
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).zipWithIndex
      .foreach { case (v, i) => out(i) = v.toByte }
    le16(out, 24, 0x3E); le16(out, 26, 3); le16(out, 28, 0xFFFE)
    le16(out, 30, 9); le16(out, 32, 6)
    le32(out, 44, 1)            // one FAT sector
    le32(out, 48, 1)            // directory at sector 1
    le32(out, 56, 4096)         // ministream cutoff
    le32(out, 60, 2)            // miniFAT at sector 2
    le32(out, 64, 1)
    le32(out, 68, 0xFFFFFFFE)   // no DIFAT sectors
    le32(out, 76, 0)            // DIFAT[0] -> FAT sector 0
    (1 until 109).foreach(i => le32(out, 76 + 4 * i, 0xFFFFFFFF))
    // FAT (sector 0)
    val fatOff = 512
    le32(out, fatOff, 0xFFFFFFFD)       // sector 0 = FAT itself
    le32(out, fatOff + 4, 0xFFFFFFFE)   // directory chain ends
    le32(out, fatOff + 8, 0xFFFFFFFE)   // miniFAT chain ends
    (0 until nMiniSectors).foreach { k =>
      le32(out, fatOff + 12 + 4 * k, if (k == nMiniSectors - 1) 0xFFFFFFFE else 4 + k)
    }
    ((3 + nMiniSectors) until ssz / 4).foreach(k => le32(out, fatOff + 4 * k, 0xFFFFFFFF))
    // directory (sector 1): Root + Workbook
    val dirOff = 512 + ssz
    def dirEntry(idx: Int, name: String, objType: Int, child: Int, start: Int, size: Int): Unit = {
      val o = dirOff + idx * 128
      val utf16 = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      utf16.copyToArray(out, o)
      le16(out, o + 64, utf16.length + 2)
      out(o + 66) = objType.toByte; out(o + 67) = 1
      le32(out, o + 68, 0xFFFFFFFF); le32(out, o + 72, 0xFFFFFFFF); le32(out, o + 76, child)
      le32(out, o + 116, start); le32(out, o + 120, size)
    }
    dirEntry(0, "Root Entry", 5, 1, 3, miniBytes)
    dirEntry(1, streamName, 2, 0xFFFFFFFF, 0, stream.length)
    // miniFAT (sector 2)
    val mfOff = 512 + 2 * ssz
    (0 until nMini).foreach(k => le32(out, mfOff + 4 * k, if (k == nMini - 1) 0xFFFFFFFE else k + 1))
    (nMini until ssz / 4).foreach(k => le32(out, mfOff + 4 * k, 0xFFFFFFFF))
    // ministream (sectors 3..)
    stream.copyToArray(out, 512 + 3 * ssz)
    out
  }

  test("reads a BIFF8 xls from the ministream: SST, RK, NUMBER, sparse row") {
    val sheet =
      rec(0x0809, { val p = new Array[Byte](16); le16(p, 0, 0x0600); le16(p, 2, 0x0010); p }) ++
        labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ labelSst(0, 2, 2) ++ // header a,b,c
        labelSst(1, 0, 3) ++ rkCell(1, 1, 42) ++ numberCell(1, 2, 1.5) ++
        labelSst(2, 0, 4) ++ numberCell(2, 2, 7) ++                    // sparse: b empty
        rec(0x000A, Array.emptyByteArray)
    val xls = makeCfb(makeWorkbookStream(Seq("a", "b", "c", "x", "y"), sheet))
    val path = tmp("xls") + "/legacy.xls"
    java.nio.file.Files.write(java.nio.file.Paths.get(path), xls)
    val df = Xls.read(spark, path)
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    assert(df.orderBy("a").collect().map(_.toSeq).toSeq ==
      Seq(Seq("x", "42", "1.5"), Seq("y", "", "7")))
  }

  test("SST spanning CONTINUE records: between-string and mid-string splits") {
    // five strings; record boundary falls between strings 2|3 and INSIDE
    // string 4 (whose continuation re-states the option-flags byte)
    def be(v: Int) = { val a = new Array[Byte](4); le32(a, 0, v); a }
    val sstHead = be(5) ++ be(5) // cstTotal, cstUnique
    val part1 = sstHead ++ compressedStr("alpha") ++ compressedStr("beta")
    val deltaHeader = { val a = new Array[Byte](3); le16(a, 0, 10); a(2) = 0; a } // cch=10, compressed
    val cont1 = compressedStr("gamma") ++ deltaHeader ++ "del".getBytes("ISO-8859-1")
    val cont2 = Array[Byte](0) ++ "phinium".getBytes("ISO-8859-1") ++ compressedStr("eps")
    val sstRecords = rec(0x00FC, part1) ++ rec(0x003C, cont1) ++ rec(0x003C, cont2)

    val bofG = { val p = new Array[Byte](16); le16(p, 0, 0x0600); le16(p, 2, 0x0005); rec(0x0809, p) }
    val sheetName = "Sheet1"
    val bsPayload = new Array[Byte](8 + sheetName.length)
    bsPayload(6) = sheetName.length.toByte
    sheetName.getBytes("ISO-8859-1").copyToArray(bsPayload, 8)
    val boundsheet = rec(0x0085, bsPayload)
    val eof = rec(0x000A, Array.emptyByteArray)
    val globalsLen = bofG.length + boundsheet.length + sstRecords.length + eof.length
    le32(boundsheet, 4, globalsLen)
    val sheet =
      rec(0x0809, { val p = new Array[Byte](16); le16(p, 0, 0x0600); le16(p, 2, 0x0010); p }) ++
        labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ labelSst(0, 2, 2) ++
        labelSst(1, 0, 3) ++ labelSst(1, 1, 4) ++ rkCell(1, 2, 7) ++
        rec(0x000A, Array.emptyByteArray)
    val xls = makeCfb(bofG ++ boundsheet ++ sstRecords ++ eof ++ sheet)
    val path = tmp("xls_cont") + "/cont.xls"
    java.nio.file.Files.write(java.nio.file.Paths.get(path), xls)
    val df = Xls.read(spark, path)
    assert(df.columns.toSeq == Seq("alpha", "beta", "gamma"))
    assert(df.collect().map(_.toSeq).toSeq == Seq(Seq("delphinium", "eps", "7")))
  }

  test("reads a BIFF5 xls: 'Book' stream, inline byte-string labels, RSTRING") {
    def label5(row: Int, col: Int, s: String): Array[Byte] = {
      val bytes = s.getBytes("windows-1252")
      val p = new Array[Byte](8 + bytes.length)
      le16(p, 0, row); le16(p, 2, col); le16(p, 6, bytes.length)
      bytes.copyToArray(p, 8)
      rec(0x0204, p)
    }
    def rstring5(row: Int, col: Int, s: String): Array[Byte] = {
      val bytes = s.getBytes("windows-1252")
      // trailing format-run block (count + runs) must be skipped by length
      val p = new Array[Byte](8 + bytes.length + 3)
      le16(p, 0, row); le16(p, 2, col); le16(p, 6, bytes.length)
      bytes.copyToArray(p, 8)
      p(8 + bytes.length) = 1; p(9 + bytes.length) = 0; p(10 + bytes.length) = 0
      rec(0x00D6, p)
    }
    val bofG5 = { val p = new Array[Byte](8); le16(p, 0, 0x0500); le16(p, 2, 0x0005); rec(0x0809, p) }
    val sheetName = "Sheet1"
    val bsPayload = new Array[Byte](7 + sheetName.length)
    bsPayload(6) = sheetName.length.toByte
    sheetName.getBytes("ISO-8859-1").copyToArray(bsPayload, 7)
    val boundsheet = rec(0x0085, bsPayload)
    val eof = rec(0x000A, Array.emptyByteArray)
    val globalsLen = bofG5.length + boundsheet.length + eof.length
    le32(boundsheet, 4, globalsLen)
    val sheet =
      rec(0x0809, { val p = new Array[Byte](8); le16(p, 0, 0x0500); le16(p, 2, 0x0010); p }) ++
        label5(0, 0, "name") ++ label5(0, 1, "qty") ++ label5(0, 2, "note") ++
        label5(1, 0, "café") ++ rkCell(1, 1, 42) ++ rstring5(1, 2, "styled") ++
        label5(2, 0, "plain") ++ numberCell(2, 1, 2.5) ++
        rec(0x000A, Array.emptyByteArray)
    val xls = makeCfb(bofG5 ++ boundsheet ++ eof ++ sheet, streamName = "Book")
    val path = tmp("xls5") + "/legacy5.xls"
    java.nio.file.Files.write(java.nio.file.Paths.get(path), xls)
    val df = Xls.read(spark, path)
    assert(df.columns.toSeq == Seq("name", "qty", "note"))
    assert(df.orderBy("name").collect().map(_.toSeq).toSeq ==
      Seq(Seq("café", "42", "styled"), Seq("plain", "2.5", "")))
  }

  test("xls Pull dispatch routes .xls to the BIFF reader") {
    val sheet =
      rec(0x0809, { val p = new Array[Byte](16); le16(p, 0, 0x0600); le16(p, 2, 0x0010); p }) ++
        labelSst(0, 0, 0) ++ labelSst(1, 0, 1) ++
        rec(0x000A, Array.emptyByteArray)
    val xls = makeCfb(makeWorkbookStream(Seq("k", "v1"), sheet))
    val path = tmp("xls_pull") + "/t.xls"
    java.nio.file.Files.write(java.nio.file.Paths.get(path), xls)
    val df = graft.sources.Pull(spark, path)
    assert(df.columns.toSeq == Seq("k"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("v1"))
  }
}
