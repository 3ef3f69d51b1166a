package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal dependency-free legacy-BIFF8 `.xls` reader — the reference's xls
  * format plugin (/root/reference/pybabe/format_xls.py:10-26, which uses
  * xlrd: first sheet, first row = field names). Implements the subset a
  * data-exchange spreadsheet uses, per the public [MS-CFB] and [MS-XLS]
  * specs:
  *
  *  - OLE2 compound file: FAT chains, directory, miniFAT/ministream (streams
  *    under 4096 bytes — i.e. most real .xls files' Workbook stream);
  *  - BIFF8 records: BOF/EOF, BOUNDSHEET (first sheet), SST + LABELSST,
  *    LABEL, NUMBER, RK, MULRK, BLANK/MULBLANK;
  *  - CONTINUE-split SSTs (large string tables), including mid-string splits
  *    with the re-stated option-flags byte.
  *
  *  - BIFF5/7 workbooks ("Book" stream, BOF vers < 0x0600): inline codepage
  *    LABEL/RSTRING byte strings; number records are layout-identical.
  *
  * Not covered (documented): BIFF4 and earlier (pre-OLE2 single-stream
  * files), formulas, encryption.
  * Driver-side by design, like `Xlsx` — spreadsheets are a small-data
  * exchange format.
  */
object Xls {

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF

  /** Extract the Workbook/Book stream bytes from the OLE2 container. */
  private[sinks] def workbookStream(b: Array[Byte]): Array[Byte] = {
    require(b.length >= 512 &&
      (b(0) & 0xFF) == 0xD0 && (b(1) & 0xFF) == 0xCF && (b(2) & 0xFF) == 0x11 && (b(3) & 0xFF) == 0xE0,
      "xls: not an OLE2 compound file")
    val ssz = 1 << le16(b, 30)
    val msz = 1 << le16(b, 32)
    val numFat = le32(b, 44)
    val dirStart = le32(b, 48)
    val miniCutoff = le32(b, 56)
    val miniFatStart = le32(b, 60)

    def sector(s: Int): Array[Byte] = {
      val off = 512 + s.toLong * ssz
      java.util.Arrays.copyOfRange(b, off.toInt, math.min(off + ssz, b.length.toLong).toInt)
    }
    // FAT sector list: 109 DIFAT slots in the header (DIFAT sectors beyond
    // that are out of scope for the sizes this reader targets)
    val fatSectors = (0 until math.min(numFat, 109)).map(i => le32(b, 76 + 4 * i))
    val fat: Array[Int] = fatSectors.toArray.flatMap { s =>
      val sec = sector(s); (0 until ssz / 4).map(i => le32(sec, i * 4))
    }
    def chain(start: Int): Seq[Int] = {
      val out = Seq.newBuilder[Int]
      var s = start
      var guard = 0
      while (s != EndOfChain && s != FreeSect && s >= 0 && s < fat.length && guard < fat.length + 1) {
        out += s; s = fat(s); guard += 1
      }
      out.result()
    }
    def streamBytes(start: Int, size: Long): Array[Byte] = {
      val all = chain(start).toArray.flatMap(sector)
      java.util.Arrays.copyOfRange(all, 0, math.min(size, all.length.toLong).toInt)
    }

    // directory: 128-byte entries; scan for the workbook (tree order ignored)
    val dir = chain(dirStart).toArray.flatMap(sector)
    case class Entry(name: String, objType: Int, start: Int, size: Long)
    val entries = (0 until dir.length / 128).map { k =>
      val o = k * 128
      val nameLen = le16(dir, o + 64)
      val name = if (nameLen >= 2)
        new String(dir, o, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
      else ""
      Entry(name, dir(o + 66) & 0xFF, le32(dir, o + 116), le32(dir, o + 120).toLong & 0xFFFFFFFFL)
    }
    val root = entries.find(_.objType == 5).getOrElse(sys.error("xls: no root entry"))
    val wb = entries.find(e => e.objType == 2 && (e.name == "Workbook" || e.name == "Book"))
      .getOrElse(sys.error("xls: no Workbook stream"))

    if (wb.size >= miniCutoff) streamBytes(wb.start, wb.size)
    else {
      // ministream (root entry's stream) addressed by the miniFAT in 64-byte sectors
      val mini = streamBytes(root.start, root.size)
      val miniFatBytes = chain(miniFatStart).toArray.flatMap(sector)
      val miniFat = (0 until miniFatBytes.length / 4).map(i => le32(miniFatBytes, i * 4)).toArray
      val out = Seq.newBuilder[Byte]
      var s = wb.start
      var guard = 0
      while (s != EndOfChain && s != FreeSect && s >= 0 && s < miniFat.length && guard < miniFat.length + 1) {
        val off = s * msz
        out ++= java.util.Arrays.copyOfRange(mini, off, math.min(off + msz, mini.length))
        s = miniFat(s); guard += 1
      }
      java.util.Arrays.copyOfRange(out.result().toArray, 0, wb.size.toInt)
    }
  }

  /** BIFF8 XLUnicodeRichExtendedString at offset i; returns (text, end). */
  private def readString(b: Array[Byte], i: Int): (String, Int) = {
    val cch = le16(b, i)
    val flags = b(i + 2) & 0xFF
    var p = i + 3
    val cRun = if ((flags & 0x08) != 0) { val n = le16(b, p); p += 2; n } else 0
    val cbExt = if ((flags & 0x04) != 0) { val n = le32(b, p); p += 4; n } else 0
    val text =
      if ((flags & 0x01) != 0) { // uncompressed UTF-16LE
        val s = new String(b, p, cch * 2, java.nio.charset.StandardCharsets.UTF_16LE)
        p += cch * 2; s
      } else { // compressed: low bytes only
        val s = new String(b, p, cch, java.nio.charset.StandardCharsets.ISO_8859_1)
        p += cch; s
      }
    (text, p + cRun * 4 + cbExt)
  }

  /** Cursor over an SST payload that transparently crosses into CONTINUE
    * (0x003C) records. Per [MS-XLS]: when CHARACTER data is interrupted at a
    * record boundary, the continuation re-states the option-flags byte (the
    * compression bit may change mid-string); fixed fields and rich/ext data
    * continue without one.
    */
  private class SstCursor(wb: Array[Byte], payloadStart: Int, payloadEnd: Int) {
    private var pos = payloadStart
    private var end = payloadEnd
    private def advance(): Unit = {
      require(end + 4 <= wb.length && le16(wb, end) == 0x003C,
        "xls: SST overruns its record without a CONTINUE")
      val len = le16(wb, end + 2)
      pos = end + 4
      end = pos + len
    }
    private def ensure(): Unit = while (pos >= end) advance()
    def u8(): Int = { ensure(); val v = wb(pos) & 0xFF; pos += 1; v }
    def u16(): Int = { ensure(); val v = le16(wb, pos); pos += 2; v }
    def u32(): Int = { ensure(); val v = le32(wb, pos); pos += 4; v }
    def skip(n: Int): Unit = {
      var left = n
      while (left > 0) { ensure(); val take = math.min(left, end - pos); pos += take; left -= take }
    }
    /** cch characters, starting under `compressed0`; boundary crossings
      * consume a fresh flags byte.
      */
    def chars(cch: Int, compressed0: Boolean): String = {
      val sb = new java.lang.StringBuilder(cch)
      var left = cch
      var compressed = compressed0
      while (left > 0) {
        if (pos >= end) {
          advance()
          compressed = (u8() & 0x01) == 0 // re-stated grbit
        }
        val width = if (compressed) 1 else 2
        val take = math.min(left, (end - pos) / width)
        require(take > 0, "xls: zero-width SST continuation")
        if (compressed)
          sb.append(new String(wb, pos, take, java.nio.charset.StandardCharsets.ISO_8859_1))
        else
          sb.append(new String(wb, pos, take * 2, java.nio.charset.StandardCharsets.UTF_16LE))
        pos += take * width
        left -= take
      }
      sb.toString
    }
    def readSstString(): String = {
      val cch = u16()
      val flags = u8()
      val cRun = if ((flags & 0x08) != 0) u16() else 0
      val cbExt = if ((flags & 0x04) != 0) u32() else 0
      val s = chars(cch, (flags & 0x01) == 0)
      skip(cRun * 4 + cbExt)
      s
    }
  }

  /** RK-encoded number (30-bit int or truncated double, optional /100). */
  private def rkValue(rk: Int): Double = {
    val div = (rk & 0x01) != 0
    val v =
      if ((rk & 0x02) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if (div) v / 100.0 else v
  }

  private def numStr(d: Double): String =
    if (d == math.floor(d) && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")

  /** Parse the first worksheet of a BIFF5/BIFF8 workbook stream into rows. */
  private[sinks] def parseBiff(wb: Array[Byte]): Seq[Seq[String]] = {
    // BOF version gates the string layout: vers < 0x0600 = BIFF5/7, whose
    // cell strings are inline codepage byte strings (cch16 + bytes, no
    // grbit) and whose globals carry no SST/LABELSST at all.
    val biff5 = wb.length >= 6 && le16(wb, 0) == 0x0809 &&
      le16(wb, 4) != 0 && le16(wb, 4) < 0x0600
    // pass 1 (globals): SST strings + first BOUNDSHEET offset + CODEPAGE
    val sst = Seq.newBuilder[String]
    var sheetOffset = -1
    // BIFF5 byte strings are in the workbook codepage (CODEPAGE record
    // 0x0042); default to windows-1252 when absent or unmappable. 1200
    // means UTF-16LE (BIFF8's marker — BIFF8 strings carry their own
    // encoding flag, so it is ignored there).
    var charset: java.nio.charset.Charset = Cp1252
    var i = 0
    var inGlobals = true
    while (inGlobals && i + 4 <= wb.length) {
      val typ = le16(wb, i); val len = le16(wb, i + 2)
      val p = i + 4
      typ match {
        case 0x00FC => // SST: [cstTotal][cstUnique] then strings (CONTINUE-spanning)
          val cur = new SstCursor(wb, p, p + len)
          cur.u32() // cstTotal
          val unique = cur.u32()
          var k = 0
          while (k < unique) { sst += cur.readSstString(); k += 1 }
        case 0x0085 => if (sheetOffset < 0) sheetOffset = le32(wb, p) // BOUNDSHEET
        case 0x0042 if len >= 2 => // CODEPAGE
          val cp = le16(wb, p)
          if (cp != 1200)
            charset = try java.nio.charset.Charset.forName(s"windows-$cp")
              catch { case _: Exception =>
                try java.nio.charset.Charset.forName(s"cp$cp")
                catch { case _: Exception => Cp1252 } }
        case 0x000A => inGlobals = false // EOF of globals substream
        case _ =>
      }
      i = p + len
    }
    require(sheetOffset >= 0, "xls: no BOUNDSHEET record")
    val strings = sst.result().toIndexedSeq

    // pass 2: the sheet substream's cell records
    val cells = scala.collection.mutable.Map.empty[(Int, Int), String]
    var maxRow = -1; var maxCol = -1
    def put(r: Int, c: Int, v: String): Unit = {
      cells((r, c)) = v
      if (r > maxRow) maxRow = r
      if (c > maxCol) maxCol = c
    }
    i = sheetOffset
    var inSheet = true
    while (inSheet && i + 4 <= wb.length) {
      val typ = le16(wb, i); val len = le16(wb, i + 2)
      val p = i + 4
      typ match {
        case 0x00FD => // LABELSST
          put(le16(wb, p), le16(wb, p + 2), strings(le32(wb, p + 6)))
        case 0x0204 => // LABEL: BIFF8 unicode string / BIFF5 byte string
          if (biff5)
            put(le16(wb, p), le16(wb, p + 2), new String(wb, p + 8, le16(wb, p + 6), charset))
          else
            put(le16(wb, p), le16(wb, p + 2), readString(wb, p + 6)._1)
        case 0x00D6 if biff5 => // RSTRING: LABEL layout + ignored format runs
          put(le16(wb, p), le16(wb, p + 2), new String(wb, p + 8, le16(wb, p + 6), charset))
        case 0x0203 => // NUMBER: IEEE double
          val bits = (0 until 8).foldRight(0L)((k, acc) => (acc << 8) | (wb(p + 6 + k) & 0xFFL))
          put(le16(wb, p), le16(wb, p + 2), numStr(java.lang.Double.longBitsToDouble(bits)))
        case 0x027E => // RK
          put(le16(wb, p), le16(wb, p + 2), numStr(rkValue(le32(wb, p + 6))))
        case 0x00BD => // MULRK: row, colFirst, [xf+rk]*, colLast
          val row = le16(wb, p); val colFirst = le16(wb, p + 2)
          val n = (len - 6) / 6
          (0 until n).foreach(k =>
            put(row, colFirst + k, numStr(rkValue(le32(wb, p + 4 + k * 6 + 2)))))
        case 0x000A => inSheet = false
        case _ =>
      }
      i = p + len
    }
    if (maxRow < 0) return Nil
    (0 to maxRow).map(r => (0 to maxCol).map(c => cells.getOrElse((r, c), "")).toSeq)
      .takeWhile(_.exists(_.nonEmpty))
  }

  /** Read the first sheet of a legacy .xls into a string DataFrame; first
    * row = field names (reference format_xls.py:10-26).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = parseBiff(workbookStream(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))))
    require(rows.nonEmpty, s"xls: empty sheet in $path")
    val header = rows.head.map(graft.operators.KeyNormalize(_))
    val data = rows.tail.map(_.padTo(header.length, ""))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      data.map(r => org.apache.spark.sql.Row.fromSeq(r)).asJava,
      org.apache.spark.sql.types.StructType(header.map(h =>
        org.apache.spark.sql.types.StructField(h, org.apache.spark.sql.types.StringType))))
  }
}
