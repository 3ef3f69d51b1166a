package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** SQL-dump source: parses `INSERT INTO \`t\` VALUES (…),(…);` statements for
  * one table out of a dump file — the reference's 'sql' pull format
  * (/root/reference/pybabe/format_sql.py:49-82; value tokenizer 10-46 with
  * `\'`/`\n`/`\r` unescaping 23-28 and NULL handling).
  *
  * Distributed design: `spark.read.text` splits the dump across tasks by
  * line (each INSERT statement is one line in mysqldump output), and the
  * tokenizer runs per-line inside `flatMap` — per-partition imperative
  * parsing, linear scaling, no driver involvement. All values surface as
  * nullable strings (the dump carries no types); compose with
  * `TypeDetect` to narrow.
  */
object SqlDump {

  /** Parse one VALUES-list line body starting at `pos` (after the prefix),
    * yielding tuples of (nullable) strings. Mirrors parse_tuple/parse_value
    * (format_sql.py:10-46).
    */
  private[sources] def parseTuples(line: String, start: Int, arity: Int): Iterator[Array[String]] =
    new Iterator[Array[String]] {
      private var pos = start
      private var done = false

      private def parseValue(): String = {
        val c = line.charAt(pos)
        if (c == 'N' && line.startsWith("NULL", pos)) { pos += 4; null }
        else if (c == '\'') {
          pos += 1
          val sb = new StringBuilder
          while (line.charAt(pos) != '\'') {
            if (line.charAt(pos) == '\\') {
              line.charAt(pos + 1) match {
                case '\''  => sb.append('\''); pos += 2
                case 'n'   => sb.append('\n'); pos += 2
                case 'r'   => sb.append('\r'); pos += 2
                case other => sb.append('\\').append(other); pos += 2
              }
            } else { sb.append(line.charAt(pos)); pos += 1 }
          }
          pos += 1
          sb.toString
        } else {
          // Unquoted scalar: numbers incl. exponent floats (1e5, 1.5E-3)
          // and hex literals (0xFF) — mysqldump emits all of these.
          val s = pos
          while (pos < line.length && (line.charAt(pos).isLetterOrDigit ||
            line.charAt(pos) == '.' || line.charAt(pos) == '-' ||
            line.charAt(pos) == '+')) pos += 1
          if (pos == s) throw new IllegalArgumentException(
            s"SqlDump parse error at $pos: ${line.slice(pos, pos + 10)}")
          line.substring(s, pos)
        }
      }

      override def hasNext: Boolean = !done && pos < line.length && line.charAt(pos) == '('

      override def next(): Array[String] = {
        pos += 1 // consume '('
        val buf = new Array[String](arity)
        var i = 0
        var open = true
        while (open) {
          val v = parseValue()
          if (i < arity) buf(i) = v
          i += 1
          line.charAt(pos) match {
            case ',' => pos += 1
            case ')' => pos += 1; open = false
            case c   => throw new IllegalArgumentException(s"SqlDump parse error: '$c' at $pos")
          }
        }
        if (pos < line.length) {
          line.charAt(pos) match {
            case ',' => pos += 1             // next tuple follows
            case ';' => done = true          // statement terminator
            case _   => done = true
          }
        }
        buf
      }
    }

  /** Read the INSERT statements of `table` from a dump at `path` into a
    * DataFrame of string columns named `fields`.
    */
  def read(spark: SparkSession, path: String, table: String, fields: Seq[String]): DataFrame = {
    val prefix = s"INSERT INTO `$table` VALUES "
    val arity = fields.length
    val schema = StructType(fields.map(f => StructField(f, StringType, nullable = true)))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(schema)
    // Stays on the Dataset API (no RDD drop-out): the parse is a typed
    // flatMap inside the Dataset pipeline, so downstream projections/filters
    // still participate in Catalyst planning.
    spark.read.textFile(path)
      .filter(_.startsWith(prefix))
      .flatMap(line => parseTuples(line, prefix.length, arity)
        .map(a => Row.fromSeq(a.toIndexedSeq)))
      .toDF(fields: _*)
  }

  /** Parse a dump already held as a string (for tests mirroring the
    * reference golden, tests/test_sql.py:59-73).
    */
  def parseString(dump: String, table: String, fields: Seq[String]): Seq[Seq[String]] = {
    val prefix = s"INSERT INTO `$table` VALUES "
    dump.split("\n").toIndexedSeq.filter(_.startsWith(prefix))
      .flatMap(line => parseTuples(line, prefix.length, fields.length).map(_.toIndexedSeq))
  }
}
