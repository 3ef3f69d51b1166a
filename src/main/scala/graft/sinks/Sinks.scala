package graft.sinks

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sink layer — the Spark-native re-expression of the reference's `push`
  * universal sink (/root/reference/pybabe/base.py:463-567) and its format
  * writers (CSV format_csv.py:85-97, txt format_txt.py:19-27, html
  * format_html.py:18-47), plus the `to_string`/`to_list` collectors
  * (base.py:330-333, 459-460) and the `log` passthrough tap (log.py:16-36).
  *
  * Distributed writes go through `df.write` (every executor writes its own
  * partition files — the reference's per-substream output files map to
  * `partitionBy`, base.py:517-541); the golden-string/html helpers collect
  * to the driver BY DESIGN and are for tests/reports on small results only.
  */
object Sinks {

  /** Reference timestamp format: charset.py:60-67 (`%Y-%m-%d %H:%M:%S`). */
  val TimestampFmt = "yyyy-MM-dd HH:mm:ss"

  /** Universal push (reference base.py:463-567): format from extension,
    * `ignore_if_exists` → SaveMode.Ignore, partition columns → per-partition
    * directories (the `filename_template` / `$partition_var` mechanism,
    * base.py:517-521 — hive-style `col=value/` paths are its scale-correct
    * analogue: each task writes only its own partition's files).
    */
  def push(df: DataFrame, path: String,
           format: Option[String] = None,
           partitionBy: Seq[String] = Nil,
           ignoreIfExists: Boolean = false,
           options: Map[String, String] = Map.empty): Unit = {
    val mode = if (ignoreIfExists) SaveMode.Ignore else SaveMode.Overwrite
    var w = df.write.mode(mode).options(options)
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    dispatch(w, format.getOrElse(guessFormat(path)), path, options)
  }

  /** Shared format dispatch for every writer path (push + partition
    * reload): one place to add a format.
    */
  private def dispatch(w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row],
                       fmt: String, path: String,
                       options: Map[String, String]): Unit = fmt match {
    case "csv" => w.option("header", options.getOrElse("header", "true"))
      .option("timestampFormat", options.getOrElse("timestampFormat", TimestampFmt))
      .csv(path)
    case "txt" | "text" => w.text(path)
    case "parquet"      => w.parquet(path)
    case "json"         => w.json(path)
    case "orc"          => w.orc(path)
    case other => throw new IllegalArgumentException(s"push: unknown format '$other'")
  }

  /** Idempotent partition reload — the file-side analogue of the
    * reference's delete-partition-then-insert (sql.py:292-305, driven by
    * kontagent.py's per-hour reload loop): dynamic partition overwrite
    * replaces ONLY the hive-style partitions present in `df`, leaving every
    * other partition untouched. Re-running the same load is a no-op — the
    * property that makes hourly backfill safe at any scale (each run
    * rewrites its own `col=value/` directories atomically, no read-modify-
    * write of the whole table).
    */
  def pushPartitionReload(df: DataFrame, path: String, partitionBy: Seq[String],
                          format: Option[String] = None,
                          options: Map[String, String] = Map.empty): Unit = {
    require(partitionBy.nonEmpty, "pushPartitionReload needs partition columns")
    // per-WRITE option, not the session conf: mutating the session conf
    // races concurrent writers on the same SparkSession (a static-mode
    // overwrite sneaking in wipes every partition absent from its frame)
    val w = df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .options(options)
      .partitionBy(partitionBy: _*)
    dispatch(w, format.getOrElse(guessFormat(path)), path, options)
  }

  /** Extension → format guess (reference base.py:471-491). */
  def guessFormat(path: String): String = {
    val base = path.stripSuffix(".gz").stripSuffix(".bz2").stripSuffix(".zip")
    base.split('.').lastOption.map(_.toLowerCase) match {
      case Some("csv") | Some("tsv") => "csv"
      case Some("txt")               => "txt"
      case Some("json")              => "json"
      case Some("orc")               => "orc"
      case _                         => "parquet"
    }
  }

  // ---------------------------------------------------------------------
  // Driver-side collectors (golden-test helpers / small reports)
  // ---------------------------------------------------------------------

  /** One cell, formatted like the reference's CSV writer (charset.py:60-67):
    * None -> "", datetime -> `%Y-%m-%d %H:%M:%S`, floats via toString.
    */
  private def fmtCell(v: Any): String = v match {
    case null                      => ""
    case t: java.sql.Timestamp     => t.toLocalDateTime.format(
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    case d: java.sql.Date          => d.toString
    case other                     => other.toString
  }

  private def csvQuote(s: String, sep: Char): String =
    if (s.exists(c => c == sep || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /** Collect to a CSV string — the reference's `to_string` golden helper
    * (base.py:330-333): header line + one line per row, '\r\n' line ends
    * like Python's csv writer default. Driver-side by design; use only on
    * small/limited results (tests, reports).
    */
  def toCsvString(df: DataFrame, sep: Char = ',', lineEnd: String = "\r\n"): String = {
    val sb = new StringBuilder
    sb.append(df.columns.map(c => csvQuote(c, sep)).mkString(sep.toString)).append(lineEnd)
    df.collect().foreach { row =>
      sb.append(row.toSeq.map(v => csvQuote(fmtCell(v), sep)).mkString(sep.toString))
        .append(lineEnd)
    }
    sb.toString
  }

  /** Collect data rows (reference `to_list`, base.py:459-460). */
  def toList(df: DataFrame): Seq[Row] = df.collect().toIndexedSeq

  /** HTML report (reference format_html.py:18-47): name header, optional
    * description, table of rows. Driver-side renderer for small results.
    */
  def toHtmlString(df: DataFrame, name: String = "stream",
                   description: Option[String] = None): String = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val sb = new StringBuilder
    sb.append(s"<h2>${esc(name)}</h2>\n")
    description.foreach(d => sb.append(s"<i>${esc(d)}</i>\n"))
    sb.append("<table>\n<tr>")
    df.columns.foreach(c => sb.append(s"<th>${esc(c)}</th>"))
    sb.append("</tr>\n")
    df.collect().foreach { row =>
      sb.append("<tr>")
      row.toSeq.foreach(v => sb.append(s"<td>${esc(fmtCell(v))}</td>"))
      sb.append("</tr>\n")
    }
    sb.append("</table>\n")
    sb.toString
  }

  /** Compose the reference's `mail` final sink as an RFC-2822 MIME message
    * string (reference mail.py:16-87: HTML body from a row-limited preview,
    * CSV attachments base64-encoded). Transport is deliberately out of
    * scope — hand the string to any SMTP client; composing is the
    * engine-side work.
    */
  def mailString(df: DataFrame, from: String, to: Seq[String], subject: String,
                 name: String = "stream", bodyRowLimit: Int = 20): String = {
    val boundary = "=_graft_" + java.util.UUID.randomUUID().toString
    val html = toHtmlString(df.limit(bodyRowLimit), name)
    val csv = toCsvString(df)
    val b64 = java.util.Base64.getMimeEncoder(76, "\r\n".getBytes)
      .encodeToString(csv.getBytes("UTF-8"))
    s"""From: $from\r
To: ${to.mkString(", ")}\r
Subject: $subject\r
MIME-Version: 1.0\r
Content-Type: multipart/mixed; boundary="$boundary"\r
\r
--$boundary\r
Content-Type: text/html; charset=UTF-8\r
\r
$html\r
--$boundary\r
Content-Type: text/csv; charset=UTF-8; name="$name.csv"\r
Content-Disposition: attachment; filename="$name.csv"\r
Content-Transfer-Encoding: base64\r
\r
$b64\r
--$boundary--\r
"""
  }

  /** Passthrough tap (reference `log`, log.py:16-36): attaches named observed
    * metrics (row count + optional per-column aggregates) that surface via
    * QueryExecutionListener after the next action — the scale-correct way to
    * watch a stream without a second pass or a collect.
    */
  def logTap(df: DataFrame, name: String = "log"): DataFrame =
    df.observe(name, count(lit(1)).as("rows"))
}
