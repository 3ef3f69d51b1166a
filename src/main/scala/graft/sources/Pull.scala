package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import java.io.{BufferedReader, InputStreamReader}
import java.util.zip.ZipInputStream

/** Universal `pull` dispatch — the reference's extension → (compression,
  * format) guessing (/root/reference/pybabe/base.py:345-358, 421-429).
  *
  * gz/bz2 are transparent in Spark's file sources (no plugin needed). zip is
  * not (no Hadoop codec), so it gets a small `binaryFile`-based reader that
  * opens each archive inside a task — distributed across archives, exactly
  * one member per archive like the reference enforces (base.py:424-425).
  */
object Pull {

  /** (format, compression) from a filename (reference base.py:345-358). */
  def guess(path: String): (String, Option[String]) = {
    val lower = path.toLowerCase
    val (base, compress) =
      if (lower.endsWith(".gz")) (lower.stripSuffix(".gz"), Some("gz"))
      else if (lower.endsWith(".bz2")) (lower.stripSuffix(".bz2"), Some("bz2"))
      else if (lower.endsWith(".zip")) (lower.stripSuffix(".zip"), Some("zip"))
      else (lower, None)
    val fmt = base.split('.').lastOption match {
      case Some("csv")             => "csv"
      case Some("tsv")             => "csv"
      case Some("txt")             => "txt"
      case Some("json")            => "json"
      case Some("parquet")         => "parquet"
      case Some("orc")             => "orc"
      case Some("sql")             => "sql"
      case Some("xls")             => "xls"
      case Some("xlsx")            => "xlsx"
      case _                       => "csv"
    }
    (fmt, compress)
  }

  /** Universal pull: dispatch on guessed (format, compression). `fields` and
    * the CSV knobs flow through to the CSV source; sql-dump needs `table`.
    */
  def apply(spark: SparkSession, path: String,
            format: Option[String] = None,
            fields: Seq[String] = Nil,
            table: Option[String] = None,
            delimiter: Option[String] = None,
            nullValue: String = "",
            encoding: String = "UTF-8",
            ignoreBadLines: Boolean = false): DataFrame = {
    val (guessedFmt, compress) = guess(path)
    val fmt = format.getOrElse(guessedFmt)
    (fmt, compress) match {
      case (_, Some("zip")) =>
        val lines = zipLines(spark, path)
        fmt match {
          case "txt" => lines.toDF("text")
          case "csv" => csvFromLines(spark, lines, fields, delimiter, nullValue)
          case other => throw new IllegalArgumentException(s"pull: zip+$other unsupported")
        }
      case ("csv", _)     => Sources.csv(spark, path, fields, delimiter, nullValue,
                                          encoding, ignoreBadLines)
      case ("txt", _)     => Sources.txt(spark, path)
      case ("json", _)    => spark.read.json(path)
      case ("parquet", _) => spark.read.parquet(path)
      case ("orc", _)     => spark.read.orc(path)
      case ("sql", _)     => SqlDump.read(spark, path,
        table.getOrElse(throw new IllegalArgumentException("pull(format=sql) needs table=")),
        fields)
      case ("xlsx", _)    => graft.sinks.Xlsx.read(spark, path)
      case ("xls", _)     =>
        // sniff the container: legacy OLE2 magic -> BIFF reader; otherwise
        // it is a modern OOXML file with a .xls extension -> xlsx reader
        val head = new Array[Byte](8)
        val in = new java.io.FileInputStream(path)
        try in.read(head) finally in.close()
        if ((head(0) & 0xFF) == 0xD0 && (head(1) & 0xFF) == 0xCF &&
            (head(2) & 0xFF) == 0x11 && (head(3) & 0xFF) == 0xE0)
          graft.sinks.Xls.read(spark, path)
        else graft.sinks.Xlsx.read(spark, path)
      case (other, _)     => throw new IllegalArgumentException(s"pull: unknown format '$other'")
    }
  }

  /** Lines of the single member of each zip archive matching `path`.
    * `binaryFile` distributes archives across tasks; each task streams ONE
    * archive through ZipInputStream (never loads members beyond the stream
    * buffer). The reference's one-member rule (base.py:424-425) is enforced.
    */
  def zipLines(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("path", "content").as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        val zin = new ZipInputStream(new java.io.ByteArrayInputStream(bytes))
        val first = zin.getNextEntry
        require(first != null, s"pull: empty zip archive $p")
        val reader = new BufferedReader(new InputStreamReader(zin, "UTF-8"))
        val lines = Iterator.continually(reader.readLine()).takeWhile(_ != null).toVector
        require(zin.getNextEntry == null,
          s"pull: zip archive $p has more than one member (reference base.py:424-425)")
        lines
      }
  }

  /** Parse a Dataset of CSV lines (already decompressed) with the Spark CSV
    * parser — header row = field names unless `fields` given.
    */
  private def csvFromLines(spark: SparkSession, lines: Dataset[String],
                           fields: Seq[String], delimiter: Option[String],
                           nullValue: String): DataFrame = {
    import graft.operators.KeyNormalize
    val sep = delimiter.getOrElse {
      val head = lines.limit(1).collect().headOption.getOrElse("")
      Seq("\t", ",", ";", "|").maxBy(d => head.split(java.util.regex.Pattern.quote(d), -1).length)
    }
    val df = spark.read
      .option("sep", sep).option("header", fields.isEmpty)
      .option("nullValue", nullValue)
      .csv(lines)
    val named = if (fields.nonEmpty) df.toDF(fields: _*) else df
    named.toDF(named.columns.map(KeyNormalize(_)).toIndexedSeq: _*)
  }
}
