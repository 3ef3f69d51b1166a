package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.KeyNormalize

/** Source layer — the Spark-native re-expression of the reference's
  * `pull` (/root/reference/pybabe/base.py:361-450): format + compression are
  * guessed from the extension; CSV dialect is sniffed from a sample
  * (format_csv.py:50-73 uses csv.Sniffer); column names are normalized via
  * keynormalize (base.py:74-82). Compression (gz/bz2/…) is transparent in
  * Spark's file sources, so no compress plugins are needed.
  */
object Sources {

  /** Sniff the delimiter from the first line of the file, like the
    * reference's csv.Sniffer pass (format_csv.py:54-62): the candidate
    * delimiter with the most consistent, nonzero column count wins; an
    * "alphabetic delimiter" result falls back to single-column
    * (format_csv.py:58-62's linepull fallback).
    */
  def sniffDelimiter(spark: SparkSession, path: String): String = {
    val lines = spark.read.textFile(path).limit(5).collect()
    if (lines.isEmpty) return ","
    val candidates = Seq("\t", ",", ";", "|")
    val best = candidates.maxBy { d =>
      val counts = lines.map(_.split(java.util.regex.Pattern.quote(d), -1).length)
      if (counts.head <= 1) -1 else if (counts.distinct.length == 1) counts.head else 0
    }
    val headCount = lines.head.split(java.util.regex.Pattern.quote(best), -1).length
    if (headCount <= 1) "," else best
  }

  /** CSV pull (reference format_csv.py:30-73): header row = field names
    * unless `fields` given; `nullValue` default "" (format_csv.py:33);
    * malformed-line handling via `ignoreBadLines` (format_csv.py:42-46);
    * names keynormalized like the reference's StreamHeader.
    */
  def csv(spark: SparkSession, path: String,
          fields: Seq[String] = Nil,
          delimiter: Option[String] = None,
          nullValue: String = "",
          encoding: String = "UTF-8",
          ignoreBadLines: Boolean = false): DataFrame = {
    val sep = delimiter.getOrElse(sniffDelimiter(spark, path))
    var reader = spark.read
      .option("sep", sep)
      .option("header", fields.isEmpty)
      .option("nullValue", nullValue)
      .option("encoding", encoding)
      .option("mode", if (ignoreBadLines) "DROPMALFORMED" else "PERMISSIVE")
    val df = reader.csv(path)
    val named =
      if (fields.nonEmpty) df.toDF(fields: _*)
      else df
    named.toDF(named.columns.map(KeyNormalize(_)).toIndexedSeq: _*)
  }

  /** txt pull (reference format_txt.py:6-16): whole line -> one `text` column. */
  def txt(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path).toDF("text")

  /** Chained pull = concatenation of sources (reference base.py:365-368:
    * "Existing iterator go first"; merge_substreams partition.py:8-27).
    */
  def concat(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_ unionByName _)
}
