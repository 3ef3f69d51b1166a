package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC/WET reading and writing (ISO 28500 / the Common Crawl shipping
  * format) — the ingestion front door of every web-scale training-data
  * pipeline. A WET file is a sequence of records, each a `WARC/1.0` header
  * block (CRLF-separated `Name: value` lines, terminated by a blank line)
  * followed by exactly `Content-Length` payload bytes.
  *
  * Scale shape: parallelism is FILE-at-a-time, which is exactly how
  * production WARC processing works — CC ships ~1 GB .wet.gz shards and
  * gzip members are not splittable, so one task per shard is the native
  * unit. `binaryFile` spreads shards across executors; the parser is a
  * single forward byte scan per shard (no regex over the payload, no
  * line-splitting — `Content-Length` is authoritative, so payloads may
  * contain anything, including lines that look like record headers).
  * Writing emits one valid WET member per partition, mirroring the sharded
  * layout readers expect.
  */
object Warc {

  /** One parsed WET record. */
  final case class WetRecord(warcType: String, targetUri: String,
                             contentLength: Long, payload: String)

  /** Parse every record of one WET member (forward scan, Content-Length
    * authoritative; tolerates any CR/LF padding between records).
    */
  def parseRecords(bytes: Array[Byte]): Seq[WetRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WetRecord]
    var i = 0
    def atSep(j: Int): Boolean =
      j + 3 < bytes.length && bytes(j) == '\r' && bytes(j + 1) == '\n' &&
        bytes(j + 2) == '\r' && bytes(j + 3) == '\n'
    while (i < bytes.length) {
      // skip inter-record padding
      while (i < bytes.length && (bytes(i) == '\r' || bytes(i) == '\n')) i += 1
      if (i >= bytes.length) return out.toSeq
      // header block ends at the first CRLFCRLF
      var j = i
      while (j < bytes.length && !atSep(j)) j += 1
      require(j < bytes.length, s"WARC: unterminated header block at byte $i")
      val header = new String(bytes, i, j - i, UTF_8)
      val lines = header.split("\r\n")
      require(lines.headOption.exists(_.startsWith("WARC/")),
        s"WARC: record at byte $i does not start with a WARC/ version line")
      val fields = lines.tail.flatMap { l =>
        val c = l.indexOf(':')
        if (c < 0) None else Some(l.substring(0, c).trim.toLowerCase -> l.substring(c + 1).trim)
      }.toMap
      val len = fields.getOrElse("content-length",
        sys.error(s"WARC: record at byte $i has no Content-Length")).toLong
      val bodyStart = j + 4
      require(bodyStart + len <= bytes.length,
        s"WARC: truncated payload at byte $bodyStart (want $len bytes)")
      out += WetRecord(
        fields.getOrElse("warc-type", ""),
        fields.getOrElse("warc-target-uri", ""),
        len,
        new String(bytes, bodyStart, len.toInt, UTF_8))
      i = bodyStart + len.toInt
    }
    out.toSeq
  }

  private def parseMembers(binary: DataFrame): DataFrame = {
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        parseRecords(bytes).map(r =>
          (file, r.warcType, r.targetUri, r.contentLength, r.payload))
      }
      .toDF("file", "warc_type", "target_uri", "content_length", "payload")
  }

  /** Read a directory of WET members into
    * (file, warc_type, target_uri, content_length, payload).
    */
  def readWet(spark: SparkSession, path: String): DataFrame =
    parseMembers(spark.read.format("binaryFile").load(path))

  /** Streaming variant: each newly-arrived WET member becomes one
    * micro-batch unit — the "crawl shards land on object storage, pipeline
    * picks them up" ingestion loop, with exactly-once file tracking from
    * the file-stream source. Same parser, same schema as [[readWet]].
    */
  def readWetStream(spark: SparkSession, path: String): DataFrame = {
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    parseMembers(
      spark.readStream.format("binaryFile").schema(binarySchema).load(path))
  }

  /** Read WARC **response** records (the raw-crawl format: each payload is
    * a full HTTP response) and split the HTTP envelope declaratively:
    * status code, media type from the Content-Type header, and the body
    * after the first blank line. Same file-at-a-time scale shape as
    * [[readWet]]; the envelope split is a narrow map over the payload.
    */
  def readWarcResponses(spark: SparkSession, path: String): DataFrame =
    splitHttpEnvelope(readWet(spark, path))

  /** Streaming twin of [[readWarcResponses]]: newly-landed raw WARC shards
    * become micro-batches (readWetStream's exactly-once file tracking),
    * same envelope split, same schema — the continuous-ingestion version
    * of the crawl front door.
    */
  def readWarcResponsesStream(spark: SparkSession, path: String): DataFrame =
    splitHttpEnvelope(readWetStream(spark, path))

  /** Declarative HTTP-envelope split over parsed WARC records: keeps
    * `response` records, extracts status code and media type, and cuts the
    * body after the first blank line — a pure narrow map, batch or stream.
    */
  private def splitHttpEnvelope(records: DataFrame): DataFrame = {
    val sep = instr(col("payload"), "\r\n\r\n")
    val headers = substring_index(col("payload"), "\r\n\r\n", 1)
    records
      .filter(col("warc_type") === "response")
      .withColumn("http_status",
        regexp_extract(col("payload"), "^HTTP/[0-9.]+ ([0-9]{3})", 1).cast("int"))
      .withColumn("content_type",
        lower(trim(regexp_extract(headers, "(?i)(?:^|\\r\\n)Content-Type:\\s*([^;\\r\\n]+)", 1))))
      .withColumn("body",
        when(sep > 0, col("payload").substr(sep + lit(4),
          length(col("payload")))).otherwise(lit(null)))
      .select(col("file"), col("target_uri"), col("http_status"),
        col("content_type"), col("body"))
  }

  /** Write (uri, html) rows as WARC response records wrapping a minimal
    * 200 HTTP envelope — the raw-crawl sibling of [[writeWet]] (fixture
    * and export shape; Content-Length covers the whole HTTP payload).
    */
  def writeWarcResponses(df: DataFrame, uriCol: String, htmlCol: String,
                         path: String): Unit = {
    val html = coalesce(col(htmlCol), lit(""))
    val uri = regexp_replace(coalesce(col(uriCol), lit("")), "[\\r\\n]", "")
    val payload = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"),
      html)
    df.select(concat(
        lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        uri,
        lit("\r\nContent-Type: application/http; msgtype=response\r\nContent-Length: "),
        octet_length(payload).cast("string"),
        lit("\r\n\r\n"),
        payload,
        lit("\r\n")).as("value"))
      .write.mode("overwrite").text(path)
  }

  /** The full WARC→WET conversion: successful `text/html` responses →
    * visible text (single-pass codegen'd extraction) in [[writeWet]]'s
    * (uri, text) shape — compose with it to produce WET shards. Narrow
    * maps end to end after the shard-parallel read.
    */
  def warcToWet(spark: SparkSession, path: String): DataFrame =
    readWarcResponses(spark, path)
      .filter(col("http_status") === 200 && col("content_type") === "text/html")
      .select(col("target_uri").as("uri"),
        graft.functions.Html.htmlToText(col("body")).as("text"))

  /** Write (uri, text) rows as WET conversion records, one valid member per
    * partition. Record framing is built declaratively (octet_length gives
    * the exact payload byte count) and written through the text sink; the
    * sink's record terminator is legal inter-record padding, which
    * `parseRecords` skips.
    */
  def writeWet(df: DataFrame, uriCol: String, textCol: String,
               path: String): Unit = {
    // NULLs would propagate through concat into a NULL record and abort
    // the text sink on the first bad row; empty payload/uri is the
    // faithful WET rendering of a null field
    val text = coalesce(col(textCol), lit(""))
    // a CR/LF inside the URI value would terminate the header line early and
    // desynchronize Content-Length framing for the whole member — strip them
    // (the payload is safe: it is framed by Content-Length, not by markers)
    val uri = regexp_replace(coalesce(col(uriCol), lit("")), "[\\r\\n]", "")
    df.select(concat(
        lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
        uri,
        lit("\r\nContent-Type: text/plain\r\nContent-Length: "),
        octet_length(text).cast("string"),
        lit("\r\n\r\n"),
        text,
        lit("\r\n")).as("value"))
      .write.mode("overwrite").text(path)
  }
}
