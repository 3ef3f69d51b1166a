package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.GraftFunctions

/** HTML → text extraction: the WARC→WET step of a crawl pipeline (the stage
  * between Warc.readWarc's raw responses and every text operator in this
  * library). The reference has no HTML surface (pybabe consumes delimited /
  * structured formats only — /root/reference/pybabe/format_csv.py); this is
  * training-data-pipeline surface in the builder's brief, alongside the
  * other crawl stages (UrlFunctions, Warc, TextFunctions).
  *
  * The heavy lifting is `Kernels.htmlToText`, a single-pass codegen'd
  * Catalyst expression (no UDF): script/style/comment removal, tag
  * stripping with block-tag line structure, entity decoding, whitespace
  * canonicalization — one compiled scan per document, so the extraction
  * stays inside whole-stage codegen and scales as a pure narrow map (zero
  * shuffle; 100 TB of WARC shards extract shard-parallel).
  *
  * Title/link extraction are RE2-safe regexes (replayable by any engine);
  * href values get the attribute-level entity decode HTML requires.
  */
object Html {

  /** Visible text of an HTML document (see Kernels.htmlToText for the
    * exact extraction contract).
    */
  def htmlToText(html: Column): Column = GraftFunctions.htmlToText(html)

  private val TitleRe = "(?is)<title[^>]*>(.*?)</title>"
  private val HrefRe = "(?i)href=\"([^\"]*)\""

  /** `<title>` content, whitespace-trimmed; "" when absent. */
  def htmlTitle(html: Column): Column =
    trim(regexp_extract(html, TitleRe, 1))

  /** All `href="…"` values in document order, attribute entities decoded
    * (`&amp;` in a URL is the encoding of a literal `&`).
    */
  def htmlLinks(html: Column): Column =
    transform(regexp_extract_all(html, lit(HrefRe), lit(1)), decodeAttr _)

  /** The minimal attribute-value entity decode (the five XML-core
    * entities), `&amp;` last so double-encoded values stay encoded.
    */
  private def decodeAttr(v: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
    steps.foldLeft(v) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
  }

  /** WARC→WET in one step: extract text (+title, links) from a column of
    * raw HTML. Pure narrow map — compose with Warc.writeWet for the
    * standard crawl-extraction output.
    */
  def extract(df: DataFrame, htmlCol: Column): DataFrame =
    df.withColumn("text", htmlToText(htmlCol))
      .withColumn("title", htmlTitle(htmlCol))
      .withColumn("links", htmlLinks(htmlCol))
}
