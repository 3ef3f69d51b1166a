package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Partitioned event-log source — the Spark-first re-expression of the
  * reference's Kontagent connector (/root/reference/pybabe/kontagent.py:
  * 99-204 line parser, 245-293 hour-partition loop).
  *
  * The reference fetches one file per hour with an 8-thread pool and emits
  * one substream per hour with header.partition={date,hour}. Here the layout
  * IS the partitioning: hive-style `date=…/hour=…` directories scan in
  * parallel with partition pruning for free, and the query-string event
  * format parses with pure Catalyst built-ins (str_to_map, parse_url-style
  * expressions, unbase64) — no UDFs, codegen end to end.
  */
object EventLogs {

  /** Parse a `k1=v1&k2=v2` query-string payload column into a map column —
    * the core of the reference's line parser (kontagent.py:99-120,
    * urlparse.parse_qs).
    */
  def parseQueryString(c: Column): Column =
    str_to_map(c, lit("&"), lit("="))

  /** URL-decode then parse: the reference unquotes values (kontagent.py:131). */
  def parseQueryStringDecoded(c: Column): Column =
    transform_values(parseQueryString(c), (_, v) => url_decode(v))

  /** Decode a base64-encoded JSON `data` payload into a map — the
    * reference's `data` field handling (kontagent.py:139-147).
    */
  def decodeJsonPayload(c: Column): Column =
    from_json(unbase64(c).cast(StringType), MapType(StringType, StringType))

  /** Read an hour-partitioned log directory laid out as
    * `root/date=YYYY-MM-DD/hour=HH/…` with partition pruning: filters on
    * `date`/`hour` never touch non-matching directories.
    */
  def readPartitioned(spark: SparkSession, root: String,
                      format: String = "text"): DataFrame =
    spark.read.format(format).option("basePath", root).load(root)

  /** The reference's derived-column pass (kontagent.py:150-204) as an
    * expression pipeline example: extract typed fields from a parsed map.
    */
  def extractEventColumns(df: DataFrame, mapCol: String,
                          keys: Seq[(String, DataType)]): DataFrame =
    df.withColumns(keys.map { case (k, dt) =>
      k -> element_at(col(mapCol), k).cast(dt)
    }.toMap)
}
