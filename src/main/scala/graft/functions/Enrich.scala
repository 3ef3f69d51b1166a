package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Enrichment operators — the reference's `user_agent`
  * (/root/reference/pybabe/user_agent.py:14-34; golden
  * tests/test_user_agent.py:6-12) and `geoip`/`geoip_country_code`
  * (geoip.py:26-79; golden tests/test_geo.py:6-11).
  *
  * user_agent is a pure codegen'd regexp `when`-chain (no UDF, no external
  * parser library). geoip is the canonical broadcast-dimension enrichment:
  * the IP-block table (start_ip, end_ip, attrs) is broadcast and range-joined
  * — at 100 TB the fact side streams map-side through a BroadcastNestedLoop
  * on a two-sided range predicate, or (better, provided here) an equi-join on
  * the /8 prefix + in-bucket range filter, which keeps it a broadcast HASH
  * join.
  */
object Enrich {

  // -- user agent -----------------------------------------------------------

  /** OS family from a UA string (reference semantics: httpagentparser's
    * os/dist names — "Windows", "Macintosh", "Linux", device names for
    * mobile).
    */
  def uaOs(ua: Column): Column =
    when(ua.rlike("iPad"), "iPad")
      .when(ua.rlike("iPhone"), "iPhone")
      .when(ua.rlike("Android"), "Android")
      .when(ua.rlike("Windows"), "Windows")
      .when(ua.rlike("Mac OS X|Macintosh"), "Macintosh")
      .when(ua.rlike("Linux"), "Linux")
      .otherwise(lit(null).cast(StringType))

  /** Browser family; order matters (Chrome UAs contain "Safari", Edge
    * contains "Chrome", Firefox is detected before generic Gecko).
    */
  def uaBrowser(ua: Column): Column =
    when(ua.rlike("Edg(e|A|iOS)?/"), "Edge")
      .when(ua.rlike("OPR/|Opera"), "Opera")
      .when(ua.rlike("Firefox/"), "Firefox")
      .when(ua.rlike("Chrom(e|ium)/"), "Chrome")
      .when(ua.rlike("Safari/"), "Safari")
      .when(ua.rlike("MSIE |Trident/"), "Microsoft Internet Explorer")
      .otherwise(lit(null).cast(StringType))

  /** Browser version: the token after the detected browser product. */
  def uaBrowserVersion(ua: Column): Column = {
    def v(re: String) = regexp_extract(ua, re, 1)
    val raw =
      when(ua.rlike("Edg(e|A|iOS)?/"), v("Edg(?:e|A|iOS)?/([0-9.]+)"))
        .when(ua.rlike("OPR/"), v("OPR/([0-9.]+)"))
        .when(ua.rlike("Opera"), v("Version/([0-9.]+)"))
        .when(ua.rlike("Firefox/"), v("Firefox/([0-9.]+)"))
        .when(ua.rlike("Chrom(e|ium)/"), v("Chrom(?:e|ium)/([0-9.]+)"))
        .when(ua.rlike("Safari/"), v("Version/([0-9.]+)"))
        .when(ua.rlike("MSIE "), v("MSIE ([0-9.]+)"))
        .when(ua.rlike("Trident/"), v("rv:([0-9.]+)"))
        .otherwise(lit(null).cast(StringType))
    when(raw === "", lit(null).cast(StringType)).otherwise(raw)
  }

  /** `user_agent(field, output_os, output_browser, output_browser_version)`
    * — appends the three parsed columns (reference user_agent.py:14-34).
    */
  def userAgent(df: DataFrame, field: String,
                outputOs: String = "os", outputBrowser: String = "browser",
                outputBrowserVersion: String = "browser_version"): DataFrame =
    df.withColumns(Map(
      outputOs -> uaOs(col(field)),
      outputBrowser -> uaBrowser(col(field)),
      outputBrowserVersion -> uaBrowserVersion(col(field))))

  // -- geoip ----------------------------------------------------------------

  /** Dotted-quad IPv4 → numeric (returns null for malformed input, matching
    * the reference's error→null path, geoip.py:65-70).
    */
  def ipToLong(ip: Column): Column = {
    val parts = split(ip, "\\.")
    val valid = ip.rlike("^([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})$") &&
      !exists(parts, p => p.cast(IntegerType) > 255)
    when(valid,
      aggregate(transform(parts, p => p.cast(LongType)), lit(0L), (acc, v) => acc * 256L + v))
      .otherwise(lit(null).cast(LongType))
  }

  /** A tiny built-in IPv4-block sample (public IANA/GeoLite-style ranges)
    * sufficient for the ported reference golden; production use passes a full
    * block table to `geoip(df, blocks=...)`.
    */
  def sampleBlocks(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // (start, end, country_code, region_name, city, lat, lon)
      ("4.0.0.0", "4.255.255.255", "US", "CA", "Los Angeles", 34.05, -118.24),
      ("8.8.8.0", "8.8.8.255", "US", "CA", "Mountain View", 37.39, -122.07),
      ("82.224.0.0", "82.255.255.255", "FR", "IDF", "Paris", 48.86, 2.35),
      ("92.40.0.0", "92.63.255.255", "GB", "ENG", "London", 51.51, -0.13),
      ("133.0.0.0", "133.255.255.255", "JP", "13", "Tokyo", 35.68, 139.69))
      .toDF("start_ip", "end_ip", "country_code", "region_name", "city", "latitude", "longitude")
  }

  /** Append geo columns by range-joining against a broadcast block table.
    * Block rows are exploded per /8 bucket they span, so the join is a
    * broadcast HASH join on the /8 prefix with an in-bucket range filter —
    * not a nested-loop over every block — and unmatched/invalid IPs null-pad
    * (reference geoip.py:26-52).
    */
  def geoip(df: DataFrame, field: String = "ip",
            blocks: Option[DataFrame] = None): DataFrame = {
    val spark = df.sparkSession
    val blk = blocks.getOrElse(sampleBlocks(spark))
      .withColumn("__s", ipToLong(col("start_ip")))
      .withColumn("__e", ipToLong(col("end_ip")))
      .withColumn("__b", explode(sequence(
        floor(col("__s") / 16777216L).cast(LongType),
        floor(col("__e") / 16777216L).cast(LongType))))
      .drop("start_ip", "end_ip")
    val withIp = df.withColumn("__ip", ipToLong(col(field)))
      .withColumn("__b", floor(col("__ip") / 16777216L).cast(LongType))
    val blkB = blk.withColumnRenamed("__b", "__bb")
    withIp.join(broadcast(blkB),
        col("__b") === col("__bb") && col("__ip") >= col("__s") && col("__ip") <= col("__e"),
        "left")
      .drop("__ip", "__b", "__bb", "__s", "__e")
  }

  /** `geoip_country_code` (reference geoip.py:55-79): country_code only. */
  def geoipCountryCode(df: DataFrame, field: String = "ip",
                       blocks: Option[DataFrame] = None): DataFrame = {
    val enriched = geoip(df, field, blocks.map(_.select(
      col("start_ip"), col("end_ip"), col("country_code"),
      lit(null).cast(StringType).as("region_name"), lit(null).cast(StringType).as("city"),
      lit(null).cast(DoubleType).as("latitude"), lit(null).cast(DoubleType).as("longitude"))))
    enriched.drop("region_name", "city", "latitude", "longitude")
  }
}
