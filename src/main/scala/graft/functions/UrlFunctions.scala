package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL hygiene for web-crawl corpora — the stage every CommonCrawl-derived
  * pipeline (CCNet, C4, RefinedWeb) runs before any content work: normalize
  * URLs so the same page has ONE key (URL-level dedup), extract the
  * registered domain, and drop documents from blocklisted domains.
  *
  * Everything here is a pure narrow map built from RE2-safe regexes and
  * higher-order array functions — no UDFs, no shuffle, fully codegen'd, and
  * ANSI-replayable so URL keys can be re-derived by any engine.
  *
  * Canonicalization rules (the conservative, lossless-for-dedup subset):
  * lowercase scheme and host, strip userinfo, strip the scheme's default
  * port (:80 http, :443 https), empty path -> "/", drop the fragment, drop
  * tracking parameters (utm_*, gclid, fbclid), keep remaining parameter
  * ORDER (reordering can change semantics for some sites). Strings without
  * a scheme://host prefix pass through unchanged.
  */
object UrlFunctions {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val TrackingRe = "^(utm_[A-Za-z0-9_]*|gclid|fbclid)(=|$)"

  /** Lowercased host of a URL (userinfo and port stripped); "" if the
    * string has no scheme://host shape.
    */
  def urlHost(url: Column): Column = {
    val hostport = regexp_extract(url, SchemeRe + "([^/?#]*)", 2)
    lower(regexp_replace(regexp_replace(hostport, "^[^@]*@", ""), ":[0-9]*$", ""))
  }

  /** Canonical form of a URL per the rules above. */
  def urlCanonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeRe, 1))
    val hostport = regexp_extract(url, SchemeRe + "([^/?#]*)", 2)
    val noUser = regexp_replace(hostport, "^[^@]*@", "")
    val port = regexp_extract(noUser, ":([0-9]*)$", 1)
    val host = lower(regexp_replace(noUser, ":[0-9]*$", ""))
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val path = regexp_extract(url, SchemeRe + "[^/?#]*([^?#]*)", 2)
    // anchor the query BEFORE any '#' and at the FIRST '?': a '?' inside
    // the fragment ("https://app/#/search?q=x") is fragment content and
    // must drop with it, and a '?' inside the query itself (legal per
    // RFC 3986) belongs to the query, not before it
    val query = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingRe))
    val canon = concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      when(path === "", lit("/")).otherwise(path),
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
    when(scheme === "", url).otherwise(canon)
  }

  /** Multi-label public suffixes recognized by `registeredDomain` — the
    * high-traffic subset of the Public Suffix List (the full PSL is a data
    * file a production deployment would broadcast; the heuristic covers the
    * common country-code second-level registries).
    */
  val MultiSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.nz", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.sg", "com.tr", "com.ar")

  /** Registered (pay-level) domain of a lowercase host: the public suffix
    * plus one label — "a.b.src3.co.uk" -> "src3.co.uk",
    * "www.example.org" -> "example.org". Hosts with fewer labels pass
    * through unchanged.
    */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val nl = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), element_at(labels, -2),
      element_at(labels, -1))
    // IP literals have no registered domain — suffix-stripping an IPv4
    // would hand back a meaningless "216.34"
    when(host.rlike("^[0-9.]+$") || host.startsWith("["), host)
      .when(nl >= 3 && last2.isin(MultiSuffixes: _*), last3)
      .when(nl >= 2, last2)
      .otherwise(host)
  }

  /** Drop every row whose URL's registered domain is blocklisted. The
    * blocklist ships as a literal (blocklists are KBs-to-MBs; a full PSL-
    * scale list would broadcast-anti-join instead) — a pure per-row filter
    * that composes unchanged with Structured Streaming.
    */
  // -----------------------------------------------------------------------
  // robots.txt compliance (RFC 9309, the Robots Exclusion Protocol) — the
  // crawl-legality filter a compliant corpus pipeline applies before any
  // content lands: parse each host's robots.txt into per-agent rule groups,
  // classify every URL by the longest matching path prefix. Both steps are
  // declarative plans (line explode + windows for grouping; an equi-join on
  // host + one argmax for matching), so compliance can be re-audited from
  // the stored rules at any time.
  // -----------------------------------------------------------------------

  /** Parse raw robots.txt bodies into the rule relation [[robotsFilter]]
    * consumes: (host, prefix, allow) — the Allow/Disallow lines of the
    * group(s) governing `userAgent`. RFC 9309 semantics on the happy path:
    * `#` comments stripped; groups are runs of consecutive `User-agent`
    * lines followed by their rules; the crawler obeys the exact-agent
    * group(s) when the host has any, else the `*` group(s); rules outside
    * any group are ignored; empty-value rules ("Disallow:" = no
    * restriction) contribute nothing. Percent-encoding equivalence and
    * `$`/`*` wildcards are out of scope (documented — prefixes match
    * literally).
    *
    * Scale shape: one line explode (rows ∝ robots bytes — tiny next to a
    * crawl), two windows partitioned by host for grouping, and
    * group-membership semi-joins on (host, grp) — all host-keyed.
    */
  def parseRobots(robots: DataFrame, hostCol: String, contentCol: String,
                  userAgent: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ua = userAgent.toLowerCase
    val lines = robots
      .select(lower(col(hostCol)).as("host"),
        posexplode(split(coalesce(col(contentCol), lit("")), "\n")).as(Seq("ln", "raw")))
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*$", "")))
      .filter(col("line") =!= "")
      .withColumn("dir", lower(trim(regexp_extract(col("line"), "^([^:]+):", 1))))
      .withColumn("v", trim(regexp_extract(col("line"), "^[^:]+:(.*)$", 1)))
      .filter(col("dir").isin("user-agent", "allow", "disallow"))
    val w = Window.partitionBy(col("host")).orderBy(col("ln"))
    val grouped = lines
      .withColumn("st", when(col("dir") === "user-agent" &&
        coalesce(lag(col("dir"), 1).over(w) =!= "user-agent", lit(true)), 1L)
        .otherwise(0L))
      .withColumn("grp", sum(col("st"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val agents = grouped.filter(col("dir") === "user-agent")
      .select(col("host"), col("grp"), lower(col("v")).as("agent"))
    val exactGroups = agents.filter(col("agent") === ua)
      .select("host", "grp").distinct()
    val starGroups = agents.filter(col("agent") === "*")
      .select("host", "grp").distinct()
    val chosen = exactGroups.unionByName(
      starGroups.join(exactGroups.select("host").distinct(), Seq("host"), "left_anti"))
    grouped
      .filter(col("dir").isin("allow", "disallow") && col("v") =!= "" && col("grp") > 0)
      .join(chosen, Seq("host", "grp"), "left_semi")
      .select(col("host"), col("v").as("prefix"), (col("dir") === "allow").as("allow"))
      .distinct()
  }

  /** Classify every URL against a parsed rule relation (host, prefix,
    * allow): RFC 9309 §2.2.2 — the LONGEST matching prefix governs; an
    * allow and disallow of equal length tie toward allow; no matching rule
    * (or no rules for the host) means allowed. Output: every INPUT column
    * plus (allowed, matched_prefix), matched_prefix NULL on default-allow
    * — one output row per input row (duplicate URLs keep their
    * multiplicity; a frontier DataFrame's other columns ride through).
    *
    * Scale shape: verdicts are computed once per DISTINCT url — one host
    * equi-join (rules are hosts-sized — broadcast when small, AQE
    * decides), one argmax aggregation keyed on the url — then a single
    * equi-join fans the verdict back onto the input; per-URL cost is its
    * host's rule count, never the global table.
    */
  def robotsFilter(urls: DataFrame, urlCol: String, rules: DataFrame): DataFrame = {
    val reserved = Seq("allowed", "matched_prefix").filter(urls.columns.contains)
    require(reserved.isEmpty,
      s"robotsFilter appends (allowed, matched_prefix); rename input column(s) " +
        s"${reserved.mkString(", ")} first or the output would be ambiguous")
    val parts = urls.select(col(urlCol)).distinct().select(col(urlCol),
        urlHost(col(urlCol)).as("host"),
        coalesce(nullif(regexp_extract(col(urlCol),
          "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(/[^?#]*)", 1), lit("")), lit("/"))
          .as("__path"))
    val verdicts = parts
      .join(rules.select(col("host"), col("prefix"), col("allow")), Seq("host"), "left")
      .withColumn("__m", col("prefix").isNotNull && col("__path").startsWith(col("prefix")))
      .groupBy(col(urlCol))
      .agg(max(when(col("__m"),
        struct(length(col("prefix")).as("l"),
          col("allow").cast("int").as("a"), col("prefix").as("p")))).as("__w"))
      .select(col(urlCol),
        coalesce(col("__w.a") === 1, lit(true)).as("allowed"),
        col("__w.p").as("matched_prefix"))
    // NULL urls never match the fan-back equi-join (null keys don't join):
    // coalesce restores the default-allow contract for them instead of
    // leaking allowed=NULL.
    urls.join(verdicts, Seq(urlCol), "left")
      .withColumn("allowed", coalesce(col("allowed"), lit(true)))
  }

  def blockByDomain(df: DataFrame, urlCol: Column,
                    blocked: Seq[String]): DataFrame =
    df.filter(!registeredDomain(urlHost(urlCol)).isin(blocked.map(_.toLowerCase): _*))
}
