package graft

import org.apache.spark.sql.functions._
import graft.functions.Enrich

/** user_agent + geoip goldens — /root/reference/tests/test_user_agent.py:6-12,
  * tests/test_geo.py:6-11.
  */
class EnrichSpec extends SparkSpec {
  import spark.implicits._

  test("user_agent golden (test_user_agent.py:6-12)") {
    val df = Seq((1, "Mozilla/5.0 (Windows NT 5.1; rv:11.0) Gecko/20100101 Firefox/11.0"))
      .toDF("foo", "useragent")
    val out = Enrich.userAgent(df, "useragent")
    assert(golden(out) ==
      "foo,useragent,os,browser,browser_version\r\n" +
        "1,Mozilla/5.0 (Windows NT 5.1; rv:11.0) Gecko/20100101 Firefox/11.0,Windows,Firefox,11.0\r\n")
  }

  test("user_agent families: Chrome not Safari, Edge not Chrome, IE via Trident") {
    val rows = Seq(
      ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36", "Macintosh", "Chrome"),
      ("Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91", "Windows", "Edge"),
      ("Mozilla/5.0 (compatible; MSIE 10.0; Windows NT 6.1; Trident/6.0)", "Windows", "Microsoft Internet Explorer"),
      ("curl/8.4.0", null, null)).toDF("useragent", "eos", "ebrowser")
    val out = Enrich.userAgent(rows, "useragent")
    assert(out.filter(!(col("os") <=> col("eos")) || !(col("browser") <=> col("ebrowser"))).count() == 0)
  }

  test("geoip_country_code golden incl. invalid IP (test_geo.py:6-11)") {
    val df = Seq(("Flo", "82.231.177.189"), ("Fla", "4.3.1.432")).toDF("name", "ip")
    val out = Enrich.geoipCountryCode(df, "ip")
      .select("name", "ip", "country_code").orderBy(desc("name"))
    assert(golden(out) ==
      "name,ip,country_code\r\nFlo,82.231.177.189,FR\r\nFla,4.3.1.432,\r\n")
  }

  test("geoip appends full geo columns with null-pad for unmatched (geoip.py:26-52)") {
    val df = Seq(("a", "8.8.8.8"), ("b", "1.2.3.4")).toDF("k", "ip")
    val out = Enrich.geoip(df, "ip")
    assert(out.columns.toSeq ==
      Seq("k", "ip", "country_code", "region_name", "city", "latitude", "longitude"))
    val g = out.filter(col("k") === "a").select("city").as[String].head()
    assert(g == "Mountain View")
    assert(out.filter(col("k") === "b").select("country_code").as[String].head() == null)
  }

  test("ipToLong validates octet ranges") {
    val df = Seq("1.2.3.4", "256.1.1.1", "a.b.c.d", "8.8.8.8").toDF("ip")
      .select(col("ip"), Enrich.ipToLong(col("ip")).as("x"))
    val m = df.collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(m("1.2.3.4").contains(16909060L))
    assert(m("256.1.1.1").isEmpty)
    assert(m("a.b.c.d").isEmpty)
    assert(m("8.8.8.8").contains(134744072L))
  }
}
