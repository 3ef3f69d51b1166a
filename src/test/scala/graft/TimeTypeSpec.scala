package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{TimeParse, TypeDetect}

/** typedetect / parse_time / primary_key_detect —
  * /root/reference/tests/test_transform.py:38-44, 174-180, types.py.
  */
class TimeTypeSpec extends SparkSpec {
  import spark.implicits._

  test("typedetect narrows all-int and all-float columns (types.py:33-44)") {
    val df = Seq(("1", "2.5", "x"), ("3", "4.0", "y")).toDF("i", "f", "s")
    val out = TypeDetect(df)
    assert(out.schema("i").dataType == LongType)
    assert(out.schema("f").dataType == DoubleType)
    assert(out.schema("s").dataType == StringType)
    assert(out.orderBy("i").select("i").as[Long].collect().toSeq == Seq(1L, 3L))
  }

  test("typedetect narrows dates and datetimes (types.py:8-14)") {
    val df = Seq(("2012-04-03", "2012-04-03 00:33"), ("2011-01-15", "2011-01-15 10:00"))
      .toDF("d", "dt")
    val out = TypeDetect(df)
    assert(out.schema("d").dataType == DateType)
    assert(out.schema("dt").dataType == TimestampType)
  }

  test("typedetect does NOT narrow regex-passing but unparseable dates") {
    // '99-99-99' passes the date regex but fails the cast — the column must
    // stay string rather than silently nulling (VERDICT.md wrong #9).
    val df = Seq("99-99-99", "2012-04-03").toDF("d")
    val out = TypeDetect(df)
    assert(out.schema("d").dataType == StringType)
  }

  test("typedetect mixed int/float column becomes double") {
    val df = Seq("1", "2.5").toDF("n")
    assert(TypeDetect(df).schema("n").dataType == DoubleType)
  }

  test("parse_time CET->GMT golden (test_transform.py:174-180)") {
    val df = Seq((1, "2012-04-03 00:33")).toDF("foo", "time")
    val out = TimeParse(df, "time", inputTimezone = "CET", outputTimezone = "GMT",
      outputField = "t")
    val r = out.select(
      date_format(col("t_time"), "yyyy-MM-dd HH:mm:ss"),
      col("t_date").cast(StringType), col("t_hour")).as[(String, String, Int)].head()
    assert(r == ("2012-04-02 22:33:00", "2012-04-02", 22))
  }

  test("parse_time handles the reference's multi-format matrix (timeparse.py:7-17)") {
    val df = Seq("2012/04/03", "3-4-2012", "2012-04-03 10:20:30").toDF("s")
    val out = TimeParse(df, "s")
    assert(out.filter(col("t_time").isNull).count() == 0)
  }

  test("parse_time kernel fast path has exact parity with the formatter cascade") {
    // The three-way dispatch (Kernels.parseMultiTs -> compute / NULL /
    // fall back) must be indistinguishable from the pure coalesce
    // formulation on EVERY input. Cases cover: all 9 canonical formats,
    // separator variants, day-first vs year-first ambiguity, impossible
    // calendar days (strict resolver), leap years, field-width oddities
    // that must route to the formatter (3/5-digit fields, padded days,
    // signs, fractions != 6 digits), whitespace padding, and garbage.
    val cases = Seq(
      "2012-04-03 10:20:30", "2012-4-3 1:02", "2012-04-03 7",
      "2012/04/03", "2012,04,03", "2012-04-03T10:20:30",
      "3-4-2012", "03-04-2012 23:59:59", "31-12-1999 23:59",
      "2012-04-03 10:20:30.123456", "2012-04-03 10:20:30.123",
      "2020-02-29", "2019-02-29", "1900-02-29", "2000-02-29",
      "31-4-2021", "29-2-2021", "0-1-2020", "2020-0-1", "2020-1-0",
      "2020-13-05", "2020-12-32", "32-1-2020", "0001-01-01",
      "9999-12-31 23:59:59", "0000-01-01", "12020-1-1", "+2020-1-1",
      "020-1-1", "2020-1-0031", "2020-001-1", "2020-1-1 023:00",
      "2020-1-1 24:00", "2020-1-1 5:3", "2020-1-1 05:03:1",
      "2020-1-1 05:03:60", " 2012-04-03", "2012-04-03 ", "  ",
      "2012-04-03  10:20", "hello", "epoch", "now", "today", "123",
      "2012.04.03", "2012-04", "2012-04-03-10", "2012-04-03 10:20:30.1234567",
      "1-1-1111 1", "11-11-1111 11:11:11", "2-29-2020", "29-2-2020")
    val df = cases.toDF("s")
    val both = df.select(
      col("s"),
      TimeParse.parseExpr(col("s")).cast(StringType).as("fast"),
      TimeParse.formatterExpr(col("s")).cast(StringType).as("ref"))
    val diff = both.filter(!(col("fast") <=> col("ref"))).collect()
    assert(diff.isEmpty, s"kernel/formatter divergence: ${diff.mkString("; ")}")
    // and the fast path must actually fire on canonical data: certified
    // rows return real micros, not the fallback sentinel
    val k = df.select(graft.expressions.GraftFunctions.multiTsMicros(col("s")).as("k"))
      .filter(col("k") > lit(Long.MinValue + 1)).count()
    assert(k >= 15, s"fast path fired on only $k rows")
  }

  test("parse_time kernel parity on a CET (DST-shifting) session zone") {
    // gap/overlap resolution must match the formatter's ZonedDateTime
    // rules; 2021-03-28 02:30 does not exist in CET, 2021-10-31 02:30
    // happens twice.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Europe/Paris")
    try {
      val cases = Seq(
        "2021-03-28 02:30:00", "2021-10-31 02:30:00", "2021-03-28 01:59:59",
        "2021-03-28 03:00:00", "2012-04-03 10:20:30", "3-4-2012", "0001-01-01")
      val both = cases.toDF("s").select(
        TimeParse.parseExpr(col("s")).cast(LongType).as("fast"),
        TimeParse.formatterExpr(col("s")).cast(LongType).as("ref"))
      val diff = both.filter(!(col("fast") <=> col("ref"))).collect()
      assert(diff.isEmpty, s"zone divergence: ${diff.mkString("; ")}")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("primary_key_detect finds the leftmost all-distinct column (types.py:52-87)") {
    val df = Seq(("a", 1, 10), ("a", 2, 20), ("b", 3, 20)).toDF("dup", "pk", "dup2")
    assert(TypeDetect.primaryKeyDetect(df).contains("pk"))
    val none = Seq(("a", 1), ("a", 1)).toDF("x", "y")
    assert(TypeDetect.primaryKeyDetect(none).isEmpty)
  }
}
