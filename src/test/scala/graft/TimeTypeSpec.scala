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

  test("primary_key_detect finds the leftmost all-distinct column (types.py:52-87)") {
    val df = Seq(("a", 1, 10), ("a", 2, 20), ("b", 3, 20)).toDF("dup", "pk", "dup2")
    assert(TypeDetect.primaryKeyDetect(df).contains("pk"))
    val none = Seq(("a", 1), ("a", 1)).toDF("x", "y")
    assert(TypeDetect.primaryKeyDetect(none).isEmpty)
  }
}
