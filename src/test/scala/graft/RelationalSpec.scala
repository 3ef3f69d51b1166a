package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.BabeOps._
import graft.operators.{Grouping, OnError}
import graft.sources.Sources

/** Join / group / sort / limit goldens ported from
  * /root/reference/tests/test_join.py, test_group.py, test_sort.py.
  */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def facts = Seq(("Paris", "FR"), ("London", "UK"), ("Lyon", "FR"))
    .toDF("city", "country")
  private def dims = Seq(("FR", "France"), ("UK", "United Kingdom"))
    .toDF("country_code", "country_name")
  private def dimsBis = Seq(("FR", "France")).toDF("country_code", "country_name")

  test("join golden — matched (test_join.py:13-16)") {
    val out = facts.joinBabe(dims, "country", "country_code").orderBy("city")
    assert(golden(out) ==
      "city,country,country_name\r\nLondon,UK,United Kingdom\r\nLyon,FR,France\r\nParis,FR,France\r\n")
  }

  test("join ON_ERROR_NONE null-pads like left outer (test_join.py:18-21)") {
    val out = facts.joinBabe(dimsBis, "country", "country_code", OnError.NullPad)
      .orderBy("city")
    assert(golden(out) ==
      "city,country,country_name\r\nLondon,UK,\r\nLyon,FR,France\r\nParis,FR,France\r\n")
  }

  test("join Skip drops unmatched silently (join.py:42-43)") {
    val out = facts.joinBabe(dimsBis, "country", "country_code", OnError.Skip)
    assert(out.count() == 2)
  }

  test("join Fail raises on unmatched (join.py:40-41)") {
    intercept[Exception] {
      facts.joinBabe(dimsBis, "country", "country_code", OnError.Fail).count()
    }
  }

  test("join Fail passes fully matched rows in one probe pass") {
    val out = facts.joinBabe(dims, "country", "country_code", OnError.Fail).orderBy("city")
    assert(golden(out) ==
      "city,country,country_name\r\nLondon,UK,United Kingdom\r\nLyon,FR,France\r\nParis,FR,France\r\n")
  }

  test("join build side first-wins under buildOrder (join.py:14-16)") {
    val dup = Seq(("FR", "France", 1), ("FR", "Francia", 2)).toDF("country_code", "country_name", "ord")
    val out = facts.joinBabe(dup.select(col("country_code"), col("country_name"), col("ord")),
        "country", "country_code", OnError.Skip, buildOrder = Some(col("ord")))
      .filter(col("city") === "Paris")
    assert(out.select("country_name").as[String].collect().toSeq == Seq("France"))
  }

  test("two Warn-mode joins compose in one query (unique observe metric names)") {
    // Regression: a shared hardcoded metric name made CheckAnalysis reject
    // any plan with two default-mode joins ("Multiple definitions of
    // observed metrics").
    val cityDim = Seq(("Paris", "75"), ("London", "NW"), ("Lyon", "69"))
      .toDF("city_code", "zip")
    val out = facts.joinBabe(dims, "country", "country_code")
      .joinBabe(cityDim, "city", "city_code")
    assert(out.count() == 3)
  }

  test("group sum-by-key golden (test_group.py:7-10)") {
    val df = Seq((1, 2), (3, 4), (1, 4)).toDF("a", "b")
    val out = Grouping.group(df, Seq("a"), "b" -> sum(col("b")).cast(IntegerType)).orderBy("a")
    assert(golden(out) == "a,b\r\n1,6\r\n3,4\r\n")
  }

  test("group_all global reducer golden (test_group.py:12-15)") {
    val df = Seq((1, 2), (3, 4), (1, 4)).toDF("a", "b")
    val out = Grouping.groupAll(df, "max" -> max(col("b")))
    assert(golden(out) == "max\r\n4\r\n")
  }

  test("groupReduce streams whole groups to an arbitrary reducer (group.py:68-81)") {
    val df = Seq((1, 2), (3, 4), (1, 4)).toDF("a", "b")
    val schema = StructType(Seq(StructField("a", IntegerType), StructField("b", IntegerType)))
    val out = Grouping.groupReduce(df, Seq("a"), schema) { (k, rows) =>
      Seq(Row(k.getInt(0), rows.map(_.getInt(1)).sum))
    }.orderBy("a")
    assert(golden(out) == "a,b\r\n1,6\r\n3,4\r\n")
  }

  test("groupReduce can emit multiple rows per group") {
    val df = Seq((1, 2), (1, 4)).toDF("a", "b")
    val schema = StructType(Seq(StructField("a", IntegerType), StructField("b", IntegerType)))
    val out = Grouping.groupReduce(df, Seq("a"), schema) { (k, rows) =>
      rows.map(r => Row(k.getInt(0), r.getInt(1) * 10)).toSeq
    }
    assert(out.orderBy("b").as[(Int, Int)].collect().toSeq == Seq((1, 20), (1, 40)))
  }

  test("sort + head(1) finds the max row (test_sort.py:6-13 shape)") {
    val df = (0 to 10000).map(k => (k, -k)).toDF("k", "v")
    val out = df.sortBabe("v").headBabe(1, Seq(col("v")))
    assert(out.as[(Int, Int)].collect().toSeq == Seq((10000, -10000)))
  }

  test("maxN/minN top-k (minmax.py:19-45)") {
    val df = (1 to 100).map(k => (k, k % 10)).toDF("k", "m")
    assert(df.maxN("k", 3, Seq(col("k"))).as[(Int, Int)].collect().map(_._1).toSeq ==
      Seq(100, 99, 98))
    assert(df.minN("k", 3, Seq(col("k"))).as[(Int, Int)].collect().map(_._1).toSeq ==
      Seq(1, 2, 3))
  }

  test("skip drops the first n under the order (transform.py:158-171)") {
    val df = (1 to 10).toDF("k")
    assert(df.skipBabe(7, Seq(col("k"))).as[Int].collect().toSeq == Seq(8, 9, 10))
  }

  test("head per partition (transform.py:192-198)") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("b", 9)).toDF("p", "k")
    val out = df.headPerPartition(2, Seq("p"), Seq(col("k")))
    assert(out.orderBy("p", "k").as[(String, Int)].collect().toSeq ==
      Seq(("a", 1), ("a", 2), ("b", 9)))
  }

  test("funnel counts in-order steps greedily per key") {
    import graft.operators.Funnel
    val ev = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"), // full funnel
      (2L, 10L, "click"), (2L, 20L, "view"),                        // wrong order: view only
      (3L, 10L, "view"), (3L, 10L, "click"),                        // same-ts successor: no match
      (4L, 5L, "error")                                             // nothing
    ).toDF("u", "t", "e")
    val out = Funnel.funnelSteps(ev, "u", "t", "e", Seq("view", "click", "purchase"))
      .orderBy("u").as[(Long, Int)].collect().toSeq
    assert(out == Seq((1L, 3), (2L, 1), (3L, 1), (4L, 0)))
    assert(Funnel.converted(ev, "u", "t", "e", Seq("view", "click", "purchase"))
      .as[Long].collect().toSeq == Seq(1L))
  }

  test("concat = chained pull union (base.py:365-368)") {
    val a = Seq(1, 2).toDF("k")
    val b = Seq(3).toDF("k")
    assert(Sources.concat(Seq(a, b)).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }
}
