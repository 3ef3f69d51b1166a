package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.BabeOps._
import graft.operators.KeyNormalize

/** Projections, filters, dedup, split — goldens ported from
  * /root/reference/tests/test_base.py and test_transform.py.
  */
class CoreOpsSpec extends SparkSpec {
  import spark.implicits._

  test("keynormalize matches the reference (test_base.py:11-12)") {
    // reference: keynormalize('Web Site') == 'Web_Site'
    assert(KeyNormalize("Web Site") == "Web_Site")
    assert(KeyNormalize("a-b.c") == "a_b_c")
    assert(KeyNormalize("1col") == "d_1col")
    assert(KeyNormalize("") == "_")
  }

  test("filterColumns keep/remove (transform.py:244-259)") {
    val df = Seq((1, 2, 3)).toDF("a", "b", "c")
    assert(df.filterColumns(keep = Seq("a", "c")).columns.toSeq == Seq("a", "c"))
    assert(df.filterColumns(remove = Seq("b")).columns.toSeq == Seq("a", "c"))
  }

  test("rename golden (test_transform.py:125-127)") {
    val df = Seq((1, 2), (3, 4), (1, 4)).toDF("a", "b")
    val out = df.renameColumns("a" -> "c").orderBy("c", "b")
    assert(golden(out) == "c,b\r\n1,2\r\n1,4\r\n3,4\r\n")
  }

  test("replace value in chosen fields (transform.py:222-241)") {
    val df = Seq(("x", "x"), ("y", "x")).toDF("a", "b")
    val out = df.replaceValue("x", "z", fields = Seq("a")).orderBy("a")
    assert(golden(out) == "a,b\r\ny,x\r\nz,x\r\n")
  }

  test("replace_in_string is literal and null-safe (transform.py:98-109)") {
    val df = Seq(Some("a.b.c"), None).toDF("s")
    val out = df.replaceInString(".", "-", "s")
    assert(out.orderBy(col("s").asc_nulls_first).as[Option[String]].collect().toSeq ==
      Seq(None, Some("a-b-c")))
  }

  test("insert_rows appends literals (transform.py:455-470)") {
    val df = Seq((1, "a")).toDF("k", "v")
    val out = df.insertRows(Seq(Row(2, "b"))).orderBy("k")
    assert(golden(out) == "k,v\r\n1,a\r\n2,b\r\n")
  }

  test("filter_values conjunction (transform.py:262-275)") {
    val df = Seq((1, "a"), (1, "b"), (2, "a")).toDF("k", "v")
    assert(df.filterValues("k" -> 1, "v" -> "a").count() == 1)
  }

  test("filter_out_null_values (transform.py:278-291)") {
    val df = Seq((Some(1), "a"), (None, "b")).toDF("k", "v")
    assert(df.filterOutNullValues(Seq("k")).count() == 1)
  }

  test("filter_by_regexp anchors at start like re.match (transform.py:305-315)") {
    val df = Seq("abc", "zabc", "abd").toDF("s")
    val kept = df.filterByRegexp("s", "ab").as[String].collect().toSet
    assert(kept == Set("abc", "abd")) // 'zabc' matches contains but not match-at-start
  }

  test("dedup all-columns golden (test_transform.py:149-152)") {
    val s2 = Seq((1, "coucou", 4), (1, "coucou", 4), (3, "coucou", 6), (4, "tutu", 4))
      .toDF("id", "value", "s")
    val out = s2.dedup().orderBy("id")
    assert(golden(out) == "id,value,s\r\n1,coucou,4\r\n3,coucou,6\r\n4,tutu,4\r\n")
  }

  test("dedup by fields keeps first under the order column (test_transform.py:159-162)") {
    val s = Seq((1, "coucou", 4), (2, "blabla", 5), (3, "coucou", 6), (4, "tutu", 4))
      .toDF("id", "value", "s")
    val out = s.dedupByFields(Seq("value"), col("id")).orderBy("id")
    assert(golden(out) == "id,value,s\r\n1,coucou,4\r\n2,blabla,5\r\n4,tutu,4\r\n")
  }

  test("split explodes on separator (test_transform.py:7-19)") {
    val df = Seq((1, "3:4")).toDF("a", "b")
    val out = df.splitField("b", ":").orderBy("b")
    assert(golden(out) == "a,b\r\n1,3\r\n1,4\r\n")
  }

  test("profile: per-column n / nulls / distinct / native-order min-max") {
    import org.apache.spark.sql.functions.col
    val df = Seq((Some(10L), "b"), (Some(2L), "a"), (None, "a"))
      .toDF("num", "s")
    val p = graft.operators.Profile.profile(df)
      .orderBy("column").collect().map(_.toSeq).toSeq
    // native numeric order: min 2, max 10 (lexicographic would say "10" < "2")
    assert(p == Seq(
      Seq("num", 3L, 1L, 2L, "2", "10"),
      Seq("s", 3L, 0L, 2L, "a", "b")))
    // approx variant keeps the same shape with sketched distincts
    val a = graft.operators.Profile.profile(df, Seq("s"), approxDistinct = true)
      .select("n_distinct").as[Long].head()
    assert(a >= 1L && a <= 3L)
  }
}
