package graft

import org.apache.spark.sql.functions._
import graft.operators.BabeOps._

/** Pivot / unpivot / transpose / windowMap goldens ported from
  * /root/reference/pivot_tests.py and tests/test_transform.py.
  */
class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  test("pivot golden with hole (pivot_tests.py:9-23)") {
    val df = Seq(
      (0, "A", "B", 0, 2, 3),
      (1, "C", "D", 1, 4, 5),
      (2, "A", "B", 1, 4, 5),
      (3, "C", "E", 1, 4, 5),
      (4, "C", "E", 0, 7, 8)).toDF("idx", "a", "b", "c", "d", "e")
    val out = df.pivotBabe(Seq("a", "b"), "c", col("idx"), Seq("d", "e"))
      .orderBy("a", "b")
    // reference output columns: a,b,d-0,e-0,d-1,e-1 (first-seen pivot order)
    assert(out.columns.toSeq == Seq("a", "b", "d-0", "e-0", "d-1", "e-1"))
    assert(golden(out) ==
      "a,b,d-0,e-0,d-1,e-1\r\nA,B,2,3,4,5\r\nC,D,,,4,5\r\nC,E,7,8,4,5\r\n")
  }

  test("pivot keeps the LAST row per (group, value) (pivot.py:70-77)") {
    val df = Seq((0, "A", 0, 1), (1, "A", 0, 9)).toDF("idx", "g", "c", "d")
    val out = df.pivotBabe(Seq("g"), "c", col("idx"), Seq("d"))
    assert(out.select("d-0").as[Int].collect().toSeq == Seq(9))
  }

  test("unpivot golden (pivot_tests.py:25-37)") {
    val df = Seq(("Dou", "Flo", 3, 5), ("Doe", "John", 7, 8))
      .toDF("name", "firstname", "Jan", "Feb")
    val out = df.unpivotBabe(Seq("name", "firstname"), Seq("Jan", "Feb"), "date", "value")
      .orderBy(desc("name"), col("date").desc)
    assert(golden(out) ==
      "name,firstname,date,value\r\nDou,Flo,Jan,3\r\nDou,Flo,Feb,5\r\nDoe,John,Jan,7\r\nDoe,John,Feb,8\r\n")
  }

  test("transpose golden (test_transform.py:21-25 shape)") {
    val df = Seq(("PARIS", "p1", "p2"), ("LONDON", "l1", "l2")).toDF("city", "b", "c")
    val out = df.transposeBabe("city")
    assert(out.columns.toSeq == Seq("field", "PARIS", "LONDON"))
    assert(golden(out.orderBy("field")) ==
      "field,PARIS,LONDON\r\nb,p1,l1\r\nc,p2,l2\r\n")
  }

  test("transpose guards against large inputs") {
    val df = (1 to 100).map(k => (k.toString, k)).toDF("id", "v")
    intercept[IllegalArgumentException] { df.transposeBabe("id", maxRows = 10) }
  }

  test("windowMap trailing-3 running sum golden (test_transform.py:130-134)") {
    val df = (1 to 7).toDF("a")
    val out = df.windowMap(3, Seq(col("a")), "a2" -> (w => sum(col("a")).over(w)))
      .select(col("a2").as("a")).orderBy("a")
    assert(golden(out) == "a\r\n1\r\n3\r\n6\r\n9\r\n12\r\n15\r\n18\r\n")
  }

  test("windowMapGlobal matches the single-partition global window") {
    val df = (1 to 5000).map(k => (k, k % 97)).toDF("k", "v")
    val viaGlobal = df.windowMap(7, Seq(col("k")), "rs" -> (w => sum(col("v")).over(w)))
      .orderBy("k").select("k", "rs").as[(Int, Long)].collect().toSeq
    val viaTwoPass = df.windowMapGlobal(7, col("k"), "rs" -> (w => sum(col("v")).over(w)))
      .orderBy("k").select("k", "rs").as[(Int, Long)].collect().toSeq
    assert(viaTwoPass == viaGlobal)
    // and it must actually distribute: >1 partition before the window
    assert(df.repartitionByRange(8, col("k")).rdd.getNumPartitions > 1)
  }

  test("windowMapGlobal is exact when range partitions are shorter than n-1") {
    // 10 rows over 4 shuffle partitions → every partition holds < n-1 = 4
    // rows; naive predecessor-tail borrowing truncates frames here.
    val df = (1 to 10).map(k => (k, k)).toDF("k", "v")
    val expected = df.windowMap(5, Seq(col("k")), "rs" -> (w => sum(col("v")).over(w)))
      .orderBy("k").select("k", "rs").as[(Int, Long)].collect().toSeq
    val got = df.windowMapGlobal(5, col("k"), "rs" -> (w => sum(col("v")).over(w)))
      .orderBy("k").select("k", "rs").as[(Int, Long)].collect().toSeq
    assert(got == expected)
  }

  test("windowMapGlobal on an empty input keeps the output shape") {
    val df = spark.emptyDataset[(Int, Int)].toDF("k", "v")
    val out = df.windowMapGlobal(3, col("k"), "rs" -> (w => sum(col("v")).over(w)))
    assert(out.columns.toSeq == Seq("k", "v", "rs"))
    assert(out.count() == 0)
  }

  test("windowMapGlobal leaves nothing in the session cache across calls") {
    val df = (1 to 100).map(k => (k, 1)).toDF("k", "v")
    df.windowMapGlobal(4, col("k"), "rs" -> (w => sum(col("v")).over(w))).count()
    df.windowMapGlobal(4, col("k"), "rs" -> (w => sum(col("v")).over(w))).count()
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("pivot fails fast on a high-cardinality pivot column") {
    val df = (1 to 100).map(k => ("g", s"v$k", k, k)).toDF("g", "c", "idx", "d")
    intercept[IllegalArgumentException] {
      df.pivotBabe(Seq("g"), "c", col("idx"), Seq("d"), maxValues = 10)
    }
  }

  test("windowMapBy resets per partition (transform.py per-substream frame)") {
    val df = Seq(("x", 1, 1), ("x", 2, 2), ("y", 3, 5)).toDF("p", "o", "v")
    val out = df.windowMapBy(2, Seq("p"), Seq(col("o")), "rs" -> (w => sum(col("v")).over(w)))
    assert(out.orderBy("o").select("rs").as[Long].collect().toSeq == Seq(1L, 3L, 5L))
  }
}
