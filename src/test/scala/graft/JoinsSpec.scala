package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins

/** As-of and range joins (composed operators). */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(("a", 5L, 100), ("a", 10L, 101), ("a", 1L, 102),
    ("a", 4L, 103), ("b", 7L, 104)).toDF("k", "t", "lv")
  private def right = Seq(("a", 4L, "x"), ("a", 9L, "y"), ("b", 8L, "z"))
    .toDF("k", "t", "rv")

  test("asof join: latest right at-or-before each left row, per key") {
    val out = Joins.asofJoin(left, right, "k", "t", "t", Seq("rv"))
    val m = out.select("lv", "rv").as[(Int, Option[String])].collect().toMap
    assert(m(100) == Some("x"))  // t=5 -> right t=4
    assert(m(101) == Some("y"))  // t=10 -> right t=9
    assert(m(102) == None)       // t=1 -> nothing before
    assert(m(103) == Some("x"))  // exact match t=4
    assert(m(104) == None)       // b: right at t=8 is after t=7
  }

  test("asof join respects tolerance") {
    val out = Joins.asofJoin(left, right, "k", "t", "t", Seq("rv"), tolerance = Some(0L))
    val m = out.select("lv", "rv").as[(Int, Option[String])].collect().toMap
    assert(m(103) == Some("x")) // exact match within tol 0
    assert(m(100) == None)      // distance 1 > 0
  }

  test("forward asof join: earliest right at-or-after each left row") {
    val out = Joins.asofJoin(left, right, "k", "t", "t", Seq("rv"),
      direction = "forward")
    val m = out.select("lv", "rv").as[(Int, Option[String])].collect().toMap
    assert(m(100) == Some("y"))  // t=5 -> next right t=9
    assert(m(101) == None)       // t=10 -> nothing after
    assert(m(102) == Some("x"))  // t=1 -> next right t=4
    assert(m(103) == Some("x"))  // exact match t=4 still matches forward
    assert(m(104) == Some("z"))  // b: t=7 -> right t=8
  }

  test("forward asof join respects tolerance") {
    val out = Joins.asofJoin(left, right, "k", "t", "t", Seq("rv"),
      tolerance = Some(1L), direction = "forward")
    val m = out.select("lv", "rv").as[(Int, Option[String])].collect().toMap
    assert(m(104) == Some("z")) // gap 1 within tol
    assert(m(100) == None)      // gap 4 > 1
  }

  test("asof join stays one-shuffle shaped (no join node, one window)") {
    val plan = Joins.asofJoin(left, right, "k", "t", "t", Seq("rv"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"))
    assert(plan.contains("Window"))
  }

  test("asof join keeps sub-second ordering for timestamp time columns") {
    val l = Seq((1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00.500")))
      .toDF("id", "t")
    val r = Seq(
      ("a1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00.400")),
      ("a2", java.sql.Timestamp.valueOf("2024-01-01 00:00:00.600")))
      .toDF("rv", "t").withColumn("k", lit(1))
    val out = Joins.asofJoin(l.withColumn("k", lit(1)), r, "k", "t", "t", Seq("rv"))
    // a plain seconds-granular cast would see all three at t=0 and pick a2
    assert(out.select("rv").as[String].head() == "a1")
  }

  test("range join buckets + residual filter match the theta semantics") {
    val points = Seq((1, 0.0), (2, 49.9), (3, 50.0), (4, 119.0), (5, 1500.0))
      .toDF("id", "v")
    val bands = Seq((0L, 50L, "low"), (50L, 120L, "mid"), (120L, 1000L, "high"))
      .toDF("s", "e", "band")
    val out = Joins.rangeJoin(points, "v", bands, "s", "e", bucketWidth = 50L)
    val m = out.select("id", "band").as[(Int, String)].collect().toMap
    assert(m == Map(1 -> "low", 2 -> "low", 3 -> "mid", 4 -> "mid"))
    // id 5 out of all ranges -> absent (inner semantics)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin")) // equi-join on bucket, not nested loop
  }

  test("intervalOverlapJoin equals the naive theta join; claim-bucket emits each pair once") {
    val l = Seq((1L, 0L, 100L), (2L, 250L, 260L), (3L, 90L, 310L))
      .toDF("lid", "ls", "le")
    val r = Seq((10L, 95L, 105L), (11L, 300L, 400L), (12L, 500L, 600L))
      .toDF("rid", "rs", "re")
    val out = Joins.intervalOverlapJoin(l, "ls", "le", r, "rs", "re", bucketWidth = 50L)
    val got = out.select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    // naive closed-interval overlap: (1,10), (3,10), (3,11) — and interval 3
    // spans 5 buckets overlapping 10's 3, yet each pair appears exactly once
    assert(got === Seq((1L, 10L), (3L, 10L), (3L, 11L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("CartesianProduct"))
  }

  test("intervalOverlapJoin: touching endpoints match, disjoint do not, point intervals work") {
    val l = Seq((1L, 10L, 20L), (2L, 30L, 30L)).toDF("lid", "ls", "le")
    val r = Seq((10L, 20L, 25L), (11L, 26L, 29L), (12L, 30L, 35L))
      .toDF("rid", "rs", "re")
    val got = Joins.intervalOverlapJoin(l, "ls", "le", r, "rs", "re", bucketWidth = 7L)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, 10L), (2L, 12L))) // closed: le==rs touches; 26-29 disjoint
  }

  test("intervalOverlapJoin drops set-empty reversed intervals instead of matching them") {
    val l = Seq((1L, 100L, 0L), (2L, 10L, 20L)).toDF("lid", "ls", "le")
    val r = Seq((10L, -5L, 200L)).toDF("rid", "rs", "re")
    val got = Joins.intervalOverlapJoin(l, "ls", "le", r, "rs", "re", bucketWidth = 50L)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(got === Seq((2L, 10L))) // the reversed [100, 0] emits nothing
  }

  test("broadcast hint is size-gated: a right side over the cap is left to the planner") {
    // Round 14: force-broadcasting a right side that GROWS with the data
    // cost q156 147 s vs 23.7 s shuffled at sf10 (BENCH_nb_ab_sf10.json) —
    // the hint must fire only under a probed row cap. Above the cap (and
    // with the planner threshold killed) the same query runs as a shuffle
    // equi-join with identical rows; maxBroadcastRows<=0 restores the
    // unconditional hint.
    val l = Seq((1L, 0L, 100L), (2L, 250L, 260L), (3L, 90L, 310L))
      .toDF("lid", "ls", "le")
    val r = Seq((10L, 95L, 105L), (11L, 300L, 400L), (12L, 500L, 600L))
      .toDF("rid", "rs", "re")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val gated = Joins.intervalOverlapJoin(l, "ls", "le", r, "rs", "re",
        bucketWidth = 50L, maxBroadcastRows = 1L)
      assert(gated.select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
        === Seq((1L, 10L), (3L, 10L), (3L, 11L)))
      val gatedPlan = gated.queryExecution.executedPlan.toString
      assert(!gatedPlan.contains("BroadcastHashJoin") &&
        !gatedPlan.contains("CartesianProduct"),
        s"over-cap right side still force-broadcast:\n$gatedPlan")
      val forced = Joins.rangeJoin(
        Seq((1, 0.0)).toDF("id", "v"), "v",
        Seq((0L, 50L, "low")).toDF("s", "e", "band"), "s", "e",
        bucketWidth = 50L, maxBroadcastRows = 0L)
      assert(forced.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "maxBroadcastRows<=0 no longer forces the hint")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }
}
