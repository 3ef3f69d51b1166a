package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sketches, Skew}

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish corpus: item i appears ~N/i times — heavy head, long tail. */
  private def zipf(n: Int): Seq[String] =
    (1 to n).flatMap(i => Seq.fill(n / i)(s"w$i"))

  test("topKExact equals the exact groupBy top-k with capacity << distinct") {
    val data = zipf(400)
    val df = spark.sparkContext.parallelize(data, 8).toDF("term")
    val res = Sketches.topKExact(df, col("term"), k = 10, capacity = 32)
    val got = res.select("item", "cnt").as[(String, Long)].collect().toSeq
    // the guarantee flag is exactly the MG containment bound cnt > N/capacity
    // (sufficient, not necessary: unflagged tail rows may still be correct —
    // and here the full equality below proves they are)
    res.select("cnt", "exact_guaranteed").as[(Long, Boolean)].collect()
      .foreach { case (c, g) => assert(g == (c > data.length.toDouble / 32)) }
    val want = data.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case (t, c) => (t, c) }
      .sortBy { case (t, c) => (-c, t) }.take(10)
    assert(got == want)
  }

  test("counts of returned items are exact, not MG estimates") {
    val data = Seq.fill(1000)("hot") ++ zipf(50)
    val df = spark.sparkContext.parallelize(data, 4).toDF("t")
    val top = Sketches.topKExact(df, col("t"), k = 1, capacity = 8)
      .select("item", "cnt").as[(String, Long)].head()
    assert(top == (("hot", 1000L))) // zipf noise never contains "hot"
  }

  test("saltedJoin equals the plain inner join") {
    val large = (1 to 500).map(i => (i.toLong, i % 7, i * 2.0)).toDF("id", "k", "v")
    val small = (0 until 7).map(i => (i, s"dim$i")).toDF("k", "name")
    val salted = Skew.saltedJoin(large, small, "k", col("id"), salts = 4)
      .select("id", "k", "v", "name").orderBy("id")
    val plain = large.join(small, Seq("k")).select("id", "k", "v", "name").orderBy("id")
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("percentile_approx tracks the exact percentile within its accuracy contract") {
    // the 100 TB path: approx_percentile is a single-pass mergeable sketch;
    // assert it stays within rank-error of the exact interpolated value
    val vals = (1 to 10000).map(_.toDouble)
    val df = spark.sparkContext.parallelize(vals, 8).toDF("v")
    val (exact50, exact95) = df
      .agg(percentile(col("v"), lit(0.5)), percentile(col("v"), lit(0.95)))
      .as[(Double, Double)].head()
    val (a50, a95) = df
      .agg(percentile_approx(col("v"), lit(0.5), lit(1000)),
        percentile_approx(col("v"), lit(0.95), lit(1000)))
      .as[(Double, Double)].head()
    // accuracy=1000 → rank error <= n/1000 = 10 ranks = 10.0 in value space
    assert(math.abs(a50 - exact50) <= 20.0 && math.abs(a95 - exact95) <= 20.0)
    assert(exact50 == 5000.5 && exact95 == 9500.05)
  }

  test("approx_count_distinct stays within its relative-error contract") {
    val df = spark.sparkContext.parallelize((1 to 50000).map(i => s"u$i"), 8).toDF("u")
    val approx = df.agg(approx_count_distinct(col("u"), 0.02)).as[Long].head()
    assert(math.abs(approx - 50000L) <= 50000L * 0.06)
  }

  test("saltedJoin drops large-side keys missing from the small side (inner)") {
    val large = Seq((1L, 1), (2L, 99)).toDF("id", "k")
    val small = Seq((1, "a")).toDF("k", "name")
    val rows = Skew.saltedJoin(large, small, "k", col("id"), salts = 3).collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("id") == 1L)
  }

  test("count-min never undercounts and is exact at generous width") {
    // Zipf-ish multiset: item-i appears i times
    val items = (1 to 50).flatMap(i => Seq.fill(i)(s"w$i"))
    val df = spark.sparkContext.parallelize(items, 4).toDF("item")
    val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // tight width (visible collisions): est >= exact for EVERY item
    val tight = Sketches.countMinEstimate(
        Sketches.countMinSketch(df, col("item"), depth = 4, width = 16L),
        df.distinct(), depth = 4, width = 16L)
      .as[(String, Long)].collect().toMap
    assert(exact.forall { case (k, v) => tight(k) >= v })
    // generous width: no row of the grid collides -> estimates are exact
    val wide = Sketches.countMinEstimate(
        Sketches.countMinSketch(df, col("item"), depth = 4, width = 65536L),
        df.distinct(), depth = 4, width = 65536L)
      .as[(String, Long)].collect().toMap
    assert(wide == exact)
  }

  test("count-min shard sketches merge by cell-wise addition") {
    val a = spark.sparkContext.parallelize(Seq("x", "x", "y"), 2).toDF("item")
    val b = spark.sparkContext.parallelize(Seq("x", "z"), 2).toDF("item")
    val merged = Sketches.countMinSketch(a, col("item"), 4, 64L)
      .unionByName(Sketches.countMinSketch(b, col("item"), 4, 64L))
      .groupBy("row", "cell").agg(sum("cnt").as("cnt"))
    val whole = Sketches.countMinSketch(a.unionByName(b), col("item"), 4, 64L)
    assert(merged.orderBy("row", "cell").collect().toSeq ==
      whole.orderBy("row", "cell").collect().toSeq)
  }

  test("HLL scaling holds across the admissible p range (no overflow, no negative shift)") {
    val df = spark.sparkContext.parallelize((1 to 5000).map(i => s"v$i"), 4).toDF("u")
    for (p <- Seq(4, 6, 10, 12, 16)) {
      val r = Sketches.hllEstimate(df, col("u"), p = p).head()
      val s = r.getAs[Long]("s_scaled")
      assert(s > 0L, s"p=$p: harmonic sum wrapped negative: $s")
      val est = r.getAs[Double]("estimate")
      assert(est > 0.0 && !est.isInfinite, s"p=$p: estimate $est")
    }
  }

  test("portable HLL estimate lands within the standard error envelope") {
    val n = 20000
    val df = spark.sparkContext.parallelize((1 to n).map(i => s"item$i"), 8).toDF("u")
    val row = Sketches.hllEstimate(df, col("u"), p = 8).head()
    val est = row.getAs[Double]("estimate")
    // sigma = 1.04/sqrt(256) ~ 6.5%; allow 4 sigma
    assert(math.abs(est - n) < n * 0.26, s"estimate $est vs $n")
    // determinism: the whole sketch re-derives bit-for-bit
    val again = Sketches.hllEstimate(df, col("u"), p = 8).head()
    assert(again.getAs[Long]("s_scaled") == row.getAs[Long]("s_scaled"))
    assert(again.getAs[Double]("estimate") == est)
  }

  test("keySkewProfile: exact counts, shares, and mean-relative skew factor") {
    // 'hot' owns 8 of 10 rows over a 3-key domain: mean = 10 div 3 = 3,
    // so skew_x100(hot) = 800 div 3 = 266 and share_bp = 8000
    val rows = (Seq.fill(8)("hot") ++ Seq("a", "b")).map(Tuple1(_))
      .toDF("k")
    val out = Skew.keySkewProfile(rows, col("k"), topN = 2)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("hot", 8L, 10L, 3L, 8000L, 266L),
      ("a", 1L, 10L, 3L, 1000L, 33L))) // tie with 'b' broken by key asc
  }
}
