package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based corpus primitives. The built-in approximate aggregates
  * (approx_count_distinct = HLL++, percentile_approx = KLL-ish) already
  * cover cardinality and quantiles; what a 100 TB text pipeline additionally
  * needs is heavy hitters WITHOUT a full-cardinality shuffle: the vocabulary
  * of a web corpus has billions of distinct tokens, and `groupBy(term)`
  * shuffles all of them to count the top twenty.
  */
object Sketches {

  /** Exact global top-k items in two linear passes, never shuffling the full
    * item cardinality:
    *
    *  1. per-partition Misra-Gries summaries of bounded `capacity`
    *     (mapPartitions — genuinely imperative bounded-state logic), merged
    *     with a tiny groupBy: at most partitions×capacity rows ever reach
    *     the shuffle. MG guarantees any item with global frequency
    *     > N/capacity survives in at least one partition summary, so the
    *     merged candidate set contains every sufficiently-frequent item.
    *  2. exact counts restricted to the candidate set (broadcast semi-join
    *     on the scan — the aggregate only ever carries candidate items),
    *     then `ORDER BY cnt DESC, item` LIMIT k — a deterministic total
    *     order, so the returned set is unique.
    *
    * Counts of returned items are always exact (pass 2 recounts from the
    * raw data). The top-k SET is exact whenever the true k-th frequency
    * exceeds N/capacity — trivially satisfied on Zipfian token
    * distributions at moderate capacities; raise `capacity` to tighten the
    * bound (memory per task stays O(capacity)).
    */
  def topKExact(df: DataFrame, itemCol: Column, k: Int,
                capacity: Int = 4096): DataFrame = {
    require(k > 0 && capacity >= k, "need capacity >= k > 0")
    val items = df.select(itemCol.cast("string").as("item"))
      .filter(col("item").isNotNull)
    val spark = items.sparkSession
    import spark.implicits._
    // Each partition emits its MG summary plus ONE null-item row carrying
    // the processed-row count, so the true N comes out of the same scan —
    // needed below to make the containment guarantee checkable per row.
    val partials = items.as[String].mapPartitions { it =>
      val mg = scala.collection.mutable.HashMap.empty[String, Long]
      var processed = 0L
      while (it.hasNext) {
        val x = it.next()
        processed += 1L
        mg.get(x) match {
          case Some(c) => mg.update(x, c + 1L)
          case None =>
            if (mg.size < capacity) mg.update(x, 1L)
            else {
              // classic MG step: decrement every counter instead of
              // inserting; amortized O(1) — each decrement is paid for by
              // one earlier increment.
              mg.mapValuesInPlace((_, v) => v - 1L)
              mg.filterInPlace((_, v) => v > 0L)
            }
        }
      }
      mg.iterator.map { case (i, e) => (Option(i), e) } ++
        Iterator((Option.empty[String], processed))
    }.toDF("item", "est").localCheckpoint() // one scan feeds N + candidates
    val n = partials.filter(col("item").isNull)
      .agg(coalesce(sum("est"), lit(0L))).as[Long].head()
    val candidates = partials.filter(col("item").isNotNull)
      .groupBy("item").agg(sum("est")).select("item")
    // `exact_guaranteed`: cnt > N/capacity is the MG containment bound — a
    // row satisfying it PROVABLY belongs to the true top-k set; a false on
    // a returned row means the tail order below that count is unverified
    // (raise capacity). The guarantee is self-describing instead of silent.
    items.join(broadcast(candidates), Seq("item"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .withColumn("exact_guaranteed",
        col("cnt") > lit(n.toDouble / capacity))
      .orderBy(col("cnt").desc, col("item"))
      .limit(k)
  }

  // ----------------------------------------------------------------------
  // Count-min sketch (Cormode & Muthukrishnan 2005) — point-frequency
  // estimates in FIXED space: a depth x width counter grid where every item
  // increments one cell per row (salted md5 positions, the portable basis),
  // and an item's estimate is the MIN of its cells. Estimates never
  // undercount; overcount is bounded by 2N/width with prob 1 - 2^-depth.
  // The sketch is one aggregation with at most depth*width output rows —
  // unlike groupBy(term), nothing cardinality-sized ever shuffles, and
  // sketches of corpus shards MERGE by cell-wise addition (the same
  // groupBy), the property that makes them composable across days/sources.
  // ----------------------------------------------------------------------

  /** Build the (row, cell, cnt) grid over `itemCol`. At most depth*width
    * rows regardless of corpus cardinality; map-side combine does the heavy
    * lifting. NULL items are skipped (parity with count() semantics).
    *
    * Streaming-composable as-is: applied to a streaming frame this is a
    * bounded-state streaming aggregation (state = the grid, forever), so
    * the same expression maintains a LIVE sketch over an unbounded feed —
    * PipelineOpsSpec drives it from a MemoryStream and asserts batch parity.
    */
  def countMinSketch(df: DataFrame, itemCol: Column, depth: Int = 4,
                     width: Long = 1024L): DataFrame =
    df.select(itemCol.cast("string").as("item"))
      .filter(col("item").isNotNull)
      .select(posexplode(Sampling.saltedPositions(col("item"), depth, width)))
      .toDF("row", "cell")
      .groupBy("row", "cell").agg(count(lit(1)).as("cnt"))

  /** Point estimates for `queries` (a frame with an `item` string column)
    * against a built sketch: est = min over rows of the item's cell count
    * (0 when a cell was never touched). The sketch broadcasts (bounded
    * size); queries stay distributed.
    */
  def countMinEstimate(sketch: DataFrame, queries: DataFrame,
                       depth: Int = 4, width: Long = 1024L): DataFrame =
    queries.select(col("item").cast("string").as("item"))
      .select(col("item"),
        posexplode(Sampling.saltedPositions(col("item"), depth, width)))
      .toDF("item", "row", "cell")
      .join(broadcast(sketch), Seq("row", "cell"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  // ----------------------------------------------------------------------
  // Portable HyperLogLog (Flajolet et al. 2007) — the distributed
  // distinct-count workhorse, re-derived on the portable hash basis so the
  // whole sketch is ANSI-replayable (the built-in approx_count_distinct is
  // HLL++ but its registers are engine-internal). 2^p registers; each
  // item's 60-bit hash contributes its top p bits as the register index and
  // the position of the first 1-bit of the remainder as the rank; the
  // register keeps the max rank. One aggregation, <= 2^p output rows,
  // shard sketches merge by register-wise MAX.
  // ----------------------------------------------------------------------

  /** (register, max_rank) table of `itemCol` under 2^p registers. The rank
    * uses exact integer bit arithmetic: bitlen via the base-2 string, rank =
    * (60-p) - bitlen(remainder) + 1, so every engine agrees on every row.
    * Like the count-min grid, this is a bounded-state streaming aggregation
    * when applied to a streaming frame (state = 2^p registers, forever).
    */
  def hllRegisters(df: DataFrame, itemCol: Column, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p in [4,16], got $p")
    val rembits = 60 - p
    val rem = pmod(col("h"), lit(1L << rembits))
    val bitlen = when(rem === 0L, lit(0L))
      .otherwise(length(conv(rem, 10, 2)).cast("long"))
    df.select(itemCol.cast("string").as("i"))
      .filter(col("i").isNotNull)
      .select(Sampling.portableHash60(col("i")).as("h"))
      .select(expr(s"shiftright(h, $rembits)").as("register"),
        (lit(rembits.toLong) - bitlen + 1L).as("rank"))
      .groupBy("register").agg(max("rank").as("max_rank"))
  }

  /** The raw HLL cardinality estimate as one row:
    * (m, s_scaled, estimate). The harmonic sum is kept EXACT by scaling:
    * s_scaled = sum_j 2^(K - M_j) over all m registers with K = 62 - p
    * (untouched registers contribute 2^K) — pure BIGINT shifts, order-
    * independent — and only the final alpha*m^2*2^K / s_scaled division is
    * floating point, so the estimate is bit-identical on any engine.
    * K = 62 - p makes both bounds p-independent: the sum is at most
    * m * 2^K = 2^62 (no Long overflow at any admissible p), and the
    * smallest shift is K - (61 - p) = 1 (never negative). (Raw E without
    * the small/large-range corrections; at corpus scale the raw branch is
    * the one that fires.)
    */
  def hllEstimate(df: DataFrame, itemCol: Column, p: Int = 8): DataFrame = {
    val m = 1L << p
    val k = 62 - p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val regs = hllRegisters(df, itemCol, p)
    regs.agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($k - max_rank AS INT))")).as("s_seen"),
        count(lit(1)).as("m_seen"))
      .select(lit(m).as("m"),
        (col("s_seen") + (lit(m) - col("m_seen")) * lit(1L << k)).as("s_scaled"))
      .select(col("m"), col("s_scaled"),
        (lit(alpha * m * m) * lit((1L << k).toDouble) /
          col("s_scaled").cast("double")).as("estimate"))
  }
}
