package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Joins Spark lacks as primitives, composed from existing operators per the
  * preference order (compose > custom Expression > custom plan): as-of join
  * and range join. Neither needs a custom SparkPlan — both reduce to one
  * shuffle with the right encoding, which is the 100 TB-correct shape.
  */
object Joins {

  /** Backward as-of join: for every left row, the LATEST right row with
    * `rightTime <= leftTime` within the same `key` (optionally within
    * `tolerance`). The classic time-series enrichment (pandas merge_asof,
    * kdb aj) — Spark has no primitive, and the naive
    * `join + filter + row_number` explodes to a near-cross-join per key.
    *
    * Composition: tag and UNION both sides, sort per key by (time, side)
    * — right rows first on equal timestamps so exact matches are visible —
    * then a running `last(non-null)` window carries the most recent right
    * payload onto each left row. ONE shuffle on the key, no pair blow-up;
    * rows per task = |left|+|right| of that key range.
    *
    * Output: all left columns + the right payload columns (null-padded when
    * nothing precedes, or the match is outside `tolerance`).
    */
  /** Numeric time axis: timestamps become epoch MICROS (a plain long cast
    * would truncate to seconds and break sub-second ordering/tolerance).
    */
  private def timeAxis(df: DataFrame, c: String): Column = df.schema(c).dataType match {
    case TimestampType | TimestampNTZType => unix_micros(col(c).cast(TimestampType))
    case DateType                         => unix_date(col(c)).cast(LongType)
    case _                                => col(c).cast(LongType)
  }

  /** `direction`: "backward" (latest right with rightTime <= leftTime — the
    * default, pandas/kdb semantics) or "forward" (EARLIEST right with
    * rightTime >= leftTime). Forward is the same one-shuffle composition on
    * a NEGATED time axis: ordering flips, equality still matches, and the
    * tolerance check `t - rt <= tol` on negated values is exactly
    * `rt - t <= tol` — no second code path to maintain.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               key: String, leftTime: String, rightTime: String,
               payload: Seq[String],
               tolerance: Option[Long] = None,
               direction: String = "backward"): DataFrame = {
    val sign = direction match {
      case "backward" => lit(1L)
      case "forward"  => lit(-1L)
      case other => throw new IllegalArgumentException(
        s"asofJoin: direction must be backward|forward, got '$other'")
    }
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", timeAxis(left, leftTime) * sign)
      .withColumn("__src", lit(1))
      .withColumn("__rv", lit(null).cast(StructType(
        StructField("__rt", LongType) +:
          payload.map(p => right.schema(p).copy(name = p)))))
    val r = right.select(
      (Seq(col(key),
        (timeAxis(right, rightTime) * sign).as("__t"),
        lit(0).as("__src"),
        struct(((timeAxis(right, rightTime) * sign).as("__rt") +: payload.map(col)): _*).as("__rv")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val unioned = l.unionByName(r.select(l.columns.map(col).toIndexedSeq: _*))
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
    val within = tolerance match {
      case Some(tol) => carried.withColumn("__match",
        when(col("__t") - col("__match").getField("__rt") <= tol, col("__match")))
      case None => carried
    }
    within.select(leftCols.map(col) ++
      payload.map(p => col("__match").getField(p).as(p)): _*)
  }

  /** Broadcast `r` only when a capped probe count says the EXPLODED right
    * side is genuinely dimension-sized; above the cap, leave the join to
    * the planner (SMJ/shuffled-hash). The hint was unconditional until a
    * measured regression: q156's incident side grows WITH the data (1.98M
    * error events at sf10, ~4M exploded bucket rows), and force-broadcasting
    * it cost 147 s vs 23.7 s shuffled (isolated min-of-2, BENCH_nb_ab_sf10
    * .json) — a hint that only ever helps on dimension-sized sides must not
    * fire on a side that scales. `maxRows <= 0` restores the unconditional
    * hint (explicit opt-in); the probe is a limit-capped count, so its cost
    * is bounded by the cap, not the relation.
    */
  private def gatedBroadcast(r: DataFrame, want: Boolean, maxRows: Long,
                             what: String): DataFrame =
    if (!want || Tuning.noBroadcast) r
    else if (maxRows <= 0) broadcast(r)
    else {
      val cap = math.min(maxRows + 1, Int.MaxValue.toLong).toInt.max(1)
      val n = r.limit(cap).count()
      if (n > maxRows) {
        System.err.println(s"[$what] exploded right side has >$maxRows rows; " +
          "leaving the join to the planner (pass maxBroadcastRows<=0 to force broadcast)")
        r
      } else broadcast(r)
    }

  /** Interval-overlap join: pairs of (left, right) rows whose CLOSED
    * integer intervals [lsCol, leCol] and [rsCol, reCol] overlap
    * (ls <= re && rs <= le) — sessions × incident windows, spans × spans.
    * The generalization of [[rangeJoin]] from points to intervals, with the
    * same equi-join trick: both sides explode to the fixed-width buckets
    * they cover, candidates meet on the bucket id, and each overlapping
    * pair is kept EXACTLY ONCE by the claim-bucket rule — only the bucket
    * containing max(ls, rs), the overlap's left edge, emits it — so no
    * distinct pass over the (wide) output is needed.
    *
    * Scale: per-side blowup = interval length / bucketWidth (pick the width
    * near the typical interval length, as with rangeJoin); the join is a
    * plain hash equi-join — broadcast when the right side is
    * dimension-sized, shuffled otherwise. Column names must be disjoint
    * (standard join contract).
    *
    * EAGER when `broadcastRight && maxBroadcastRows > 0` (the default):
    * CONSTRUCTING the join runs the size probe — one bounded count job
    * scanning at most maxBroadcastRows+1 exploded right rows — and the
    * exploded right lineage is then recomputed at execution. On an
    * expensive right-side lineage (or when constructing the same join
    * repeatedly), pre-materialize the right side first, or pass
    * `maxBroadcastRows <= 0` to skip the probe and force the hint
    * unconditionally (the pre-round-14 behavior — only safe when the
    * right side provably stays dimension-sized as the data grows).
    */
  def intervalOverlapJoin(left: DataFrame, lsCol: String, leCol: String,
                          right: DataFrame, rsCol: String, reCol: String,
                          bucketWidth: Long,
                          broadcastRight: Boolean = true,
                          maxBroadcastRows: Long = 1000000L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(!left.columns.contains("__b") && !right.columns.contains("__b"),
      "intervalOverlapJoin: '__b' is reserved for the bucket key")
    def buckets(s: Column, e: Column): Column =
      sequence(floor(s / bucketWidth).cast(LongType),
        floor(e / bucketWidth).cast(LongType))
    // a reversed interval (s > e) is empty as a set: it overlaps nothing,
    // so drop it here — without this, sequence() silently descends and the
    // overlap filter can still emit pairs for it
    val l = left.filter(col(lsCol) <= col(leCol))
      .withColumn("__b", explode(buckets(col(lsCol), col(leCol))))
    val r0 = right.filter(col(rsCol) <= col(reCol))
      .withColumn("__b", explode(buckets(col(rsCol), col(reCol))))
    val r = gatedBroadcast(r0, broadcastRight, maxBroadcastRows, "intervalOverlapJoin")
    l.join(r, Seq("__b"))
      .filter(col(lsCol) <= col(reCol) && col(rsCol) <= col(leCol))
      .filter(floor(greatest(col(lsCol), col(rsCol)) / bucketWidth).cast(LongType) === col("__b"))
      .drop("__b")
  }

  /** Point-in-range join: left rows whose `valueCol` falls in a right-side
    * [start, end) interval. The naive theta-join is a nested loop; encoding
    * ranges into fixed-width buckets makes it an EQUI-join on the bucket id
    * (+ residual range filter) — a broadcast hash join for dimension-sized
    * range tables (the geoip /8 trick, generalized). Ranges spanning
    * multiple buckets are exploded once on the (small) right side.
    *
    * Same eager size-probe contract as [[intervalOverlapJoin]]: with the
    * default `maxBroadcastRows > 0`, construction runs one bounded count
    * job over the exploded right side and execution recomputes that
    * lineage — pre-materialize an expensive right side, or pass
    * `maxBroadcastRows <= 0` to force the unconditional hint.
    */
  def rangeJoin(left: DataFrame, valueCol: String,
                right: DataFrame, startCol: String, endCol: String,
                bucketWidth: Long, broadcastRight: Boolean = true,
                maxBroadcastRows: Long = 1000000L): DataFrame = {
    val r = right
      .withColumn("__b", explode(sequence(
        floor(col(startCol) / bucketWidth).cast(LongType),
        floor((col(endCol) - 1) / bucketWidth).cast(LongType))))
    val rSide = gatedBroadcast(r, broadcastRight, maxBroadcastRows, "rangeJoin")
    left.withColumn("__b", floor(col(valueCol) / bucketWidth).cast(LongType))
      .join(rSide, Seq("__b"))
      .filter(col(valueCol) >= col(startCol) && col(valueCol) < col(endCol))
      .drop("__b")
  }
}
