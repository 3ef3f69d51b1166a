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
}
