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
    val partials = items.as[String].mapPartitions { it =>
      val mg = scala.collection.mutable.HashMap.empty[String, Long]
      while (it.hasNext) {
        val x = it.next()
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
      mg.iterator
    }.toDF("item", "est")
    val candidates = partials.groupBy("item").agg(sum("est")).select("item")
    items.join(broadcast(candidates), Seq("item"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item"))
      .limit(k)
  }
}
