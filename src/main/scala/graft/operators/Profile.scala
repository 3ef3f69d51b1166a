package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the exploration companion to `TypeDetect`/
  * `primaryKeyDetect` (reference types.py's inspection family): one row per
  * column with count / nulls / distinct / min / max. min/max are computed
  * on the NATIVE type (so numeric columns order numerically, not
  * lexicographically) and cast to string last, giving a uniform schema.
  *
  * Shape: one aggregate branch per column, unioned — each branch's scan is
  * column-pruned to just its column, and all branches share one job. Exact
  * `count_distinct` shuffles per-column distinct values; at corpus scale
  * pass `approxDistinct = true` for the one-pass HLL sketch instead.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String] = Nil,
              approxDistinct: Boolean = false): DataFrame = {
    val targets = if (cols.nonEmpty) cols else df.columns.toSeq
    require(targets.nonEmpty, "profile: no columns")
    targets.map { c =>
      val distinctAgg =
        if (approxDistinct) approx_count_distinct(col(c)).as("n_distinct")
        else count_distinct(col(c)).as("n_distinct")
      df.agg(
        count(lit(1)).as("n"),
        count(when(col(c).isNull, 1)).as("nulls"),
        distinctAgg,
        min(col(c)).cast("string").as("min_str"),
        max(col(c)).cast("string").as("max_str"))
        .select(lit(c).as("column"), col("n"), col("nulls"),
          col("n_distinct"), col("min_str"), col("max_str"))
    }.reduce(_ unionByName _)
  }
}
