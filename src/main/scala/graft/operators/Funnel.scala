package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-sequence funnel analysis: for each key, how many of the given
  * `steps` occur in order (greedy first-match subsequence) across its
  * event-time-sorted events. The classic product-analytics funnel
  * (view → click → purchase), an extension beyond the reference surface.
  *
  * Shape: one groupBy(key) collecting the per-key (ts, type) array (bounded
  * by per-key activity, never by corpus size), then a single fold computes
  * the greedy match — equivalent to the step-wise "min ts of step k after
  * step k-1" formulation, including tie behavior (equal-timestamp events
  * order by type in the sort, and a same-timestamp successor never matches
  * in either formulation).
  */
object Funnel {

  def funnelSteps(events: DataFrame, keyCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelSteps: need at least one step")
    val stepsLit = array(steps.map(lit): _*)
    events.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col(tsCol).as("t"), col(typeCol).as("e"))))
        .as("__ev"))
      .select(col(keyCol),
        aggregate(col("__ev"), lit(0), (st, ev) =>
          when(st < lit(steps.length) &&
              ev.getField("e") === element_at(stepsLit, st + 1), st + 1)
            .otherwise(st)).as("steps_completed"))
  }

  /** Keys that completed the whole funnel. */
  def converted(events: DataFrame, keyCol: String, tsCol: String,
                typeCol: String, steps: Seq[String]): DataFrame =
    funnelSteps(events, keyCol, tsCol, typeCol, steps)
      .filter(col("steps_completed") === steps.length)
      .select(col(keyCol))
}
