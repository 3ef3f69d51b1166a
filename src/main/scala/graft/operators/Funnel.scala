package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-sequence funnel analysis: for each key, how many of the given
  * `steps` occur in order (greedy first-match subsequence) across its
  * event-time-ordered events. The classic product-analytics funnel
  * (view → click → purchase), an extension beyond the reference surface.
  *
  * Shape: the greedy match is computed STEP-WISE — t_k = min event time of
  * step k strictly after t_(k-1) — as `steps.length` filter → join →
  * groupBy-min rounds. Every stage is a hash shuffle on the key (spillable,
  * no per-key arrays), so a pathological key with millions of events costs
  * aggregation time, never task memory: the shape a 100 TB event log needs.
  * Greedy-subsequence equivalence (including equal-timestamp ties, which
  * match in neither formulation thanks to the strict >) is exercised by the
  * oracle-checked q71, whose DuckDB oracle uses this same formulation.
  */
object Funnel {

  def funnelSteps(events: DataFrame, keyCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelSteps: need at least one step")
    var acc = events.select(col(keyCol)).distinct()
    steps.zipWithIndex.foreach { case (step, i) =>
      val tcol = s"__t$i"
      val stepEvents = events.filter(col(typeCol) === step)
        .select(col(keyCol), col(tsCol))
      val reachable =
        if (i == 0) stepEvents
        else stepEvents.join(
          acc.select(col(keyCol), col(s"__t${i - 1}")).filter(col(s"__t${i - 1}").isNotNull),
          Seq(keyCol))
          .filter(col(tsCol) > col(s"__t${i - 1}"))
          .select(col(keyCol), col(tsCol))
      val mins = reachable.groupBy(col(keyCol)).agg(min(col(tsCol)).as(tcol))
      acc = acc.join(mins, Seq(keyCol), "left")
    }
    val completed = steps.indices.foldLeft(lit(0): Column)((els, i) =>
      when(col(s"__t$i").isNotNull, lit(i + 1)).otherwise(els))
    acc.select(col(keyCol), completed.as("steps_completed"))
  }

  /** Keys that completed the whole funnel. */
  def converted(events: DataFrame, keyCol: String, tsCol: String,
                typeCol: String, steps: Seq[String]): DataFrame =
    funnelSteps(events, keyCol, tsCol, typeCol, steps)
      .filter(col("steps_completed") === steps.length)
      .select(col(keyCol))
}
