package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch sessionization — the bounded-data analog of
  * `streaming.Streams.sessionize` (same gap semantics, no state): events are
  * grouped per key, a new session starts where the gap to the previous event
  * exceeds `gapUnits`, sessions reduce to (start, end, count).
  *
  * Plan shape: ONE hash partition by key feeds both windows (lag + running
  * sum share the partitioning/ordering, so Catalyst plans a single Exchange
  * + Sort) and the final per-session aggregate combines map-side. Scales
  * linearly in events; no per-key state, no driver involvement.
  *
  * `gapUnits` is in the time column's native unit (the events table reads
  * TIMESTAMP(NANOS) as nanosecond longs under
  * spark.sql.legacy.parquet.nanosAsLong).
  */
object Sessionize {

  def sessions(events: DataFrame, keyCol: String, tsCol: String,
               gapUnits: Long): DataFrame = {
    val wOrder = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val t = col(tsCol).cast(LongType)
    // first row per key: lag is null -> comparison null -> otherwise(0)
    val newSession = when(t - lag(t, 1).over(wOrder) > gapUnits, 1L).otherwise(0L)
    events
      .withColumn("__new", newSession)
      .withColumn("__sid", sum(col("__new"))
        .over(wOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__sid").as("session_seq"))
      .agg(
        min(t).as("session_start"),
        max(t).as("session_end"),
        count(lit(1)).as("events"))
  }
}
