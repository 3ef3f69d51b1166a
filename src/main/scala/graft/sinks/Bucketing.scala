package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table layout for repeated co-located joins — the 100 TB answer
  * to "this join shuffles both sides every run": write both fact tables
  * bucketed by the join key once, and every subsequent equi-join on that key
  * reads bucket-aligned files with NO exchange on either side (Catalyst's
  * EnsureRequirements sees the bucketed scan's HashPartitioning).
  *
  * The reference's closest analogue is its partitioned output files
  * (base.py:517-541) — hive-style directory partitioning covers pruning;
  * bucketing covers join/agg co-location, which the reference (single
  * process) never needed.
  */
object Bucketing {

  /** Write `df` as a bucketed (+ optionally sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int, sortCols: Seq[String] = Nil,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    var w = df.write.mode(mode)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.format("parquet").saveAsTable(table)
  }

  /** Join two same-bucketing tables on their bucket key — plans with zero
    * shuffle when bucket specs align (count and columns).
    */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
                   leftTable: String, rightTable: String,
                   key: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key, joinType)
}
