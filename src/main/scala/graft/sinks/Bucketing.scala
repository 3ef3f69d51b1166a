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

  /** Write parquet with per-column BLOOM FILTERS (plus the usual min/max
    * stats) for the given columns — the point-lookup layout for 100 TB
    * lakes: `id = x` probes skip every row group whose filter rules the
    * key out, which min/max stats cannot do for high-cardinality unsorted
    * ids. `ndv` sizes each filter (expected distinct values per row
    * group). The reader needs nothing special: Spark's vectorized parquet
    * reader consumes the filters under the existing
    * `spark.sql.parquet.filterPushdown` flag.
    */
  def writeWithBloomFilters(df: DataFrame, path: String, bloomCols: Seq[String],
                            ndv: Long = 100000L,
                            mode: SaveMode = SaveMode.Overwrite): Unit = {
    var w = df.write.mode(mode)
    for (c <- bloomCols) {
      w = w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
    }
    w.parquet(path)
  }
}
