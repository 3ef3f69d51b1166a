package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session factory for the engine: the configs a 100 TB
  * deployment wants on by default, scaled down for local runs.
  *
  *  - AQE on with skew-join splitting and partition coalescing: runtime
  *    re-planning replaces hand-tuned shuffle-partition counts and salting
  *    for moderately skewed keys.
  *  - shuffle partitions sized to the cluster (cores × 3 locally; a real
  *    cluster sets this to ~2-3× total cores or relies on AQE coalescing).
  *  - nanos-as-long so nanosecond parquet timestamps scan instead of fail.
  *  - the graft_* native expressions registered via GraftExtensions.
  */
object GraftSession {

  def builder(appName: String = "graft",
              master: String = "local[*]",
              shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val cores = Runtime.getRuntime.availableProcessors()
    val parts = shufflePartitions.getOrElse(
      if (master.startsWith("local")) math.max(cores, 4) else cores * 3)
    SparkSession.builder()
      .appName(appName)
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.files.maxPartitionBytes", "134217728")
  }

  def getOrCreate(appName: String = "graft", master: String = "local[*]"): SparkSession =
    builder(appName, master).getOrCreate()
}
