package graft

import org.apache.spark.sql.SparkSession

/** Diagnostics main: run ONE registered query under EXACTLY the bench
  * session config (same master, shuffle partitions, timezone, and the
  * `nanosAsLong` parquet flag — without which nanosecond-timestamp tables
  * fail with a misleading scan error that Bench never sees) and print each
  * run's wall seconds + GC delta. `Probe <query> [sfDir] [runs]`. Unlike
  * Bench it prints full cause chains on failure and never writes a
  * snapshot — the iterate-on-one-query tool, with measurements that are
  * comparable to BENCH_detail's.
  */
object Probe {
  private def gcMs(): Long = {
    val it = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.iterator()
    var s = 0L
    while (it.hasNext) { val t = it.next().getCollectionTime; if (t > 0) s += t }
    s
  }

  def main(args: Array[String]): Unit = {
    val q = if (args.length > 0) args(0) else "q147_heavy_hitters_stream"
    val dir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      for (i <- 1 to runs) {
        val g0 = gcMs(); val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println(f"OK $q run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, gc ${gcMs() - g0} ms")
      }
    } catch { case e: Throwable =>
      var c: Throwable = e
      while (c != null) {
        println("CAUSE: " + c.getClass.getName + ": " +
          Option(c.getMessage).getOrElse("").take(500))
        c = c.getCause
      }
    }
    spark.stop()
  }
}
