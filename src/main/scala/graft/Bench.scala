package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR, prints one JSON line with per-query seconds. A query
  * that throws is reported in "errors" with value -1 — failures are never
  * silently recorded as timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/shuffle machinery so the first timed query
    // doesn't absorb one-time startup cost.
    spark.range(2000000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    // Each query runs TWICE and reports the min: single-shot timings on a
    // shared host swing 2-4x (cold code paths, concurrent load); min-of-2
    // is the stable figure of merit. Override with SPARK_GRAFT_BENCH_RUNS.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    // Optional comma-separated substring filter for iterating on one query.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.contains))
    }
    val results = selected.map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          if (!errors.contains(name)) errors += name
          -1.0 }
      }
      name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }
    // Key order matters: the harness capturing stdout keeps only a bounded
    // TAIL of the output (~2000 chars, with sbt's "[success]" trailer inside
    // it), and with 100 queries a full-name JSON line outgrows that buffer.
    // Three defenses: per-query timings go first (front-truncatable) and the
    // headline total/errors go LAST so they always survive; per-query keys
    // are the unique qNN id prefix (full names live in the CORRECTNESS
    // output, which shares the numbering); 2-decimal rounding. -1.0 failure
    // markers are preserved. Locale.ROOT: the default-locale formatter would
    // emit decimal COMMAS on comma-decimal locales and break the JSON.
    def fmt(v: Double, digits: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(v))
    val short = results.map { case (k, v) => k.takeWhile(_ != '_') -> v }
    val keys = if (short.map(_._1).distinct.size == short.size) short else results
    val qs = keys.map { case (k, v) =>
      "\"" + k + "\":" + (if (v < 0) "-1.0" else fmt(v, 2))
    }.mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"queries":$qs,"sf":"$sfDir","errors":$errs,"metric":"total","unit":"sec","value":${fmt(total, 3)}}""")
    spark.stop()
  }
}
