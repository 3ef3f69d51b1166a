package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR, prints one JSON line with per-query seconds. A query
  * that throws is listed in "errors" and omitted from the timing map —
  * failures are never silently recorded as timings, and summing "queries"
  * reproduces "value" up to the per-entry 2-decimal rounding ("value"
  * itself is the 3-decimal sum of the unrounded timings).
  *
  * Measurement protocol (hardened after the round-5 parse failure, where a
  * WARN-level stack trace interleaved on stderr ahead of the JSON line):
  *  - log level OFF during the timed section — nothing but the JSON reaches
  *    the captured stream on a clean run;
  *  - min-of-3 per query (SPARK_GRAFT_BENCH_RUNS): run 1 swallows cold-path
  *    cost (memoize cache write, codegen), min over the rest is stable on a
  *    contended host;
  *  - each query is materialized through a `noop`-format WRITE, not
  *    `count()` — count() lets Catalyst skip column materialization for
  *    narrow projection plans, so a write is the honest unit of work;
  *  - the JSON is ALSO written whole to BENCH_local_<sf>.json in the working
  *    directory so no consumer ever depends on a bounded stdout tail.
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
    // OFF, not WARN: round 5's driver capture opened with a logged stack
    // trace (stderr) that broke machine parsing of the JSON even though
    // rc=0 and errors=[]. Genuine query failures are still surfaced through
    // the "errors" field and our own [bench] line below.
    spark.sparkContext.setLogLevel("OFF")
    // Warm up the JVM/codegen/shuffle machinery so the first timed query
    // doesn't absorb one-time startup cost.
    spark.range(2000000).selectExpr("sum(id)").collect()
    // Touch EVERY table, not just one: the first query otherwise pays the
    // footer read + schema inference of its inputs (q01 absorbed lineitem's,
    // 0.20 -> 1.23 s in the round-7 driver bench). One limit(1) row per
    // table keeps the warm-up itself sub-second.
    for (t <- SparkEntry.fixtureTables)
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).collect()
      catch { case _: Throwable => () }
    val errors = scala.collection.mutable.ArrayBuffer[String]()
    // Min-of-3: single-shot timings on a shared host swing up to 11x
    // (round-5 q61: 1.1s builder vs 12.4s driver); the first run also pays
    // one-time per-query cold paths. Override with SPARK_GRAFT_BENCH_RUNS.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    // Optional comma-separated substring filter for iterating on one query.
    // blank/empty-token values count as unset (an empty env var would
    // otherwise run the full suite yet skip the snapshot write below)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSeq.filter(_.nonEmpty)).filter(_.nonEmpty)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.contains))
    }
    val results = selected.map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
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
    // output, which shares the numbering); 2-decimal rounding.
    // Locale.ROOT: the default-locale formatter would
    // emit decimal COMMAS on comma-decimal locales and break the JSON.
    def fmt(v: Double, digits: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(v))
    // Failed queries live ONLY in "errors": a -1.0 sentinel inside the
    // timing map made sum-of-queries diverge from "value" for any consumer
    // that aggregates the map.
    val timed = results.filter(_._2 >= 0)
    val short = timed.map { case (k, v) => k.takeWhile(_ != '_') -> v }
    val keys = if (short.map(_._1).distinct.size == short.size) short else timed
    val qs = keys.map { case (k, v) =>
      "\"" + k + "\":" + fmt(v, 2)
    }.mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val json = s"""{"queries":$qs,"sf":"$sfDir","errors":$errs,"metric":"total","unit":"sec","value":${fmt(total, 3)}}"""
    // Whole-file copy for consumers that can't rely on a stdout tail —
    // full runs only: a SPARK_GRAFT_BENCH_ONLY-filtered iteration run must
    // not clobber the committed full-suite snapshot.
    val sfName = new java.io.File(sfDir).getName
    if (only.isEmpty) try {
      val w = new java.io.PrintWriter(s"BENCH_local_$sfName.json", "UTF-8")
      try w.println(json) finally w.close()
    } catch { case _: Throwable => () } // read-only cwd must not kill the run
    println(json)
    spark.stop()
  }
}
