package graft

import org.apache.spark.sql.SparkSession

/** CLI entry point — the reference's `python -m pybabe --input X --output Y`
  * one-liner (/root/reference/pybabe/__main__.py): pull the input through
  * format dispatch, push it to the output. Optional third arg limits rows
  * (a cheap head for peeking at big files).
  *
  *   spark-submit --class graft.Main graft.jar --input in.csv --output out.parquet
  */
object Main {
  def main(args: Array[String]): Unit = {
    var input: Option[String] = None
    var output: Option[String] = None
    var limit: Option[Int] = None
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--input"  if i + 1 < args.length => input = Some(args(i + 1)); i += 2
        case "--output" if i + 1 < args.length => output = Some(args(i + 1)); i += 2
        case "--limit"  if i + 1 < args.length => limit = Some(args(i + 1).toInt); i += 2
        case other =>
          System.err.println(s"unknown argument: $other")
          System.err.println("usage: graft.Main --input PATH --output PATH [--limit N]")
          sys.exit(2)
      }
    }
    val in = input.getOrElse { System.err.println("--input required"); sys.exit(2); "" }
    val out = output.getOrElse { System.err.println("--output required"); sys.exit(2); "" }
    val spark = GraftSession.getOrCreate("graft-cli")
    try {
      val df = graft.sources.Protocols.pull(spark, in)
      graft.sinks.Sinks.push(limit.map(df.limit).getOrElse(df), out)
    } finally spark.stop()
  }
}
