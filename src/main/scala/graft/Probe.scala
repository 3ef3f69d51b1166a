package graft

import org.apache.spark.sql.SparkSession

/** Throwaway diagnostics main for round-11 debugging. */
object Probe {
  def main(args: Array[String]): Unit = {
    val q = if (args.length > 0) args(0) else "q147_heavy_hitters_stream"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = SparkEntry.queries(q)(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      println(s"OK $q")
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
