package graft

import org.apache.spark.sql.SparkSession

/** t1 smoke surface: runs the flagship `SparkEntry.entry` query on sf0.001
  * (the driver's rows>0 check) and prints the result + row count.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    df.show(30, false)
    println("entry rows: " + df.count())
    spark.stop()
  }
}
