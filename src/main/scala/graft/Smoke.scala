package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch main for quick data checks (not part of the driver contract). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    try {
      val ev = spark.read.parquet(s"$dir/events.parquet")
      ev.printSchema()
      ev.select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("s")).show(3, false)
    } catch { case e: Throwable => println("EVENTS FAIL: " + e.getMessage.take(300)) }
    val part = spark.read.parquet(s"$dir/part.parquet")
    part.show(5, false)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println("langs: " + docs.select("lang").distinct().collect().map(_.getString(0)).mkString(","))
    println("sources: " + docs.select("source").distinct().count())
    spark.stop()
  }
}
