package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (Test / fork := true → one JVM). */
object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  /** Golden-string compare helper — the reference's `to_string` convention
    * (header + rows, '\r\n' line ends; /root/reference/pybabe/base.py:330-333).
    * Callers pass an already-ordered DataFrame.
    */
  def golden(df: DataFrame): String = graft.sinks.Sinks.toCsvString(df)

  def tmp(name: String): String = {
    val d = new java.io.File(s"target/tmp/test_$name")
    org.apache.commons.io.FileUtils.deleteQuietly(d)
    d.mkdirs()
    d.getAbsolutePath
  }
}
