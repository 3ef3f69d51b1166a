package graft

import org.apache.spark.sql.functions._
import graft.sinks.Bucketing

/** Co-located bucketed joins: the join must plan WITHOUT a shuffle on
  * either side when both tables share the bucket spec.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero exchanges") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    // a previous JVM's orphaned managed-table location blocks CREATE
    Seq("b_orders", "b_lines").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"spark-warehouse/$t"))
    }
    val orders = (1 to 1000).map(k => (k.toLong, s"o$k")).toDF("okey", "oval")
    val lines = (1 to 3000).map(i => ((i % 1000 + 1).toLong, i)).toDF("okey", "line")
    Bucketing.writeBucketed(orders, "b_orders", Seq("okey"), 8, sortCols = Seq("okey"))
    Bucketing.writeBucketed(lines, "b_lines", Seq("okey"), 8, sortCols = Seq("okey"))

    // disable broadcast so the planner faces the shuffle-join decision —
    // exactly the case bucketing exists for (two FACT tables, neither
    // broadcastable at real scale)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lines", Seq("okey"))
      assert(joined.count() == 3000)
      val plan = joined.queryExecution.executedPlan.toString
      // bucket-aligned scans satisfy the join's distribution: no shuffle
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")

      // the same join over plain (unbucketed) frames DOES shuffle — the
      // baseline that makes the zero-exchange assertion meaningful
      val plain = orders.join(lines, Seq("okey"))
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed aggregation on the bucket key avoids the shuffle") {
    val agg = spark.table("b_lines").groupBy("okey").agg(count(lit(1)))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
