package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The event-time queries must work against BOTH physical ts encodings a
  * real lake contains: TIMESTAMP(MICROS) parquet (surfaces as timestamp)
  * and legacy int64 nanos (surfaces as BIGINT under
  * spark.sql.legacy.parquet.nanosAsLong). Round 7 broke when the fixtures
  * drifted between the two; the tsUs/tsMs helpers now inspect the schema.
  * This spec pins the contract: the same instants stored both ways produce
  * IDENTICAL query results.
  */
class EventTimeAdaptiveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // sf0.001 with events.ts rewritten as int64 nanoseconds-since-epoch —
  // the legacy lake shape (micros * 1000 is exact in Long for any
  // realistic epoch). Other tables are byte-identical copies.
  private lazy val nanosDir: String = {
    val dir = tmp("nanos_lake")
    for (t <- SparkEntry.fixtureTables.filterNot(_ == "events"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/$t.parquet"),
        java.nio.file.Paths.get(s"$dir/$t.parquet"))
    spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  for (q <- Seq("q31_parse_time", "q68_sessionize_batch", "q71_funnel",
                "q127_range_frame", "q134_dedup_stream"))
    test(s"$q: identical results on micros-timestamp and legacy-nanos lakes") {
      val fn = SparkEntry.queries(q)
      val micros = sortedRows(fn(spark, sf))
      val nanos = sortedRows(fn(spark, nanosDir))
      assert(micros.nonEmpty, s"$q returned no rows")
      assert(micros == nanos, s"$q diverges between ts encodings")
    }
}
