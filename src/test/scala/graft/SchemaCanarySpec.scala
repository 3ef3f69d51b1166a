package graft

import org.apache.spark.sql.functions._

/** q145 schema canary — the drift detector added after the round-7 testdata
  * regeneration silently changed events.ts from int64 nanos to
  * TIMESTAMP(MICROS) and broke six queries. The canary's contract: any
  * physical-type change in a fixture table shows up as a changed canonical
  * type token, which the driver's value-hash compare then fails.
  */
class SchemaCanarySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val canary = SparkEntry.queries("q145_schema_canary")

  test("canary reports one row per column with canonical type tokens") {
    val rows = canary(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(rows(("events", "ts")) == "ts")
    assert(rows(("events", "event_id")) == "i64")
    assert(rows(("region", "r_regionkey")) == "i32")
    assert(rows(("lineitem", "l_quantity")) == "f64")
    assert(rows(("documents", "text")) == "str")
    assert(rows(("embeddings", "embedding")) == "arr<f32>")
  }

  test("canary catches a deliberately retyped fixture (the round-7 drift, reversed)") {
    // Rebuild the fixture set with events.ts retyped to BIGINT micros —
    // the mirror image of the drift that broke round 7. Every other table
    // is byte-identical, so exactly the one (events, ts) row may change.
    val dir = tmp("canary_drift")
    for (t <- SparkEntry.fixtureTables.filterNot(_ == "events"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/$t.parquet"),
        java.nio.file.Paths.get(s"$dir/$t.parquet"))
    spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", unix_micros(col("ts").cast("timestamp")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    def rowsOf(d: String) = canary(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    val clean = rowsOf(sf)
    val drifted = rowsOf(dir)
    assert(drifted(("events", "ts")) == "i64" && clean(("events", "ts")) == "ts")
    assert((clean.toSet -- drifted.toSet) == Set(("events", "ts") -> "ts"),
      "only the retyped column may differ")
  }
}
