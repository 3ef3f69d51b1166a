package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers. AQE's skew-join splitting handles moderate skew
  * at runtime; these are for the pathological cases a 100 TB pipeline plans
  * for explicitly (one key = 30% of the data).
  */
object Skew {

  /** Two-phase salted aggregation: partial-aggregate on (key, salt) — fanning
    * one hot key across `saltBuckets` reducers — then final-aggregate on the
    * key. Correct for DISTRIBUTIVE aggregates (sum/count/min/max): pass the
    * partial expression and the matching merge expression.
    *
    * The salt is a deterministic row hash (xxhash64 over all input columns),
    * not rand(): partial-stage row placement is then identical across task
    * retries and reruns — the same reproducibility argument saltedJoin
    * documents — while spreading a hot key just as evenly.
    *
    * Example: sum → partial sum(x), merge sum(partial).
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                      partials: Seq[(String, Column)],
                      merges: Seq[(String, String => Column)]): DataFrame = {
    // Salt = hash(partition id, all hashable columns): deterministic under
    // task retry (a retried task re-reads the same partition, so every row
    // gets the same salt — unlike rand()), yet byte-identical duplicate
    // rows of a hot key still spread across as many salt buckets as
    // partitions holding them (hashing the columns alone would give all
    // duplicates ONE bucket, silently un-salting the degenerate hot key).
    // MapType columns are excluded: xxhash64 rejects maps (order-undefined)
    // and would fail analysis for any schema carrying a properties map.
    val hashable = df.schema.fields.collect {
      case f if !hasMapType(f.dataType) => col(f.name)
    }.toSeq
    val salted = df.withColumn("__salt",
      pmod(xxhash64(spark_partition_id() +: hashable: _*),
        lit(saltBuckets.toLong)).cast("int"))
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(merges.head._2(merges.head._1).as(merges.head._1),
        merges.tail.map { case (n, f) => f(n).as(n) }: _*)
  }

  /** Salted shuffle join for a skewed key: the large side is spread across
    * `salts` sub-keys by a deterministic hash of `saltBy` (pass a unique or
    * well-distributed column of the large side — determinism keeps results
    * reproducible run-to-run, unlike rand()), and the small side is
    * replicated once per salt, so one hot key fans out over `salts` reducers
    * instead of melting a single task. Output is exactly the inner join on
    * `key`: every large row meets its matching small row in precisely one
    * salt bucket. Use when the small side is too big to broadcast but small
    * enough to replicate `salts`×, and AQE's runtime skew splitting isn't
    * available or the skew is known up front.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltBy: Column, salts: Int = 16): DataFrame = {
    val l = large.withColumn("__salt",
      pmod(xxhash64(saltBy), lit(salts.toLong)).cast("int"))
    val r = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted sum/count convenience: the common hot-key rollup. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: Column,
                     saltBuckets: Int = 16,
                     sumName: String = "sum", countName: String = "cnt"): DataFrame =
    saltedAggregate(df, keys, saltBuckets,
      partials = Seq(sumName -> sum(valueCol), countName -> count(lit(1))),
      merges = Seq(sumName -> (n => sum(col(n))), countName -> (n => sum(col(n)))))

  /** True when the type contains a MapType anywhere (xxhash64 rejects
    * maps — element order is undefined).
    */
  private def hasMapType(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.MapType => true
    case a: org.apache.spark.sql.types.ArrayType => hasMapType(a.elementType)
    case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMapType(f.dataType))
    case _ => false
  }

  /** Pre-flight skew diagnosis for a join/aggregation key: the top-N
    * heaviest keys with exact counts, basis-point share of all rows, and a
    * skew factor (count over the mean per-key count, ×100). This is the
    * number that decides BEFORE a 100 TB job whether a key needs
    * [[saltedJoin]]/[[saltedAggregate]] or AQE's runtime splitting will do
    * — skew_x100 ≈ 100 means uniform; a key at 30% of a 10⁶-key domain
    * shows ≈ 3×10⁷.
    *
    * All-integer arithmetic (the mean is computed first — `total div
    * n_keys` — so nothing multiplies two corpus-sized numbers; overflow
    * would need a single key × 100 past 2⁶³ rows). Scale shape: one
    * partial+final count aggregation on the key, a broadcast of the 1-row
    * stats relation, and a TakeOrderedAndProject cut — the driver sees N
    * rows.
    */
  def keySkewProfile(df: DataFrame, keyCol: Column, topN: Int): DataFrame = {
    require(topN > 0, s"keySkewProfile needs topN > 0, got $topN")
    val counts = df.groupBy(keyCol.as("key")).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(stats))
      .withColumn("share_bp", expr("cnt * 10000 div total"))
      .withColumn("skew_x100", expr("cnt * 100 div greatest(total div n_keys, 1L)"))
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(topN)
  }
}
