package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-experiment data generator: replicate an existing sf directory
  * `copies`× with key-space offsets so every join key still matches within
  * its copy — a 10× upscale of sf0.1 approximates sf1 for measuring the
  * 0.1→1.0 decade (SCALING.md). Facts and their dimensions shift together
  * (orderkey/custkey/partkey/suppkey strides from each table's max), text
  * gets a per-copy suffix and embeddings a tiny deterministic perturbation
  * so near-dup/ANN queries don't degenerate into pure planted-copy mode.
  *
  * Usage: runMain graft.GenScale <srcSfDir> <outDir> [copies=10] [tables]
  * `tables` (comma-separated, default all) restricts the output — the
  * sf10 decade for the dedup/ANN family needs only documents,embeddings
  * and skipping the 60M-row lineitem write keeps the upscale cheap.
  * Output stays under the repo (target/) — /root/testdata is read-only.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "target/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val wanted: String => Boolean = args.lift(3)
      .map(_.split(",").toSet.filter(_.nonEmpty)) match {
        case Some(ts) if ts.nonEmpty => ts.contains _
        case _ => _ => true
      }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def stride(df: DataFrame, idCol: String): Long =
      df.agg(max(col(idCol))).head().getLong(0) + 1

    // copy index column: explode a literal range, then shift keys per copy
    def replicate(df: DataFrame, shifts: Map[String, Long]): DataFrame = {
      val base = df.withColumn("__c",
        explode(array((0 until copies).map(i => lit(i.toLong)): _*)))
      shifts.foldLeft(base) { case (d, (c, s)) =>
        d.withColumn(c, col(c) + col("__c") * s)
      }.drop("__c")
    }

    val orders = read("orders"); val lineitem = read("lineitem")
    val customer = read("customer"); val part = read("part")
    val supplier = read("supplier"); val events = read("events")
    val documents = read("documents"); val embeddings = read("embeddings")

    // lazy + by-name `write` below: a table-restricted run (e.g. the sf10
    // documents,embeddings decade) never scans the skipped fact tables for
    // their strides
    lazy val oS = stride(orders, "o_orderkey"); lazy val cS = stride(customer, "c_custkey")
    lazy val pS = stride(part, "p_partkey"); lazy val sS = stride(supplier, "s_suppkey")

    new java.io.File(out).mkdirs()
    // A real `copies`× dataset has ~`copies`× the files: round-robin into
    // `copies` output files so scan parallelism grows with the data (the
    // driver's sf dirs are one file per table — leaving the upscale as one
    // file would single-thread every scan and measure the LAYOUT, not the
    // plans, across the decade).
    val written = scala.collection.mutable.ArrayBuffer[String]()
    def write(df: => DataFrame, name: String): Unit =
      if (wanted(name)) {
        df.repartition(copies).write.mode("overwrite").parquet(s"$out/$name.parquet")
        written += name
      }

    // region/nation are true dimensions — unchanged at any sf
    write(read("region"), "region")
    write(read("nation"), "nation")
    write(replicate(customer, Map("c_custkey" -> cS)), "customer")
    write(replicate(part, Map("p_partkey" -> pS)), "part")
    write(replicate(supplier, Map("s_suppkey" -> sS)), "supplier")
    write(replicate(orders, Map("o_orderkey" -> oS, "o_custkey" -> cS)), "orders")
    write(replicate(lineitem, Map(
      "l_orderkey" -> oS, "l_partkey" -> pS, "l_suppkey" -> sS)), "lineitem")
    // one agg job per table for the stride maxes (not one per column)
    lazy val (eIdS, eUidS) = {
      val r = events.agg(max(col("event_id")), max(col("user_id"))).head()
      (r.getLong(0) + 1, r.getLong(1) + 1)
    }
    write(replicate(events, Map("event_id" -> eIdS, "user_id" -> eUidS)), "events")
    // per-copy text suffix: copies are NEAR-dups (high jaccard), not exact,
    // so dedup pipelines keep realistic candidate distributions
    val dS = stride(documents, "doc_id")
    write(replicate(documents, Map("doc_id" -> dS))
      .withColumn("text",
        when(col("doc_id") >= dS,
          concat(col("text"), lit(" v"), (col("doc_id") % copies).cast("string")))
          .otherwise(col("text"))), "documents")
    // deterministic tiny perturbation keyed on (vec_id, position): copies
    // are near-neighbors of their ORIGINALS — copy 0 must stay bit-identical
    // to the source corpus (like the documents guard above), or upscale-vs-
    // source ANN comparisons are confounded by the base vectors moving too
    val vS = stride(embeddings, "vec_id")
    write(replicate(embeddings, Map("vec_id" -> vS))
      .withColumn("embedding",
        when(col("vec_id") >= vS,
          transform(col("embedding"),
            (x, i) => (x + (pmod(col("vec_id") * 31 + i, lit(7)) - lit(3))
              .cast("float") / lit(1000.0f)).cast("float")))
          .otherwise(col("embedding"))), "embeddings")

    // Probe a table that was actually WRITTEN this run (a restriction like
    // `embeddings` used to crash here probing the never-written documents):
    // prefer the big fact tables for a meaningful row count, else any
    // written table, else skip the probe.
    val probeTable = Seq("lineitem", "documents").find(written.contains)
      .orElse(written.headOption)
    probeTable match {
      case Some(tbl) =>
        println(s"""{"generated":"$out","copies":$copies,"${tbl}_rows":${
          spark.read.parquet(s"$out/$tbl.parquet").count()}}""")
      case None =>
        println(s"""{"generated":"$out","copies":$copies,"written":[]}""")
    }
    spark.stop()
  }
}
