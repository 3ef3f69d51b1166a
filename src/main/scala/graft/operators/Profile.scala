package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the exploration companion to `TypeDetect`/
  * `primaryKeyDetect` (reference types.py's inspection family): one row per
  * column with count / nulls / distinct / min / max. min/max are computed
  * on the NATIVE type (so numeric columns order numerically, not
  * lexicographically) and cast to string last, giving a uniform schema.
  *
  * Shape: one aggregate branch per column, unioned — each branch's scan is
  * column-pruned to just its column, and all branches share one job. Exact
  * `count_distinct` shuffles per-column distinct values; at corpus scale
  * pass `approxDistinct = true` for the one-pass HLL sketch instead.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String] = Nil,
              approxDistinct: Boolean = false): DataFrame = {
    val targets = if (cols.nonEmpty) cols else df.columns.toSeq
    require(targets.nonEmpty, "profile: no columns")
    targets.map { c =>
      val distinctAgg =
        if (approxDistinct) approx_count_distinct(col(c)).as("n_distinct")
        else count_distinct(col(c)).as("n_distinct")
      df.agg(
        count(lit(1)).as("n"),
        count(when(col(c).isNull, 1)).as("nulls"),
        distinctAgg,
        min(col(c)).cast("string").as("min_str"),
        max(col(c)).cast("string").as("max_str"))
        .select(lit(c).as("column"), col("n"), col("nulls"),
          col("n_distinct"), col("min_str"), col("max_str"))
    }.reduce(_ unionByName _)
  }

  /** Exact discrete quantiles of an integer-valued column WITHOUT a global
    * sort — the curation-threshold primitive ("keep documents above the
    * P10 quality floor", "cap at the P99 length") that pairs with the
    * quality/length scorers. `quantile_disc` semantics: for each requested
    * percent p, the smallest value v whose cumulative count reaches
    * ceil(p·n/100). Output (pct, value, cum_n, n) — all exact integers,
    * ANSI-replayable on any engine (approx sketches like t-digest are not).
    *
    * Scale shape: one value-keyed count aggregation (map-side combined —
    * corpus rows collapse to one row per DISTINCT value), then a running
    * sum + per-pct pick over the distinct-value table. That table is the
    * operator's documented bound (the pivot-value-list contract): length
    * and score columns have bounded domains (a 2^20-value domain is a
    * 1 MB table); for genuinely unbounded domains, bucket first (e.g.
    * `lengthHistogram`'s power-of-two buckets) — a global sort would be
    * the wrong tool at 100 TB either way.
    */
  def exactQuantilesLong(df: DataFrame, valueCol: Column,
                         pcts: Seq[Int]): DataFrame =
    quantilesPick(
      df.select(valueCol.cast("long").as("v"))
        .filter(col("v").isNotNull)
        .groupBy("v").agg(count(lit(1)).as("c")),
      Nil, pcts)

  /** Per-group [[exactQuantilesLong]] — "P99 length per source", the
    * stratified form every mixed-corpus curation policy actually needs
    * (a global cap over-trims the long-document source and under-trims
    * the short one). Same exact integer semantics; the cumulative pass
    * partitions BY GROUP, so there is no single-partition stage at all —
    * each group's distinct-value slice sorts independently, and the
    * operator scales with the largest group's value domain, not the
    * corpus. Output (group, pct, value, cum_n, n).
    */
  def groupQuantilesLong(df: DataFrame, groupCol: Column, valueCol: Column,
                         pcts: Seq[Int]): DataFrame =
    quantilesPick(
      df.select(groupCol.as("group"), valueCol.cast("long").as("v"))
        .filter(col("v").isNotNull)
        .groupBy("group", "v").agg(count(lit(1)).as("c")),
      Seq("group"), pcts)

  /** Per-group rank-bucket ASSIGNMENT — the step after the thresholds:
    * label every row with its within-group value bucket (0 .. nBuckets-1,
    * ascending by `valueCol`). With nBuckets = 3 this is CCNet's
    * head/middle/tail split (Wenzek et al. 2020, §4.3: per-language
    * perplexity terciles), the calibration that makes one quality score
    * comparable across sources. Bucket index = (rank-1)·nBuckets div n —
    * exact integer arithmetic, so ties (equal values share a rank) land in
    * the same bucket deterministically on any engine, unlike row-count
    * ntile. ONE hash exchange on the group feeds both windows (rank and
    * group count share the partitioning); scales with the largest group.
    * Nulls in `valueCol` rank first (bucket 0) — filter upstream if that
    * is not the policy.
    */
  def groupRankBuckets(df: DataFrame, groupCol: Column, valueCol: Column,
                       nBuckets: Int, bucketName: String = "bucket"): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    require(!df.columns.contains(bucketName) &&
      !df.columns.contains("__rk") && !df.columns.contains("__n"),
      s"groupRankBuckets: input must not carry '$bucketName'/__rk/__n " +
        "(they would be silently clobbered) — rename or pass a bucketName")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(valueCol)
    val wn = Window.partitionBy(groupCol)
    // rank() is IntegerType: widen BEFORE the multiply or groups past
    // 2^31/nBuckets rows wrap the product (the whole point is big groups)
    df.withColumn("__rk", rank().over(w))
      .withColumn("__n", count(lit(1)).over(wn))
      .withColumn(bucketName,
        expr(s"CAST(((CAST(__rk AS BIGINT) - 1) * $nBuckets) DIV __n AS BIGINT)"))
      .drop("__rk", "__n")
  }

  /** Shared exact-rank quantile core over a (group?, v, c) count table:
    * running sum + total per group (or globally for `groupCols = Nil` —
    * the bounded single-partition stage), then each percentile picks the
    * smallest v whose cumulative count reaches ceil(p·n/100). min_by
    * keeps (v, cum) together so the count aggregation has ONE consumer.
    */
  private def quantilesPick(counts: DataFrame, groupCols: Seq[String],
                            pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be in [1,100], got $pcts")
    import org.apache.spark.sql.expressions.Window
    val (wCum, wAll) =
      if (groupCols.isEmpty)
        (Window.orderBy(col("v"))
           .rowsBetween(Window.unboundedPreceding, Window.currentRow),
         Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
      else
        (Window.partitionBy(groupCols.map(col): _*).orderBy(col("v"))
           .rowsBetween(Window.unboundedPreceding, Window.currentRow),
         Window.partitionBy(groupCols.map(col): _*))
    val cum = counts
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
    val pctRows = pcts.map(p => s"($p)").mkString(", ")
    val pctDf = counts.sparkSession.sql(s"SELECT pct FROM (VALUES $pctRows) AS t(pct)")
    cum.crossJoin(broadcast(pctDf))
      .filter(col("cum") * 100 >= col("pct") * col("n"))
      .groupBy(groupCols.map(col) :+ col("pct"): _*)
      .agg(min_by(struct(col("v"), col("cum")), col("v")).as("b"),
        max(col("n")).as("n"))
      .select(groupCols.map(col) ++ Seq(col("pct").cast("int").as("pct"),
        col("b.v").as("value"), col("b.cum").as("cum_n"), col("n")): _*)
  }

  /** Power-of-two length histogram — the token-budget planning view of a
    * corpus (how many documents and tokens land in each [2^b, 2^{b+1})
    * bucket, what fraction of the token budget each bucket carries). The
    * standard first look before choosing a packing sequence length: the
    * tail buckets are what overflow fixed-length sequences.
    *
    * floor(log2 n) is computed EXACTLY as length(base2(n)) - 1 — pure
    * integer/string ops, so the histogram is ANSI-replayable (float log2
    * is not trustworthy at bucket boundaries). Empty/whitespace docs land
    * in bucket -1. One narrow map + one tiny aggregation (<= 64 buckets).
    */
  def lengthHistogram(df: DataFrame, lenCol: Column): DataFrame = {
    val n = lenCol.cast("long")
    val bucket = when(n <= 0, lit(-1L))
      .otherwise(length(conv(n, 10, 2)).cast("long") - 1)
    df.select(bucket.as("bucket"), n.as("len"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("len") > 0, col("len")).otherwise(0L)).as("total_tokens"),
        min("len").cast("long").as("min_len"),
        max("len").cast("long").as("max_len"))
      .withColumn("bucket_lo",
        when(col("bucket") < 0, lit(0L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))")))
  }

  /** Per-source dataset DATASHEET — the data-card table shipped with a
    * release (Gebru et al. 2021's "Datasheets for Datasets" accounting,
    * collapsed to the per-source row a curation review reads): volume
    * (docs, chars), language makeup (distinct langs + the dominant one
    * with its share numerator), duplication (exact-dup docs = rows minus
    * distinct canonical fingerprints), and PII exposure (documents
    * carrying any email/IP/phone hit). One pass, one aggregation keyed on
    * the source column; every figure is an exact integer so the datasheet
    * replays bit-for-bit and two engines can co-sign a release.
    *
    * The dominant language resolves by (count desc, lang asc) — max_by on
    * an exact struct, deterministic under ties. `dup_docs` counts the
    * EXTRA copies (a source with no duplicates reports 0).
    */
  def datasheet(docs: DataFrame, sourceCol: String, idCol: String,
                textCol: String, langCol: String): DataFrame = {
    val txt = coalesce(col(textCol), lit(""))
    val pii = graft.functions.TextFunctions.piiCounts(col(textCol))
    val perLang = docs
      .groupBy(col(sourceCol), coalesce(col(langCol), lit("")).as("__lang"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_langs"),
        min_by(struct(col("__lang").as("l"), col("__n").as("n")),
          struct((lit(0L) - col("__n")).as("neg"), col("__lang").as("l"))).as("__ml"))
      .select(col(sourceCol), col("n_langs"),
        col("__ml.l").as("top_lang"), col("__ml.n").as("top_lang_docs"))
    val base = docs.select(col(sourceCol), col(idCol), txt.as("__t"),
        graft.functions.TextFunctions.fingerprint(txt).as("__fp"),
        pii.as("__pii"))
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("__t"))).as("n_chars"),
        (count(lit(1)) - countDistinct(col("__fp"))).as("dup_docs"),
        sum(when(col("__pii.n_emails") + col("__pii.n_ips") +
          col("__pii.n_phones") > 0, 1L).otherwise(0L)).as("pii_docs"))
    base.join(perLang, Seq(sourceCol))
  }
}
