package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Model-based document quality scoring with the hashing trick — the
  * fastText-style linear classifier pass modern pipelines (CCNet,
  * FineWeb-Edu, DCLM) run over every document: tokens hash into a fixed
  * number of weight buckets, the document's score is the sum of its
  * tokens' bucket weights, and a threshold on the length-normalized score
  * keeps or drops the doc. The reference has no model-based filtering
  * (its filters are row predicates: /root/reference/pybabe/base.py); this
  * is the extension a training-data pipeline needs.
  *
  * Scale shape: scoring is a PURE NARROW MAP — the token array is
  * projected once (Catalyst does not CSE across lambda boundaries), the
  * weight fold runs inside whole-stage codegen, and no shuffle or state
  * exists anywhere. Scoring parallelizes with the scan at any corpus
  * size; the weight table never ships because it is a closed-form
  * expression over the bucket id.
  *
  * Integer weights make every sum order-independent and exact, so the
  * whole pipeline (hash, bucket, weight, fold, normalize) replays
  * bit-for-bit in an external SQL engine when given a portable token
  * hash — which is how the driver's oracle gates it.
  */
object Classifier {

  /** Deterministic stand-in for a trained model's bucket weights: a
    * Knuth-multiplicative scramble of the bucket id folded into
    * [-500, 500]. Real deployments substitute their trained vector via
    * `weightOf`; the scramble keeps the demo integer-exact and
    * reproducible from any engine. (bucket < 2^15 and 2654435761 < 2^32,
    * so the product stays under 2^47 — ANSI-overflow-safe.)
    */
  def scrambleWeight(bucket: Column): Column =
    (bucket * lit(2654435761L)) % lit(1001L) - lit(500L)

  /** Sum of bucket weights over a token ARRAY column (project the array
    * first — an inline `split` would re-tokenize per element). `tokenHash`
    * maps a token to a non-negative long (xxhash64-based for production,
    * md5-based portable for oracle replay); `weightOf` maps bucket id to
    * an integer weight expression.
    */
  def hashedScoreSum(toksCol: Column, nBuckets: Int,
                     tokenHash: Column => Column,
                     weightOf: Column => Column): Column = {
    require(nBuckets > 0, "need a positive bucket count")
    aggregate(toksCol, lit(0L),
      (acc, t) => acc + weightOf(pmod(tokenHash(t), lit(nBuckets.toLong))).cast(LongType))
  }

  /** Score every document: (idCol, score, n_tokens, quality) where
    * `quality` = score / n_tokens (one division of exact integers —
    * bit-portable). Production hash = xxhash64.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
                nBuckets: Int = 1 << 15,
                tokenHash: Column => Column = t => abs(xxhash64(t)),
                weightOf: Column => Column = scrambleWeight): DataFrame =
    docs
      // drop the phantom '' token a whitespace-only doc splits into, so
      // empty docs hit the n_tokens == 0 branch instead of being scored
      // with the '' bucket's arbitrary weight
      .select(col(idCol),
        filter(split(trim(coalesce(col(textCol), lit(""))), "\\s+"),
          w => length(w) > 0).as("__toks"))
      .select(col(idCol),
        hashedScoreSum(col("__toks"), nBuckets, tokenHash, weightOf).as("score"),
        size(col("__toks")).cast(LongType).as("n_tokens"))
      .withColumn("quality",
        when(col("n_tokens") === 0L, lit(0.0d))
          .otherwise(col("score").cast("double") / col("n_tokens").cast("double")))

  /** Oracle-replayable variant: the portable 60-bit md5 token hash
    * (graft.operators.Sampling.portableHash60) in place of xxhash64 —
    * same shape, same weights, reproducible from any SQL engine.
    */
  def scoreDocsPortable(docs: DataFrame, idCol: String, textCol: String,
                        nBuckets: Int = 1 << 15): DataFrame =
    scoreDocs(docs, idCol, textCol, nBuckets,
      tokenHash = graft.operators.Sampling.portableHash60)

  /** Exact precision/recall curve of the rule "keep iff score ≥ t" — the
    * threshold-tuning surface behind every model-based filter (CCNet /
    * FineWeb-Edu keep the top band of a quality classifier; the operating
    * point IS a row of this table). One row per DISTINCT observed score:
    * (threshold, tp, fp, fn, precision, recall). Counts are exact
    * integers; precision/recall are each ONE division of those integers,
    * so the curve replays bit-for-bit in any IEEE engine.
    *
    * Scale shape: one count aggregation keyed on score collapses the
    * corpus to the distinct-score table, and the cumulative window runs
    * over THAT table only — the q148 quantile-threshold contract
    * (aggregate before the single-partition window; never a corpus sort).
    * Scores of real classifiers are low-cardinality (integer sums /
    * quantized); for continuous scores bucket first.
    */
  def prCurve(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byScore = scored
      .groupBy(col(scoreCol).as("threshold"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("__np"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("threshold").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val totals = scored.agg(
      sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("__tot"))
    byScore
      .withColumn("__pred", sum(col("__n")).over(w))
      .withColumn("tp", sum(col("__np")).over(w))
      .crossJoin(broadcast(totals))
      .select(col("threshold"), col("tp"),
        (col("__pred") - col("tp")).as("fp"),
        (col("__tot") - col("tp")).as("fn"),
        (col("tp").cast("double") / col("__pred").cast("double")).as("precision"),
        when(col("__tot") === 0L, lit(0.0d))
          .otherwise(col("tp").cast("double") / col("__tot").cast("double")).as("recall"))
  }
}
