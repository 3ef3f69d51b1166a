package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023): score
  * every raw-corpus document by how much it looks like a small TARGET corpus
  * under a hashed n-gram bag-of-words model, then keep the highest-scoring
  * slice. This is the standard "make 100 TB of crawl look like Wikipedia"
  * pre-training selection pass.
  *
  * Model: features are word unigrams + bigrams hashed into `buckets`
  * buckets (the paper's hashed n-gram generative model); each bucket gets a
  * Laplace-smoothed probability under the target (p) and raw (q)
  * distributions, and a document's importance weight is
  * sum_f c_f * log(p_f / q_f).
  *
  * Scale shape: both distributions are ONE aggregation over exploded
  * feature buckets (corpus-linear, integer counts, map-side combine); the
  * per-bucket weight table is at most `buckets` rows and broadcasts into
  * the scoring pass, which is explode -> broadcast join -> per-doc sum. No
  * corpus-sized shuffle carries text, and the weight table can be reused
  * across corpus shards.
  *
  * Two scorers, the repo's portable-twin pattern:
  *  - `importanceScores` — the production log-weight (doubles; ln is not
  *    bit-portable across engines, so this one is spec-verified);
  *  - `importanceScoresPortable` — identical pipeline with the log-ratio
  *    replaced by an exact BIGINT-scaled ratio
  *    (scale * (pcnt+1) * (qtot+B)) div ((qcnt+1) * (ptot+B)), making the
  *    whole pass ANSI-SQL replayable bit-for-bit. Monotone in p/q per
  *    bucket, so it ranks like a first-order Taylor proxy of the log
  *    weight; domain bound: scale * max(pcnt) * (qtot+B) must stay under
  *    2^63 (holds through sf1-scale corpora at the default scale=10^6).
  */
object Importance {

  /** The feature array of one document given its PROJECTED token-array
    * column: unigrams ++ bigrams WITH multiplicity (the paper's count
    * features; single-token docs fall back to the whole text as their
    * "bigram", the `TextFunctions.shingles` contract). `toks` MUST be an
    * attribute reference, not a computed expression — Catalyst does not
    * CSE across lambda boundaries, so a computed expression here would
    * re-tokenize the document once per bigram (the q90 lesson; this cost
    * q112 a 10x slowdown before the projection).
    */
  private def featureCol(toks: Column): Column =
    concat(
      toks,
      when(size(toks) < 2, array(array_join(toks, " ")))
        .otherwise(transform(sequence(lit(0), size(toks) - 2),
          i => concat(element_at(toks, i + 1), lit(" "), element_at(toks, i + 2)))))

  /** (id?, f) exploded feature stream with the tokenization projected once.
    * Bucket hashing happens AFTER the explode, on a plain column — no
    * per-element md5 inside a lambda.
    */
  private def featureStream(df: DataFrame, keep: Seq[Column],
                            textCol: String): DataFrame =
    df.select(keep :+ tokens(col(textCol)).as("__toks"): _*)
      .select(keep :+ explode(featureCol(col("__toks"))).as("f"): _*)

  /** The hashed bucket of one feature string: md5_60(f) % buckets (the
    * portable hash basis, so any engine can re-derive bucket membership).
    */
  def featureBucket(f: Column, buckets: Int): Column =
    pmod(Sampling.portableHash60(f), lit(buckets.toLong))

  /** (bucket, cnt) totals of a corpus — one map-side-combined aggregation. */
  def bucketCounts(corpus: DataFrame, textCol: String, buckets: Int): DataFrame =
    featureStream(corpus, Nil, textCol)
      .select(featureBucket(col("f"), buckets).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** The per-bucket (pcnt, qcnt) table plus the two corpus totals. The
    * table is bounded by `buckets` rows, so it is collected ONCE (one
    * corpus pass each side) and re-shipped as a local frame — the scoring
    * join then broadcasts it without re-running the counting aggregations,
    * and nothing lingers in the session cache. Totals fall out of the same
    * collected rows. (Same bounded-driver-collect contract as the pivot
    * value list; default 1024 buckets = kilobytes.)
    */
  private def weightTable(raw: DataFrame, target: DataFrame, textCol: String,
                          targetTextCol: String, buckets: Int)
      : (DataFrame, Long, Long) =
    weightTableFromCounts(
      bucketCounts(raw, textCol, buckets).withColumnRenamed("cnt", "qcnt"),
      target, targetTextCol, buckets)

  /** The bounded-collect contract is only bounded if `buckets` is: cap it
    * so a caller can't turn the weight-table collect into a driver OOM
    * (2^20 buckets = ~24 MB of rows, already far past DSIR's useful range).
    */
  private def requireBuckets(buckets: Int): Unit =
    require(buckets > 0 && buckets <= (1 << 20),
      s"buckets must be in [1, 2^20] (driver-collected weight table), got $buckets")

  /** [[weightTable]] with the raw-corpus q-counts PRECOMPUTED — the shared
    * core, so a caller that already holds the raw feature stream (the
    * localCheckpoint path in [[importanceScoresPortable]]) doesn't pay a
    * second corpus pass and the smoothing/collect contract exists once.
    */
  private def weightTableFromCounts(q: DataFrame, target: DataFrame,
                                    targetTextCol: String, buckets: Int)
      : (DataFrame, Long, Long) = {
    requireBuckets(buckets)
    val p = bucketCounts(target, targetTextCol, buckets).withColumnRenamed("cnt", "pcnt")
    val w = q.join(p, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("pcnt"), lit(0L)).as("pcnt"),
        coalesce(col("qcnt"), lit(0L)).as("qcnt"))
    val rows = w.collect()
    val ptot = rows.map(_.getLong(1)).sum
    val qtot = rows.map(_.getLong(2)).sum
    val spark = q.sparkSession
    val local = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), w.schema)
    (local, ptot, qtot)
  }

  /** The exact-integer scaled-ratio weight column over a collected weight
    * table — the ONE definition of the portable scoring formula.
    */
  private def portableWeighted(local: DataFrame, ptot: Long, qtot: Long,
                               buckets: Int, scale: Long): DataFrame = {
    val b = buckets.toLong
    local.select(col("bucket"),
      expr(s"($scale * (pcnt + 1) * ${qtot + b}) div ((qcnt + 1) * ${ptot + b})")
        .as("w"))
  }

  /** Per-document DSIR log-importance weight (production scorer, doubles):
    * (id, n_feats, log_weight). Higher = more target-like.
    */
  def importanceScores(raw: DataFrame, idCol: String, textCol: String,
                       target: DataFrame, targetTextCol: String,
                       buckets: Int = 1024): DataFrame = {
    val (w, ptot, qtot) = weightTable(raw, target, textCol, targetTextCol, buckets)
    val b = buckets.toLong
    val weighted = w.select(col("bucket"),
      (log((col("pcnt") + 1).cast("double") / lit((ptot + b).toDouble)) -
        log((col("qcnt") + 1).cast("double") / lit((qtot + b).toDouble))).as("w"))
    featureStream(raw, Seq(col(idCol)), textCol)
      .select(col(idCol), featureBucket(col("f"), buckets).as("bucket"))
      .join(broadcast(weighted), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("w")).as("log_weight"))
  }

  /** TRAIN side of the portable twin: the per-bucket exact-integer weight
    * table (bucket, w) as a local frame — at most `buckets` rows, the
    * persistable DSIR artifact. In a production selection pipeline this is
    * computed once per (raw snapshot, target corpus) pair and served
    * against every shard via [[importanceScoresPortableWith]] — the same
    * train-once/serve-many split as pqTrain/pqTopKWith and the LM gram
    * table.
    */
  def importanceWeightsPortable(raw: DataFrame, target: DataFrame,
                                textCol: String, targetTextCol: String,
                                buckets: Int = 1024,
                                scale: Long = 1000000L): DataFrame = {
    val (w, ptot, qtot) = weightTable(raw, target, textCol, targetTextCol, buckets)
    portableWeighted(w, ptot, qtot, buckets, scale)
  }

  /** SERVE side: score a corpus (shard) against a pre-trained weight
    * table — one narrow feature explode, a broadcast join, one
    * aggregation; no target-corpus work at all.
    */
  def importanceScoresPortableWith(raw: DataFrame, idCol: String,
                                   textCol: String, weights: DataFrame,
                                   buckets: Int = 1024): DataFrame =
    featureStream(raw, Seq(col(idCol)), textCol)
      .select(col(idCol), featureBucket(col("f"), buckets).as("bucket"))
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("w")).as("score_scaled"))

  /** Portable twin: exact-integer scaled ratio weights, same pipeline.
    * (id, n_feats, score_scaled) — ANSI-replayable for auditing.
    * Train + serve in one call; repeated scorers should split via
    * [[importanceWeightsPortable]] / [[importanceScoresPortableWith]].
    *
    * The raw corpus's (id, bucket) feature stream feeds BOTH the q-count
    * aggregation and the scoring join — one eager localCheckpoint (the
    * SpanDedup rationale) makes the tokenize → explode → hash pass run
    * once instead of twice; the materialized stream is two longs per
    * feature, linear in corpus token count, spill-backed.
    */
  def importanceScoresPortable(raw: DataFrame, idCol: String, textCol: String,
                               target: DataFrame, targetTextCol: String,
                               buckets: Int = 1024,
                               scale: Long = 1000000L): DataFrame = {
    // fail BEFORE the eager checkpoint runs a corpus pass: an out-of-range
    // buckets must throw instantly (ANSI pmod-by-zero inside the job, or a
    // completed featurization before the weight-table require, otherwise)
    requireBuckets(buckets)
    val fs = featureStream(raw, Seq(col(idCol)), textCol)
      .select(col(idCol), featureBucket(col("f"), buckets).as("bucket"))
      .localCheckpoint()
    val (w, ptot, qtot) = weightTableFromCounts(
      fs.groupBy("bucket").agg(count(lit(1)).as("qcnt")),
      target, targetTextCol, buckets)
    fs.join(broadcast(portableWeighted(w, ptot, qtot, buckets, scale)), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("w")).as("score_scaled"))
  }

  /** Keep the `keepPct`% most target-like documents of `scored` (a frame
    * from one of the scorers), deterministic tie-break on the id. DSIR
    * proper adds Gumbel noise for diversity; the deterministic top slice is
    * the reproducible variant (seeded noise can be layered on the score
    * column by the caller). TakeOrderedAndProject — no global sort
    * materializes.
    */
  def resampleTop(scored: DataFrame, idCol: String, scoreCol: String,
                  keepPct: Int, totalRows: Long = -1L): DataFrame = {
    require(keepPct > 0 && keepPct <= 100, s"keepPct in (0,100], got $keepPct")
    // Sizing the keep slice needs the row count, and the top-k pass needs the
    // rows — without materialization the whole scoring pipeline (two corpus
    // aggregations + driver collect when fed straight from a scorer) would
    // execute twice. Callers that already know the count pass `totalRows`
    // and skip materialization entirely. The convenience path uses an EAGER
    // localCheckpoint, which is scoped to this call: the checkpointed
    // blocks live exactly as long as the returned plan is referenced and
    // are reclaimed by the ContextCleaner afterwards — unlike the previous
    // session-global persist slot, whose getAndSet/unpersist could yank the
    // cache out from under a concurrent caller (round-6 advice). Lineage
    // truncation also means the count and the top-k both read the
    // materialized blocks, never the scoring pipeline.
    val src = if (totalRows >= 0) scored else scored.localCheckpoint()
    val n = if (totalRows >= 0) totalRows else src.count()
    val keep = (n * keepPct + 99) / 100
    // limit() is Int-bounded by design (top-k materializes on one node);
    // fail fast instead of letting .toInt wrap negative on corpus-scale
    // slices — beyond this, take a score-threshold filter (via
    // approx quantile) or hashSplit, which stay fully distributed
    require(keep <= Int.MaxValue,
      s"resampleTop keep=$keep exceeds limit()'s Int bound; use a score-threshold filter at this scale")
    src.orderBy(col(scoreCol).desc, col(idCol).asc).limit(keep.toInt)
  }
}
