package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based n-gram language-model scoring — the corpus-quality signal
  * CCNet/CC-Net-style pipelines compute with a pretrained LM, built here
  * the way Brants et al. 2007 ("Large Language Models in Machine
  * Translation") built theirs: distributed counts, sharded lookup tables,
  * and the **Stupid Backoff** score
  *
  *   S(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1})        if seen,
  *                      α · c(w_i) / N                      otherwise
  *
  * which deliberately returns scores, not normalized probabilities —
  * Brants et al.'s point is that at web scale the unsmoothed ratio with a
  * constant backoff α (their 0.4) matches Kneser-Ney quality while needing
  * only counts, which is exactly what a shuffle aggregation produces.
  *
  * Everything here is exact integer arithmetic (scaled floor division,
  * α = alphaNum/alphaDen cross-multiplied), so a score replays bit-for-bit
  * on any engine — the same portable-oracle contract as the quantile /
  * DSIR / PageRank kernels. Extension surface beyond the reference's
  * operator set (its text ops are per-row transforms; corpus-conditioned
  * scoring needs the reduce side the reference lacks).
  */
object LanguageModel {

  private def wordsCol(textCol: String): Column =
    filter(split(trim(coalesce(col(textCol), lit(""))), "\\s+"),
      w => length(w) > 0)

  /** Per-document Stupid Backoff quality score of `score` docs under the
    * bigram model counted from `train` docs (train on the trusted corpus,
    * score the crawl — the CCNet split; training on the score side itself
    * would make backoff unreachable, every bigram being seen at least
    * once).
    *
    * Output: (doc_id, n_bigrams, sb_sum, sb_score) where each bigram
    * contributes
    *   seen:    scale·c2(w1,w2) div c1(w1)
    *   unseen:  ((alphaNum·scale div alphaDen)·c1(w2)) div N
    * and sb_score = sb_sum div n_bigrams (the length-normalized mean).
    * Docs with fewer than two tokens have no bigrams and are absent —
    * score them by unigram frequency or treat as unscoreable, as CCNet
    * does with too-short paragraphs.
    *
    * Scale shape: the LM "model" is two count tables — unigrams
    * (vocabulary-sized) and bigrams (seen-pair-sized) — exactly the
    * relations Brants et al. shard across machines; here they shard as
    * ordinary term-keyed shuffle partitions, and scoring is three
    * equi-joins of the exploded bigram stream against them (left joins, so
    * unseen pairs flow to the backoff branch instead of vanishing)
    * followed by one per-doc aggregation. Nothing is ever quadratic; no
    * floats exist anywhere.
    */
  def stupidBackoffScore(train: DataFrame, score: DataFrame,
                         idCol: String, textCol: String,
                         scale: Long = 1000000L,
                         alphaNum: Long = 2L, alphaDen: Long = 5L): DataFrame = {
    require(scale > 0 && alphaNum > 0 && alphaDen >= alphaNum,
      "stupidBackoffScore needs scale > 0 and 0 < alpha <= 1")

    def bigrams(df: DataFrame): DataFrame =
      df.select(col(idCol).as("doc_id"), wordsCol(textCol).as("w"))
        .filter(size(col("w")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(w) - 1), " +
            "i -> struct(element_at(w, CAST(i AS INT)) AS w1, " +
            "element_at(w, CAST(i + 1 AS INT)) AS w2))")).as("p"))
        .select(col("doc_id"), col("p.w1"), col("p.w2"))

    val trainToks = train.select(explode(wordsCol(textCol)).as("t"))
    val c1 = trainToks.groupBy(col("t")).agg(count(lit(1)).as("c1"))
    // N = Σ c1 — derived from the unigram table, so the plan stays fully
    // lazy (no job at construction time) and train is scanned exactly
    // twice (unigrams, bigrams), not three times. The 1-row stats relation
    // folds in as a broadcast, the keySkewProfile pattern; greatest(…, 1)
    // keeps the floor division defined when train is empty (every score
    // is then 0 — there is nothing to back off TO).
    val tot = c1.agg(greatest(sum(col("c1")), lit(1L)).as("total"))
    val c2 = bigrams(train).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))

    val alphaScale = alphaNum * scale / alphaDen // floor once, like the SQL replay
    bigrams(score)
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1.select(col("t").as("w1"), col("c1").as("c1w1")), Seq("w1"), "left")
      .join(c1.select(col("t").as("w2"), col("c1").as("c1w2")), Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("sb",
        when(col("c2").isNotNull, // seen ⇒ c1(w1) ≥ c2 ≥ 1, division safe
          expr(s"$scale * c2 div c1w1"))
          .otherwise(expr(s"$alphaScale * coalesce(c1w2, 0L) div total")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("sb")).as("sb_sum"))
      .withColumn("sb_score", expr("sb_sum div n_bigrams"))
  }
}
