package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Span-level (substring) duplication analysis — the finer-grained sibling of
  * document-level dedup (NearDedup): instead of asking "is this document a
  * near-copy of another", it asks "which SPANS of this document also occur
  * elsewhere in the corpus", the signal behind duplicated-span removal in
  * training-data pipelines (Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better" — there with suffix arrays; here with
  * positional word n-grams, the shuffle-friendly formulation).
  *
  * Extension surface beyond the reference's operator set (its dedup is
  * whole-row: /root/reference/pybabe/base.py primary-key dedup); span
  * duplication is the corpus-hygiene capability a 100 TB text pipeline needs.
  *
  * Scale shape: every stage is linear in corpus token count. Positional
  * n-grams are built with a narrow `transform` over the token array (no
  * explode until needed), the duplicated-gram set is one hash aggregation
  * keyed on the gram text, membership is a shuffle join on the same key, and
  * the run-length pass is a per-document window. Nothing is ever quadratic in
  * documents and no driver-side state exists. Degenerate boilerplate grams
  * (appearing in millions of docs) only widen ONE aggregation bucket — counts,
  * not pair lists — so no bucket cap is needed, unlike LSH candidate joins.
  */
object SpanDedup {

  /** Positional word n-grams over an already-projected token-array column;
    * documents shorter than `n` tokens contribute a single whole-document
    * gram at position 0 (same clamping contract as Contamination's
    * shingles). Takes the TOKEN column, not the text: Catalyst does not CSE
    * across lambda boundaries, so a `split` written inline here would
    * re-tokenize the document once per gram position (measured ~20x on this
    * very operator).
    */
  private def posGramArray(toks: Column, n: Int): Column =
    transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))

  /** Per-document span-duplication statistics over word `n`-grams:
    * `n_grams` (positional grams in the doc), `n_dup` (grams also present in
    * at least one OTHER document), and `max_dup_run` (longest run of
    * consecutive duplicated gram positions — a run of r grams is a duplicated
    * span of r + n - 1 tokens). `max_dup_run` is 0 for documents with no
    * duplicated gram. Downstream policy (trim the span, drop the doc, weight
    * the loss) composes on top of these columns.
    */
  def spanStats(docs: DataFrame, idCol: String, textCol: String,
                n: Int = 8): DataFrame = {
    // Two consumers (the dup-gram aggregation and the membership join)
    // re-execute the scan -> split -> gram kernel without a materialization
    // boundary — same localCheckpoint rationale as removeDupSpans below.
    // Spread a single-split scan before the tokenize+gram kernel (the
    // measured hot stage: one task owned the whole corpus at bench scale);
    // the exchange moves narrow doc rows, not the n×-bigger gram relation,
    // and is a no-op when the scan is already parallel.
    // The TOKEN arrays are materialized (narrow, ~corpus-sized) and both
    // consumers re-derive grams from the blocks: checkpointing the GRAMS
    // (n× the corpus in string form) cost more to write than the
    // spread-parallel gram kernel costs to run twice — the same trade
    // removeDupSpans documents below.
    val grams = Tuning.spread(
        docs.select(col(idCol).as("__id"),
          split(trim(coalesce(col(textCol), lit(""))), "\\s+").as("__toks")),
        col("__id"))
      .localCheckpoint()
      .select(col("__id"), posexplode(posGramArray(col("__toks"), n)).as(Seq("pos", "g")))
    // A gram is duplicated when >= 2 distinct documents contain it. The
    // aggregation is two-phase (partial count-distinct per map task), so a
    // boilerplate gram never concentrates rows on one reducer beyond its
    // per-partition partials.
    val dupGrams = grams.groupBy(col("g"))
      .agg(count_distinct(col("__id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("g"), lit(1).as("dup"))
    val marked = grams.join(dupGrams, Seq("g"), "left")
      .select(col("__id"), col("pos"),
        coalesce(col("dup"), lit(0)).as("dup"))
    // Everything per-doc happens in ONE pass on one exchange keyed by doc:
    // the islands trick (consecutive dup positions share pos - running-rank)
    // marks runs inside a window, then two stacked aggregations on the SAME
    // partitioning — per-island sizes, then per-doc totals — so Catalyst
    // plans a single shuffle and never executes the gram join twice (a
    // two-branch formulation re-ran the whole upstream; measured 2.4s -> it
    // was the dominant cost at sf0.1). Non-dup rows fall into one NULL
    // island per doc, which carries the gram/dup totals through.
    val wOrd = Window.partitionBy(col("__id")).orderBy(col("pos"))
    marked
      .withColumn("dgrp",
        when(col("dup") === 1, col("pos") - sum(col("dup")).over(wOrd)))
      .groupBy(col("__id"), col("dgrp"))
      .agg(count(lit(1)).as("c"), sum(col("dup")).as("d"))
      .groupBy(col("__id"))
      .agg(sum(col("c")).as("n_grams"), sum(col("d")).as("n_dup"),
        coalesce(max(when(col("dgrp").isNotNull, col("c"))), lit(0L))
          .as("max_dup_run"))
      .select(col("__id").as(idCol), col("n_grams"), col("n_dup"),
        col("max_dup_run"))
  }

  /** Duplicated-span REMOVAL — the policy [[spanStats]] only measures:
    * cut from each document every maximal run of duplicated positional
    * `n`-grams whose covered span is at least `minSpanTokens` tokens (a run
    * of r gram positions covers r + n - 1 tokens), and rebuild the text
    * from the surviving tokens. This is the operation of Lee et al. 2022
    * (ExactSubstr dedup) in the shuffle-friendly n-gram formulation: spans
    * long enough to be boilerplate/mirrored content are excised while both
    * copies' unique surroundings survive, which the paper shows beats
    * whole-document dropping on perplexity per token kept.
    *
    * Output: (idCol, clean_text, n_removed) — every input document appears
    * exactly once; `clean_text` is whitespace-normalized (single spaces),
    * "" when the whole document was duplicated; `n_removed` counts excised
    * tokens.
    *
    * Scale shape: linear end-to-end, no driver-side state. The duplicated
    * gram set is one two-phase count-distinct aggregation; coverage
    * expansion is bounded by corpus token count (each doc contributes at
    * most its own length); every join is an equi-join on (doc, position) or
    * gram text; the rebuild groups by document and sorts only WITHIN a
    * document (per-group memory bounded by document length — the same
    * contract as chunking). Degenerate boilerplate grams widen one
    * aggregation bucket (counts, not pair lists), so no cap is needed.
    */
  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 8, minSpanTokens: Int = 20): DataFrame = {
    // Three downstream branches consume this stage (the token rebuild, the
    // dup-gram aggregation, the membership join). Catalyst re-executes a
    // shared subplan per consumer, so without a materialization boundary the
    // scan -> split -> gram kernel runs three times (measured 3x the corpus
    // scan and a 5x wall regression at sf0.1). Eager localCheckpoint, the
    // windowMapGlobal pattern (BabeOps.windowMapGlobal): reclaimed by the
    // ContextCleaner, spills to disk, blocks only executor-loss recovery —
    // acceptable for a materialize-once scratch stage. Sizes are linear:
    // token arrays ~ corpus, grams ~ n x corpus.
    // Spread before tokenizing (see spanStats): the checkpointed token
    // blocks then carry the parallel layout into all three consumers.
    val tokenized = Tuning.spread(
        docs.select(col(idCol).as("__id"),
          split(trim(coalesce(col(textCol), lit(""))), "\\s+").as("__toks")),
        col("__id"))
      .localCheckpoint()
    val toks = tokenized
      .select(col("__id"), posexplode(col("__toks")).as(Seq("pos", "tok")))
      .select(col("__id"), col("pos").cast("long").as("pos"), col("tok"))
    // grams deliberately NOT materialized (round 15): the gram relation is
    // ~n× the corpus in STRING form, and writing it to block storage cost
    // more than re-running the (now spread-parallel) gram kernel once per
    // consumer — measured at sf1: the gram-checkpoint stage alone was
    // 4.5 s of q102's 5.5 s. Both consumers re-derive grams from the
    // checkpointed token arrays, which ARE materialized (narrow, shared by
    // three branches).
    val grams = tokenized
      .select(col("__id"), posexplode(posGramArray(col("__toks"), n)).as(Seq("pos", "g")))
    val dupGrams = grams.groupBy(col("g"))
      .agg(count_distinct(col("__id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("g"))
    // Maximal runs of duplicated gram positions (islands trick on the dup
    // rows only), kept when their token coverage reaches the threshold.
    val wOrd = Window.partitionBy(col("__id")).orderBy(col("pos"))
    val islands = grams.join(dupGrams, Seq("g"))
      .select(col("__id"), col("pos"))
      .withColumn("grp", col("pos") - row_number().over(wOrd))
      .groupBy(col("__id"), col("grp"))
      .agg(min(col("pos")).as("s0"), count(lit(1)).as("r"))
      .filter(col("r") + lit((n - 1).toLong) >= minSpanTokens.toLong)
    // Token positions covered by a qualifying run. Adjacent runs (separated
    // by one clean gram position but overlapping in token space when n > 2)
    // can cover the same token — hence the distinct.
    val covered = islands
      .select(col("__id"),
        explode(sequence(col("s0").cast("long"),
          col("s0").cast("long") + col("r") + lit((n - 2).toLong))).as("pos"))
      .distinct()
      .withColumn("cov", lit(1))
    toks.join(covered, Seq("__id", "pos"), "left")
      .groupBy(col("__id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("cov").isNull,
            struct(col("pos"), col("tok"))))),
          x => x.getField("tok"))).as("clean_text"),
        sum(when(col("cov").isNotNull, 1L).otherwise(0L)).as("n_removed"))
      .select(col("__id").as(idCol), col("clean_text"), col("n_removed"))
  }

  /** C4-style global LINE dedup: any non-blank line occurring in more than
    * one place in the corpus survives only at its FIRST occurrence (global
    * order = (doc id, line position) — deterministic, re-runs reproduce
    * it). Blank lines are structure, not content, and always survive.
    * Output: (idCol, clean_text, n_removed) — every input document appears
    * exactly once; clean_text rejoins surviving lines with '\n'.
    *
    * This is the line-level policy of the C4 pipeline (Raffel et al. 2020
    * — "we discard all but one of any three-sentence span occurring more
    * than once", here at line granularity like Dolma/RefinedWeb); the
    * n-gram span policy lives in [[removeDupSpans]].
    *
    * Scale shape: one shuffle keyed on the trimmed line text (first-
    * occurrence rank via window — counts of a boilerplate line concentrate
    * as ROWS of one key, never collected arrays), one shuffle back on the
    * doc key for the rebuild (per-group memory bounded by document
    * length). Linear end-to-end, no driver state.
    */
  def removeDupLines(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = docs
      .select(col(idCol).as("__id"),
        posexplode(split(coalesce(col(textCol), lit("")), "\n")).as(Seq("pos", "line")))
    val wFirst = Window.partitionBy(trim(col("line")))
      .orderBy(col("__id"), col("pos"))
    // blank lines are all "equal" under trim — routing them through the
    // window would funnel every blank line in the corpus into ONE
    // partition key (a guaranteed straggler at scale) only to override the
    // rank afterwards; keep them out of the shuffle entirely
    val kept = lines
      .filter(length(trim(col("line"))) > 0)
      .withColumn("rk", row_number().over(wFirst))
      .unionByName(lines
        .filter(length(trim(col("line"))) === 0)
        .withColumn("rk", lit(1)))
    // split() yields at least one (possibly blank) line per doc, so every
    // input doc reaches the groupBy — no restore join needed
    kept
      .groupBy(col("__id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("rk") === 1,
            struct(col("pos"), col("line"))))),
          x => x.getField("line")), "\n").as("clean_text"),
        sum(when(col("rk") > 1, 1L).otherwise(0L)).as("n_removed"))
      .select(col("__id").as(idCol), col("clean_text"), col("n_removed"))
  }
}
