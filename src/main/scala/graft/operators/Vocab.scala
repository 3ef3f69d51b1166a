package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

/** Tokenizer-induction surfaces: unigram vocabulary statistics and
  * byte-pair-encoding merge training (Sennrich et al. 2016) — the step
  * between a cleaned corpus and a tokenizer. The reference has nothing in
  * this space (its string ops are per-row transforms); a 100 TB pipeline
  * trains its vocabulary from the corpus itself.
  *
  * Scale shape: everything runs on the WORD-FREQUENCY table, not the
  * corpus — the classic BPE trick. One corpus-sized aggregation (word
  * count, two-phase map-side combined) collapses 100 TB of text to a
  * vocabulary-sized table; every merge round then costs one aggregation
  * over that small table. The driver only ever sees k rows (top-k
  * queries) or one row per merge round (the argmax pair — that row IS the
  * model parameter being learned, not data).
  */
object Vocab {

  private def words(docs: DataFrame, textCol: String): DataFrame =
    docs.select(
      explode(split(trim(coalesce(col(textCol), lit(""))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)

  /** (word, freq) over the corpus — the table every other surface here
    * consumes. Two-phase hash aggregation; output is vocabulary-sized.
    */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    words(docs, textCol).groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Top-`vocabSize` vocabulary with cumulative corpus coverage:
    * (rank, token, cnt, coverage) where coverage is the fraction of all
    * token occurrences a vocabulary cut at that rank would cover — the
    * curve tokenizer sizing reads. Ties break lexicographically so the
    * cut is deterministic. The ranking is a TakeOrderedAndProject (per
    * partition top-k, no global sort); the cumulative window runs over
    * the ALREADY-CUT vocabSize rows, so its single partition holds
    * vocabSize rows by construction, never corpus data. Counts stay
    * integer until one final division (bit-portable).
    */
  def vocabCoverage(docs: DataFrame, textCol: String,
                    vocabSize: Int): DataFrame = {
    require(vocabSize > 0, "need a positive vocabulary size")
    val wf = wordFreq(docs, textCol)
    val total = wf.agg(sum(col("freq")).as("total"))
    val top = wf.orderBy(col("freq").desc, col("word").asc).limit(vocabSize)
    val w = Window.orderBy(col("freq").desc, col("word").asc)
    top
      .withColumn("rank", row_number().over(w))
      .withColumn("cum", sum(col("freq")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("rank").cast(LongType).as("rank"), col("word").as("token"),
        col("freq").as("cnt"),
        (col("cum").cast("double") / col("total").cast("double")).as("coverage"))
  }

  /** Encode each document into its token-id sequence under a word-level
    * vocabulary frame (token, id) — the corpus -> ids step between
    * vocabulary induction and sequence packing. Out-of-vocabulary words map
    * to `oovId`. Output: (idCol, ids, n_tokens, n_oov).
    *
    * Scale shape: the vocabulary broadcasts (it is vocabulary-sized by
    * definition); the corpus side is explode-with-position -> broadcast
    * left join -> one per-doc aggregation whose `array_sort` on (pos, id)
    * structs restores token order exactly — per-group memory bounded by
    * document length, the same contract as the chunking/packing operators.
    */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
                vocab: DataFrame, oovId: Long = 0L): DataFrame = {
    val toks = docs.select(col(idCol),
        posexplode(split(trim(coalesce(col(textCol), lit(""))), "\\s+")))
      .toDF(idCol, "pos", "word")
      .filter(length(col("word")) > 0)
    val encoded = toks
      .join(broadcast(vocab.select(col("token").as("word"), col("id"))),
        Seq("word"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("id"), lit(oovId)).cast(LongType).as("tid"))
      .groupBy(col(idCol))
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("tid")))),
          x => x.getField("tid")).as("ids"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("tid") === oovId, 1L).otherwise(0L)).as("n_oov"))
    // empty/whitespace/null docs produce no token rows; restore them with
    // an empty ids array so EVERY input doc appears exactly once
    docs.select(col(idCol)).join(encoded, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("ids"), array().cast("array<bigint>")).as("ids"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
  }

  /** Inverse of [[encodeIds]]: token-id arrays back to text under the same
    * vocabulary frame. OOV sentinels render as `oovMark`. Same broadcast +
    * order-restoring shape; round-trips exactly for fully in-vocabulary
    * documents.
    */
  def decodeIds(encoded: DataFrame, idCol: String, idsCol: String,
                vocab: DataFrame, oovMark: String = "<unk>"): DataFrame = {
    val toks = encoded.select(col(idCol),
      posexplode(col(idsCol))).toDF(idCol, "pos", "tid")
    toks.join(broadcast(vocab.select(col("id").as("tid"), col("token"))),
        Seq("tid"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("token"), lit(oovMark)).as("w"))
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")), " ").as("text"))
  }

  /** A word as its BPE symbol sequence: characters plus the canonical
    * end-of-word marker (Sennrich et al. 2016 §3.2 — the marker keeps
    * word-final merges distinct from word-internal ones).
    */
  val EndMark = "</w>"
  def charSymbols(word: Column): Column =
    concat(
      transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))),
      array(lit(EndMark)))

  /** Frequency-weighted adjacent-pair counts over a (syms, freq) table —
    * one BPE round's statistics: (a, b, cnt). Pairs explode from the
    * symbol arrays (bounded by word length), then one hash aggregation on
    * the pair key.
    */
  def pairCounts(wordsWithSyms: DataFrame): DataFrame =
    wordsWithSyms
      // fully-merged words (one symbol) have no adjacent pairs; without
      // this filter sequence(1, 0) yields the DESCENDING [1, 0] and
      // element_at(syms, 0) throws once any word merges to a single symbol
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("a"),
          element_at(col("syms"), i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Greedy left-to-right merge of every (a, b) adjacency into the single
    * symbol a+b — one BPE merge applied to a symbol array. The fold keys
    * on the last element of the accumulated output, which is exactly the
    * left-to-right non-overlapping semantics ("o o o" under (o,o) gives
    * ["oo","o"]). Runs on the word table, so the quadratic array copy is
    * bounded by word length.
    */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms,
      array().cast(ArrayType(StringType)),
      (out, s) => when(
        size(out) > 0 && element_at(out, -1) === lit(a) && s === lit(b),
        concat(slice(out, lit(1), size(out) - 1), array(lit(a + b))))
        .otherwise(concat(out, array(s))))

  /** Learn `nMerges` BPE merges from the corpus. Per round: one pair-count
    * aggregation over the word table, a 1-row argmax collect (count desc,
    * then lexicographic — fully deterministic), and a narrow merge map.
    * The word table is localCheckpointed each round (iterative lineage
    * otherwise compounds). Returns the merge list in order — the model.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[(String, String)] = {
    require(nMerges > 0, "need a positive merge count")
    var tbl = wordFreq(docs, textCol)
      .select(charSymbols(col("word")).as("syms"), col("freq"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val top = pairCounts(tbl)
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val next = tbl.withColumn("syms", applyMerge(col("syms"), a, b))
          .localCheckpoint()
        // the merged table is materialized — free the superseded round's
        // blocks now instead of leaving nMerges dead checkpoints for the
        // ContextCleaner (same hygiene as Clustering's loops)
        Checkpoints.dropCheckpoint(tbl)
        tbl = next
      }
      round += 1
    }
    // the model is the merge list; the last word table is dead too
    Checkpoints.dropCheckpoint(tbl)
    merges.result()
  }

  /** Tokenize text with a learned merge list: whitespace words to char
    * symbols, merges replayed in training order. A narrow map — the merge
    * list compiles into the expression tree, nothing ships at runtime.
    */
  def encode(text: Column, merges: Seq[(String, String)]): Column = {
    val perWord = (w: Column) =>
      merges.foldLeft(charSymbols(w))((s, m) => applyMerge(s, m._1, m._2))
    flatten(transform(split(trim(text), "\\s+"), perWord))
  }
}
