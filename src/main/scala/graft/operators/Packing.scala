package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step between a cleaned corpus and a training run:
  * documents are laid out as one contiguous token stream per shard and
  * chopped into fixed-budget training sequences (documents may straddle a
  * boundary; the attention mask handles that downstream). Each doc gets the
  * sequence id and offset where it STARTS.
  *
  * Shape: one window per shard (running token sum), so the shuffle is a
  * single hash exchange on the shard column and each shard packs
  * independently — the natural parallelism of a sharded corpus. No global
  * order is imposed across shards (a global pack would funnel everything
  * through one partition; shards are how real pipelines keep this linear).
  */
object Packing {

  /** Assign (seq_id, seq_offset) per document from a greedy contiguous
    * layout: ordered by `orderCol` within `shardCol`, a document starting
    * at running-token-position s lands in sequence floor(s/budget) at
    * offset s % budget.
    *
    * The running sum uses an explicit ROWS frame so rows tied on
    * `orderCol` still get distinct, non-overlapping start positions (the
    * default RANGE frame would give every tie the same cumulative sum and
    * hence overlapping offsets). The layout is always valid; it is only
    * REPRODUCIBLE across runs when (shardCol, orderCol) is unique — pass a
    * unique order key (e.g. doc_id) when determinism matters.
    */
  def packSequences(docs: DataFrame, shardCol: String, orderCol: String,
                    tokens: Column, budget: Int): DataFrame = {
    require(budget > 0, "packSequences needs a positive token budget")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("__tok", tokens.cast("bigint"))
      .withColumn("__start", sum(col("__tok")).over(w) - col("__tok"))
      .withColumn("seq_id", floor(col("__start") / budget))
      .withColumn("seq_offset", col("__start") % budget)
      .drop("__start")
      .withColumnRenamed("__tok", "n_tokens")
  }

  /** Sliding-window chunking — the retrieval/embedding counterpart of
    * `packSequences`: each document is cut into overlapping windows of
    * `chunkSize` whitespace tokens whose starts step by `stride`
    * (stride < chunkSize gives chunkSize - stride tokens of overlap, the
    * standard RAG/embedding layout so no sentence is lost on a boundary).
    * Emits (chunk_id, tok_start, n_toks, chunk) per window; the final
    * window is partial when the document length is not aligned. Documents
    * chunk independently — a narrow map + explode, no shuffle, no state —
    * so this is embarrassingly parallel at any corpus size.
    */
  def chunkSliding(docs: DataFrame, idCol: String, textCol: String,
                   chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    // Tokens are projected to a bound column BEFORE the lambda references
    // them — Catalyst does not CSE across lambda boundaries, and an inline
    // `split` would re-tokenize the document once per chunk.
    val toks = col("__toks")
    // Start positions 0, stride, 2*stride, ... strictly below the token
    // count; the transform stays inside codegen and explode is the only
    // row-multiplying step.
    val lastStart = floor((size(toks) - 1).cast("double") / stride) * stride
    val chunks = transform(
      sequence(lit(0L), greatest(lastStart, lit(0L)), lit(stride.toLong)),
      s => struct(
        s.as("tok_start"),
        least(lit(chunkSize.toLong), size(toks) - s).as("n_toks"),
        concat_ws(" ", slice(toks, s.cast("int") + 1, lit(chunkSize))).as("chunk")))
    docs.select(col(idCol), split(trim(col(textCol)), "\\s+").as("__toks"))
      .select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "c")))
      .select(col(idCol), col("chunk_id").cast("bigint").as("chunk_id"),
        col("c.tok_start"), col("c.n_toks"), col("c.chunk"))
  }

  /** Sentence-respecting chunking — the RAG/embedding-index variant of
    * [[chunkSliding]]: never cut inside a sentence. Sentences fill a chunk
    * until the cumulative token count crosses the budget; the straddling
    * sentence stays with its chunk (a chunk can exceed the budget by one
    * sentence — the price of never splitting one; a single over-budget
    * sentence becomes its own chunk). Chunk ids are dense per doc.
    *
    * The rule is positional arithmetic, not a sequential scan: a sentence's
    * chunk = (exclusive running token sum) div budget, densified —
    * deterministic, engine-replayable, and expressible as two windows over
    * the per-doc sentence stream. Output: (doc_id, chunk_id, text,
    * n_sentences, n_toks).
    *
    * Scale shape: one explode of the sentence array, two windows and one
    * aggregation all partitioned by doc — per-group memory is bounded by
    * the longest document, nothing is corpus-wide, and docs chunk
    * embarrassingly parallel.
    */
  def chunkBySentences(docs: DataFrame, idCol: String, textCol: String,
                       budget: Int): DataFrame = {
    require(budget > 0, s"chunkBySentences needs budget > 0, got $budget")
    val sen = docs
      .select(col(idCol).as("doc_id"),
        posexplode(graft.functions.TextFunctions.sentences(
          coalesce(col(textCol), lit("")))).as(Seq("pos", "sentence")))
      // sentences() space-normalizes, so tokens are exactly the
      // single-space splits — no empty tokens possible
      .withColumn("n_toks", size(split(col("sentence"), " ")).cast("long"))
    val cum = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val dense = Window.partitionBy(col("doc_id")).orderBy(col("raw_chunk"))
    sen
      .withColumn("cum", coalesce(sum(col("n_toks")).over(cum), lit(0L)))
      .withColumn("raw_chunk", expr(s"cum div $budget"))
      .withColumn("chunk_id", (dense_rank().over(dense) - 1).cast("long"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("sentence")))),
          p => p.getField("sentence")), " ").as("text"),
        count(lit(1)).as("n_sentences"),
        sum(col("n_toks")).as("n_toks"))
  }
}
