package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — remove training documents that share any
  * word n-gram with an evaluation/benchmark corpus, so the model is never
  * trained on (near-verbatim) test material. The standard shape at scale:
  * benchmarks are megabytes while the corpus is terabytes, so the benchmark
  * n-gram set broadcasts and the corpus side stays a single narrow pass —
  * explode the document shingles, broadcast-LEFT-SEMI against the benchmark
  * grams to find contaminated ids, anti-join them away. No corpus shuffle
  * anywhere; cost is linear in corpus token count.
  */
object Contamination {

  /** Ids of documents sharing at least one `n`-gram with the benchmark. */
  def contaminatedIds(docs: DataFrame, idCol: String, textCol: String,
                      benchmark: DataFrame, benchTextCol: String,
                      n: Int = 8): DataFrame = {
    val benchGrams = benchmark
      .select(explode(graft.expressions.GraftFunctions.shingles(col(benchTextCol), n)).as("g"))
      .distinct()
    docs.select(col(idCol),
        explode(graft.expressions.GraftFunctions.shingles(col(textCol), n)).as("g"))
      .join(broadcast(benchGrams), Seq("g"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** The corpus minus every document contaminated by the benchmark. */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    benchmark: DataFrame, benchTextCol: String,
                    n: Int = 8): DataFrame =
    docs.join(contaminatedIds(docs, idCol, textCol, benchmark, benchTextCol, n),
      Seq(idCol), "left_anti")

  /** Stateless variant over a driver-held benchmark gram set: each row is
    * kept iff its shingles don't overlap the set. Because it is a pure
    * per-row filter (the gram set ships as a broadcast-style literal, no
    * join, no state), it composes with Structured Streaming unchanged —
    * decontaminating an unbounded ingest feed with the same expression the
    * batch path uses. Benchmarks are small (MBs of n-grams); for
    * benchmark sets too big for a literal, use `decontaminate`'s semi-join.
    */
  def decontaminateByGramSet(docs: DataFrame, textCol: String,
                             benchGrams: Seq[String], n: Int = 8): DataFrame =
    // coalesce: NULL text -> NULL shingles -> NULL overlap, which a bare
    // filter would DROP; null-text rows are uncontaminated by definition
    // (matching the batch path, where they never produce gram rows)
    docs.filter(coalesce(!arrays_overlap(
      graft.expressions.GraftFunctions.shingles(col(textCol), n),
      typedLit(benchGrams)), lit(true)))

  // -----------------------------------------------------------------------
  // Bloom-filter decontamination — the constant-size variant of the
  // semi-join above. `decontaminate` broadcasts the benchmark's DISTINCT
  // n-grams (fine for MB-scale benchmarks); when the exclusion set grows to
  // hundreds of millions of grams (aggregated eval suites, all previously
  // shipped training shards), the standard move is a Bloom filter: an m-bit
  // array with k hash positions per gram, giving a FIXED broadcast size and
  // a bounded false-positive rate (1 - e^{-kG/m})^k, false negatives never.
  // The bit array is represented as its SET-POSITION table (<= m rows of
  // longs) so the whole pipeline stays declarative AND ANSI-replayable: a
  // position set IS a Bloom bitmap, just stored sparse. Positions use the
  // repo's portable 60-bit md5 fold with the hash index as a prefix salt,
  // so any engine that can md5 can rebuild and audit the filter.
  // -----------------------------------------------------------------------

  /** The k Bloom positions of one gram: pos_i = md5_60(i ++ ":" ++ gram) % m
    * (the shared salted-hash basis in [[Sampling.saltedPositions]]).
    */
  def bloomPositions(gram: Column, k: Int, m: Long): Column =
    Sampling.saltedPositions(gram, k, m)

  /** Build the filter from a benchmark corpus: the distinct set positions of
    * every word n-gram. At most m rows (one long each) regardless of
    * benchmark size — materialize once with `Memoize.memoize` and reuse
    * across corpus shards.
    */
  def bloomBuild(benchmark: DataFrame, benchTextCol: String,
                 n: Int = 8, k: Int = 3, m: Long = 1 << 20): DataFrame =
    benchmark
      .select(explode(graft.expressions.GraftFunctions.shingles(col(benchTextCol), n)).as("g"))
      .select(explode(bloomPositions(col("g"), k, m)).as("pos"))
      .distinct()

  /** Per-document Bloom verdict: (id, hit_grams) for every document with at
    * least one n-gram whose k positions are ALL set in `bits`. ONE linear
    * pipeline over the corpus: explode grams, explode positions, broadcast
    * left join against the fixed-size position set, then a min-aggregate
    * per (id, gram) — a gram hits iff its MINIMUM set-marker is 1 (every
    * position present), and the same aggregation dedups repeated grams, so
    * the corpus is scanned once and only two exchanges run ((id, gram),
    * then id).
    */
  def bloomContaminatedIds(docs: DataFrame, idCol: String, textCol: String,
                           bits: DataFrame, n: Int = 8, k: Int = 3,
                           m: Long = 1 << 20): DataFrame =
    docs.select(col(idCol),
        explode(graft.expressions.GraftFunctions.shingles(col(textCol), n)).as("g"))
      .select(col(idCol), col("g"), explode(bloomPositions(col("g"), k, m)).as("pos"))
      .join(broadcast(bits.select(col("pos"), lit(1).as("set"))), Seq("pos"), "left")
      .groupBy(col(idCol), col("g"))
      .agg(min(coalesce(col("set"), lit(0))).as("allset"))
      .filter(col("allset") === 1)
      .groupBy(col(idCol)).agg(count(lit(1)).as("hit_grams"))

  /** The corpus minus every document the Bloom filter flags. Supersets the
    * exact `decontaminate` result (false positives drop extra docs at the
    * configured rate; false negatives cannot happen), which is the safe
    * direction for decontamination.
    */
  def bloomDecontaminate(docs: DataFrame, idCol: String, textCol: String,
                         benchmark: DataFrame, benchTextCol: String,
                         n: Int = 8, k: Int = 3, m: Long = 1 << 20): DataFrame = {
    val bits = bloomBuild(benchmark, benchTextCol, n, k, m)
    docs.join(bloomContaminatedIds(docs, idCol, textCol, bits, n, k, m),
      Seq(idCol), "left_anti")
  }

  /** Contamination ATTRIBUTION — not just which documents overlap the
    * benchmark but WHERE: maximal word-index spans of overlapping
    * benchmark n-gram hits per document (doc_id, start_word, end_word,
    * n_grams). Hits whose word ranges share any word (position gap < n)
    * merge into one span, so emitted spans are disjoint and a consumer may
    * sum or excise them row-by-row without double-counting.
    * The audit surface behind a decontamination decision — a
    * reviewer sees the leaked passage, distinguishes a quoted benchmark
    * question from an incidental idiom, and tunes n accordingly; it is
    * also what span-level excision (SpanDedup.removeDupSpans' policy)
    * consumes when dropping whole documents is too blunt.
    *
    * Only full n-gram positions participate: documents (and benchmark
    * rows) shorter than n words produce no grams here — use
    * [[contaminatedIds]]'s whole-text fallback for the sub-n edge.
    *
    * Scale shape: benchmark grams broadcast (eval-set sized); the corpus
    * explodes to positional grams once, the hit set is candidate-sized,
    * and the islands merge (lag + running sum of new-island flags) is two
    * passes over one window partition keyed by doc — per-group memory
    * bounded by a doc's hit count.
    */
  def contaminationSpans(docs: DataFrame, idCol: String, textCol: String,
                         benchmark: DataFrame, benchTextCol: String,
                         n: Int = 8): DataFrame = {
    require(n >= 1, s"contaminationSpans needs n >= 1, got $n")
    def posGrams(df: DataFrame, id: Column, text: Column): DataFrame =
      df.select(id.as("__id"),
          filter(split(trim(coalesce(text, lit(""))), "\\s+"),
            w => length(w) > 0).as("w"))
        .filter(size(col("w")) >= n)
        .select(col("__id"), explode(expr(
          s"transform(sequence(1, size(w) - ${n - 1}), " +
            s"i -> struct(CAST(i - 1 AS BIGINT) AS pos, " +
            s"array_join(slice(w, CAST(i AS INT), $n), ' ') AS g))")).as("p"))
        .select(col("__id"), col("p.pos"), col("p.g"))
    val benchGrams = posGrams(benchmark, lit(0L), col(benchTextCol))
      .select(col("g")).distinct()
    val hits = posGrams(docs, col(idCol), col(textCol))
      .join(broadcast(benchGrams), Seq("g"), "left_semi")
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id")).orderBy(col("pos"))
    // Two hits belong to one island when their WORD RANGES overlap, i.e.
    // the position gap is < n — not only when positions are consecutive.
    // Otherwise hits at p and p+2 (n > 2) emit two rows sharing words, and
    // a consumer that sums or excises per-row double-counts the overlap.
    hits.withColumn("grp",
        sum(when(col("pos") - lag(col("pos"), 1).over(wOrd) < n, lit(0))
          .otherwise(lit(1)))
          .over(wOrd.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("__id"), col("grp"))
      .agg(min(col("pos")).as("start_word"),
        (max(col("pos")) + lit(n - 1).cast("long")).as("end_word"),
        count(lit(1)).as("n_grams"))
      .select(col("__id").as(idCol), col("start_word"), col("end_word"),
        col("n_grams"))
  }

  /** Span EXCISION — the surgical alternative to dropping contaminated
    * documents: cut exactly the leaked word ranges [[contaminationSpans]]
    * attributes and keep the rest of the text. Dropping whole documents
    * (the [[decontaminate]] policy) wastes every clean word around a
    * quoted benchmark question; excision is what C4-style pipelines apply
    * when the contamination is a passage, not the document. Returns one
    * row per input document: (id, clean_text, n_removed_words) — clean
    * documents pass through with their words rejoined and 0 removed.
    *
    * Correctness leans on the spans contract: spans are DISJOINT (overlap
    * merged upstream), so removed-word accounting is a plain sum and no
    * word is cut twice.
    *
    * Scale shape: one spans pass (benchmark grams broadcast, see
    * [[contaminationSpans]]), spans fold to a per-doc array bounded by the
    * doc's island count, and the excision itself is a doc-keyed LEFT join
    * plus a per-row lambda over the word array — no extra corpus shuffle
    * beyond the spans aggregation's.
    */
  def exciseContaminatedSpans(docs: DataFrame, idCol: String, textCol: String,
                              benchmark: DataFrame, benchTextCol: String,
                              n: Int = 8): DataFrame = {
    val spans = contaminationSpans(docs, idCol, textCol, benchmark, benchTextCol, n)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("start_word").as("s"), col("end_word").as("e")))
        .as("__spans"))
    docs
      .select(col(idCol),
        filter(split(trim(coalesce(col(textCol), lit(""))), "\\s+"),
          w => length(w) > 0).as("__w"))
      .join(spans, Seq(idCol), "left")
      .withColumn("__sp",
        coalesce(col("__spans"), array().cast("array<struct<s:bigint,e:bigint>>")))
      .withColumn("__kept", filter(col("__w"), (w, i) =>
        !exists(col("__sp"), s =>
          i.cast("long") >= s.getField("s") && i.cast("long") <= s.getField("e"))))
      .select(col(idCol),
        array_join(col("__kept"), " ").as("clean_text"),
        (size(col("__w")) - size(col("__kept"))).cast("long").as("n_removed_words"))
  }

  /** SEMANTIC decontamination — the embedding-level companion of the
    * n-gram/Bloom surface above: flag every corpus vector whose cosine to
    * ANY benchmark vector reaches `minCosine`. Lexical overlap checks miss
    * paraphrased benchmark leakage ("rephrased samples" — Yang et al.
    * 2023's contamination study); embedding proximity is the signal that
    * survives rewording. Returns (id, max_cosine, n_hits) per contaminated
    * vector — max_cosine grades severity, n_hits says how many benchmark
    * items it shadows.
    *
    * Scale shape: the benchmark is eval-set sized, so it broadcasts and
    * the corpus is scanned ONCE (BroadcastNestedLoopJoin against the k-row
    * build side — the brute-force-ANN shape, compiled cosine kernel, no
    * shuffle of vectors); the aggregation keys on the corpus id. For
    * benchmark sets too big to broadcast, pre-bucket both sides with the
    * sign-LSH family and run this per bucket.
    */
  def semanticContaminatedIds(corpus: DataFrame, idCol: String, vecCol: String,
                              benchmark: DataFrame, minCosine: Double): DataFrame = {
    require(minCosine > 0.0 && minCosine <= 1.0,
      s"minCosine must be in (0, 1], got $minCosine")
    corpus.select(col(idCol), col(vecCol).as("__cv"))
      .crossJoin(broadcast(benchmark.select(col(vecCol).as("__bv"))))
      .withColumn("__c", graft.functions.VectorFunctions.cosine(col("__cv"), col("__bv")))
      .filter(col("__c") >= minCosine)
      .groupBy(col(idCol))
      .agg(max(col("__c")).as("max_cosine"), count(lit(1)).as("n_hits"))
  }

  /** The corpus with semantically contaminated vectors removed. */
  def semanticDecontaminate(corpus: DataFrame, idCol: String, vecCol: String,
                            benchmark: DataFrame, minCosine: Double): DataFrame =
    corpus.join(
      semanticContaminatedIds(corpus, idCol, vecCol, benchmark, minCosine)
        .select(col(idCol)),
      Seq(idCol), "left_anti")
}
