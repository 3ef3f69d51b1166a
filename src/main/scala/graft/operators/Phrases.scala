package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Collocation (phrase) mining — the word2phrase pass of Mikolov et al.
  * 2013 ("Distributed Representations of Words and Phrases", §4): adjacent
  * word pairs whose co-occurrence beats an independence baseline,
  * score(a,b) = (count(ab) − δ) · N / (count(a) · count(b)), become phrase
  * candidates ("new_york", "ice_cream"). A corpus-curation engine uses the
  * same statistic for tokenizer-vocabulary seeding and boilerplate phrase
  * discovery. The reference's closest surface is its group/count reducers
  * (/root/reference/pybabe/group.py, SURVEY §2.5) — this is that
  * machinery pointed at bigram statistics.
  *
  * Everything stays in exact integers: the score is carried as the
  * cross-multiplied pair (score_num = (c_ab − δ) · N, score_den = c_a · c_b)
  * and the threshold test is score_num ≥ t · score_den — no floating-point
  * division anywhere, so any engine reproduces the rows bit-for-bit.
  * Overflow bound: score_num ≤ N², fine to N ≈ 3·10⁹ tokens per mining run;
  * beyond that, mine per shard and merge counts (they're additive).
  */
object Phrases {

  /** Lowercased whitespace tokens of non-empty documents. */
  private def tokenized(docs: DataFrame, textCol: String): DataFrame =
    docs
      .filter(trim(coalesce(col(textCol), lit(""))) =!= "")
      .select(split(trim(lower(col(textCol))), "\\s+").as("__toks"))

  /** Mine adjacent-pair collocations from `textCol`.
    *
    * Output: (w1, w2, c_ab, c_a, c_b, score_num, score_den) for pairs with
    * c_ab ≥ minCount and score_num ≥ threshold · score_den.
    *
    * Plan shape: the token arrays materialize once (localCheckpoint — three
    * consumers: unigram counts, bigram counts, and N); bigrams are built
    * in-codegen from the array (transform over an index sequence), so the
    * only exchanges are the two word-keyed count aggregations (map-side
    * partials, vocabulary-wide — not corpus-wide) and the two
    * vocabulary-sized equi-joins attaching c_a and c_b. N rides in as a
    * broadcast one-row cross join. Nothing is ever keyed by document, and
    * no stage holds more than the vocabulary.
    */
  def collocations(docs: DataFrame, textCol: String,
                   minCount: Long = 5L, delta: Long = 5L,
                   threshold: Long = 2L): DataFrame = {
    val toks = tokenized(docs, textCol).localCheckpoint()
    val uni = toks
      .select(explode(col("__toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val totalN = uni.agg(sum(col("c")).cast(LongType).as("__n"))
    val bi = toks
      .filter(size(col("__toks")) >= 2)
      .select(explode(transform(
        sequence(lit(0), size(col("__toks")) - 2),
        i => struct(element_at(col("__toks"), i + 1).as("w1"),
          element_at(col("__toks"), i + 2).as("w2")))).as("p"))
      .select(col("p.w1"), col("p.w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    bi
      .join(uni.select(col("w").as("w1"), col("c").as("c_a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c_b")), Seq("w2"))
      .crossJoin(broadcast(totalN))
      .withColumn("score_num", (col("c_ab") - lit(delta)) * col("__n"))
      .withColumn("score_den", col("c_a") * col("c_b"))
      .filter(col("score_num") >= lit(threshold) * col("score_den"))
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        col("score_num"), col("score_den"))
  }
}
