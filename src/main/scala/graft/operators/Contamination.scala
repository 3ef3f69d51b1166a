package graft.operators

import org.apache.spark.sql.DataFrame
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
}
