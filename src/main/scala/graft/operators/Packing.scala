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
    */
  def packSequences(docs: DataFrame, shardCol: String, orderCol: String,
                    tokens: Column, budget: Int): DataFrame = {
    require(budget > 0, "packSequences needs a positive token budget")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
    docs.withColumn("__tok", tokens.cast("bigint"))
      .withColumn("__start", sum(col("__tok")).over(w) - col("__tok"))
      .withColumn("seq_id", floor(col("__start") / budget))
      .withColumn("seq_offset", col("__start") % budget)
      .drop("__start")
      .withColumnRenamed("__tok", "n_tokens")
  }
}
