package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Deterministic sampling and splitting for training-data pipelines.
  *
  * Everything here is a pure function of a key column — no `rand()`. That is
  * the property that matters at 100 TB: task retries, speculative execution,
  * and AQE re-runs all re-execute partitions, and a stochastic sample would
  * give each attempt a DIFFERENT subset (non-deterministic output, broken
  * exactly-once sinks). A hash-derived sample is also stable across runs and
  * machines, so train/val/test membership can be re-derived from the raw data
  * at any time instead of being stored.
  *
  * The hash is the repo's portable 60-bit md5 fold (first 15 hex digits of
  * md5), the same basis as the portable LSH twins — ANSI-SQL replayable, so
  * split assignment can be audited from any engine that reads the same
  * parquet.
  */
object Sampling {

  /** First 60 bits of md5(key) as a non-negative long; uniform enough for
    * percentage bucketing and replayable outside the JVM (unlike xxhash64).
    */
  def portableHash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast(LongType)

  /** The k salted positions of one item in a size-m table:
    * pos_i = md5_60(i ++ ":" ++ item) % m — the shared basis of the Bloom
    * filter (bit positions) and the count-min sketch (row cells), portable
    * for the same reason as [[portableHash60]].
    */
  def saltedPositions(item: Column, k: Int, m: Long): Column =
    array((0 until k).map { i =>
      pmod(portableHash60(concat(lit(s"$i:"), item)), lit(m))
    }: _*)

  /** Tag each row with a split label from `splits` — (name, percent) pairs
    * whose percents must sum to 100. Assignment is `hash(key) % 100` against
    * cumulative thresholds: a row's split NEVER changes when other rows are
    * added or removed, and re-runs reproduce it bit-for-bit. A narrow map —
    * no shuffle, no state. NULL keys hash to NULL and fall through every
    * threshold into the LAST split — filter them out first if that is not
    * the intended landing zone.
    */
  def hashSplit(df: DataFrame, keyCol: Column,
                splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100,
      s"split percents must sum to 100, got $splits")
    val bucket = portableHash60(keyCol) % 100
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val labeled = splits.zip(cum).foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), rest) => when(bucket < hi, name).otherwise(rest)
    }
    df.withColumn("split", labeled)
  }

  /** Leakage-free train/val/test split: assign every member of a
    * near-duplicate cluster to the SAME split by keying [[hashSplit]] on
    * the cluster representative instead of the row id. Splitting by raw id
    * leaks — Lee et al. 2022 measured C4 train/val near-dup overlap, which
    * silently inflates eval scores — and the fix is structural: the split
    * key must be constant across each duplicate class. `pairs` is any
    * near-dup pair relation (Jaccard, MinHash, SimHash, embedding);
    * unpaired docs key on their own id. The emitted `split_key` column
    * makes the assignment auditable: equal keys ⇒ equal split, by
    * construction.
    *
    * Scale shape: one connected-components labeling of the PAIR relation
    * (bounded by docs that have a duplicate, not the corpus), one left
    * join of the corpus against it, then the narrow hash map — membership
    * stays a pure function of (pair relation, id), re-derivable on any
    * engine.
    */
  def leakageFreeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                       splits: Seq[(String, Int)],
                       aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val labels = Clustering.connectedComponents(pairs, aCol, bCol)
      .select(col("id").as(idCol), col("comp"))
    val keyed = df.join(labels, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("comp"), col(idCol)))
      .drop("comp")
    hashSplit(keyed, col("split_key"), splits)
  }

  /** Fill a token budget by quality priority — the "select the best 1T
    * tokens" step between scoring and training: take documents from the
    * highest score down until the budget is exhausted, never exceeding it.
    * Returns the selected (id, score, n_toks) rows.
    *
    * There is NO global sort: per-score token mass cumulates over the
    * DISTINCT-score relation (bounded by the score domain — the
    * exactQuantilesLong contract), which yields the set of fully-included
    * scores and the single boundary score in one pass. Only documents AT
    * the boundary score need within-value ordering, and that order is the
    * portable hash of the id (deterministic, engine-replayable, no
    * quality-correlated bias) — a greedy fill that stops before the first
    * document that would cross the remaining budget. The one partition-
    * sized stage is bounded by the boundary score's multiplicity, not the
    * corpus; coarsen or refine the score to trade boundary size against
    * selection granularity.
    */
  def selectToTokenBudget(df: DataFrame, idCol: String, scoreCol: Column,
                          tokensCol: Column, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val base = df.select(col(idCol), scoreCol.cast("long").as("score"),
        tokensCol.cast("long").as("n_toks"))
      .filter(col("score").isNotNull && col("n_toks").isNotNull &&
        col("n_toks") > 0)
    val perScore = base.groupBy(col("score")).agg(sum(col("n_toks")).as("st"))
    val wS = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val marked = perScore
      .withColumn("before", coalesce(sum(col("st")).over(wS), lit(0L)))
    val fullIn = marked.filter(col("before") + col("st") <= budget)
      .select(col("score"))
    val boundary = marked
      .filter(col("before") < budget && col("before") + col("st") > budget)
      .select(col("score"), (lit(budget) - col("before")).as("remaining"))
    val wB = Window.partitionBy(col("score")).orderBy(col("h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boundaryPick = base.join(broadcast(boundary), Seq("score"))
      .withColumn("h", portableHash60(col(idCol)))
      .withColumn("cum", coalesce(sum(col("n_toks")).over(wB), lit(0L)))
      .filter(col("cum") + col("n_toks") <= col("remaining"))
      .select(col(idCol), col("score"), col("n_toks"))
    base.join(broadcast(fullIn), Seq("score"))
      .select(col(idCol), col("score"), col("n_toks"))
      .unionByName(boundaryPick)
  }

  /** Per-group [[selectToTokenBudget]] — fill an INDEPENDENT token budget
    * for every group (source, language, domain): `budgets` is a (group,
    * budget) relation, typically the epoch allocation
    * [[temperatureMixWeights]] emits, so "compute the mix, then fill each
    * source's share best-first" is a two-operator pipeline. Same
    * never-exceed greedy semantics per group; with the cumulative and
    * boundary windows both partitioned by group there is NO
    * single-partition stage anywhere — the operator scales with the
    * largest group's score domain and boundary multiplicity.
    */
  def selectToTokenBudgetPerGroup(df: DataFrame, idCol: String,
                                  groupCol: String, scoreCol: Column,
                                  tokensCol: Column,
                                  budgets: DataFrame): DataFrame = {
    val base = df.select(col(idCol), col(groupCol),
        scoreCol.cast("long").as("score"), tokensCol.cast("long").as("n_toks"))
      .filter(col("score").isNotNull && col("n_toks").isNotNull &&
        col("n_toks") > 0)
      .join(broadcast(budgets.select(col(groupCol),
        col("budget").cast("long").as("budget"))), Seq(groupCol))
    val perScore = base.groupBy(col(groupCol), col("score"))
      .agg(sum(col("n_toks")).as("st"), first(col("budget")).as("budget"))
    val wS = Window.partitionBy(col(groupCol)).orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val marked = perScore
      .withColumn("before", coalesce(sum(col("st")).over(wS), lit(0L)))
    val fullIn = marked.filter(col("before") + col("st") <= col("budget"))
      .select(col(groupCol), col("score"))
    val boundary = marked
      .filter(col("before") < col("budget") &&
        col("before") + col("st") > col("budget"))
      .select(col(groupCol), col("score"),
        (col("budget") - col("before")).as("remaining"))
    val wB = Window.partitionBy(col(groupCol), col("score"))
      .orderBy(col("h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boundaryPick = base.join(boundary, Seq(groupCol, "score"))
      .withColumn("h", portableHash60(col(idCol)))
      .withColumn("cum", coalesce(sum(col("n_toks")).over(wB), lit(0L)))
      .filter(col("cum") + col("n_toks") <= col("remaining"))
      .select(col(idCol), col(groupCol), col("score"), col("n_toks"))
    base.join(fullIn, Seq(groupCol, "score"))
      .select(col(idCol), col(groupCol), col("score"), col("n_toks"))
      .unionByName(boundaryPick)
  }

  /** Weighted corpus mixing — re-weight each row by a percentage (possibly
    * over 100): a row with weight w is emitted floor(w/100) times plus one
    * more when hash(key) % 100 < w % 100, under a `copy` index column. This
    * is the training-mix step (sources seen for more or fewer than one
    * epoch, à la The Pile's per-set epochs): weight 250 means ~2.5 epochs
    * of that source, 50 means half of it, 0 drops it. Deterministic like
    * everything in this module — the SAME rows replicate on every run and
    * retry — and a pure narrow map + explode, no shuffle. Downstream
    * shuffling should key on (key, copy) so duplicated rows spread.
    */
  def weightedMix(df: DataFrame, keyCol: Column, weightPct: Column): DataFrame = {
    val w = weightPct.cast(LongType)
    val copies = (w / 100).cast(LongType) +
      when(portableHash60(keyCol) % 100 < w % 100, 1L).otherwise(0L)
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Temperature-based source mixing weights (the multilingual balancing
    * rule of Conneau & Lample 2019 / XLM-R: sample source i with
    * p_i ∝ n_i^alpha, alpha < 1, so head sources are down-weighted and tail
    * sources up-weighted). This surface hard-wires alpha = 0.5 — sqrt is
    * the one fractional power IEEE 754 requires to be exactly rounded, so
    * w_scaled = floor(scale * sqrt(n_docs)) is bit-identical on every
    * engine and the whole table (including the integer epoch allocation)
    * is ANSI-replayable; other alphas go through `pow` and belong on a
    * spec-verified float path. Output per source:
    * (source, n_docs, w_scaled, weight, alloc) where alloc is the exact
    * integer number of samples out of `epochSize` — floor allocation, so
    * sum(alloc) <= epochSize with the remainder < #sources.
    * Domain bound: w_scaled * epochSize must stay under 2^63.
    *
    * One tiny aggregation (#sources rows); the totals row broadcasts.
    */
  def temperatureMixWeights(df: DataFrame, groupCol: Column, epochSize: Long,
                            scale: Long = 1000000L): DataFrame = {
    val counts = df.groupBy(groupCol.as("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w_scaled",
        floor(lit(scale.toDouble) * sqrt(col("n_docs").cast("double"))))
    val tot = counts.agg(sum("w_scaled").as("tot"))
    counts.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("w_scaled"),
        (col("w_scaled").cast("double") / col("tot").cast("double")).as("weight"),
        expr(s"(w_scaled * $epochSize) div tot").as("alloc"))
  }

  /** Keep at most `k` rows per group, ranked by the portable hash of
    * `tieBreak` (then `tieBreak` itself, for full determinism on hash
    * collisions) — a deterministic "random K per domain" quota, the standard
    * anti-head-domination step in web-corpus curation. One shuffle on the
    * group key; the window never sees more than one group per partition
    * stream. For a corpus dominated by a handful of mega-groups, pre-filter
    * with `hashSplit` to a small percent first so the skewed window stays
    * bounded.
    */
  def capPerGroup(df: DataFrame, groupCol: Column, k: Int,
                  tieBreak: Column): DataFrame = {
    require(!df.columns.contains("rk"),
      "capPerGroup emits a 'rk' column; rename the existing one first")
    val w = Window.partitionBy(groupCol)
      .orderBy(portableHash60(tieBreak), tieBreak)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Deterministic epoch shuffle — the training-order step: each epoch
    * induces an independent pseudorandom permutation of the corpus (rank by
    * hash(epoch ‖ key)), so every run, retry, and resume sees the same
    * order, and consecutive epochs are decorrelated without any stored
    * permutation state.
    *
    * The permutation is materialized the way shard writers consume it:
    * rows land in `shard = hash % nShards` and get a contiguous
    * `pos` (1..shardSize) WITHIN the shard — readers stream shards in
    * position order. Ranking therefore windows on (epoch, shard) —
    * epochs × nShards partitions, never the single-partition funnel a
    * global dense rank would force — and the hash itself already is the
    * global sort key when a total order is wanted.
    */
  def epochShuffle(df: DataFrame, keyCol: Column,
                   epochs: Int, nShards: Int): DataFrame = {
    require(epochs > 0 && nShards > 0,
      s"need positive epochs/nShards, got $epochs/$nShards")
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("__h").asc, keyCol.asc)
    df.withColumn("epoch", explode(sequence(lit(0), lit(epochs - 1))))
      .withColumn("__h", portableHash60(concat_ws("_", col("epoch"), keyCol)))
      .withColumn("shard", (col("__h") % nShards).cast(IntegerType))
      .withColumn("pos", row_number().over(w).cast(LongType))
      .drop("__h")
  }
}
