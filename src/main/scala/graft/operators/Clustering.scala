package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a candidate-pair relation — the clustering step
  * of a near-dup pipeline. The greedy "drop the larger id of every pair"
  * survivor rule (NearDedup.minhashDedup) is not transitive: for a chain
  * a–b, b–c with no a–c pair it keeps a and c even though all three are one
  * duplicate cluster. Component labeling closes that gap: every doc gets the
  * min id reachable through any chain of qualifying pairs, and dedup keeps
  * exactly one representative per component.
  *
  * Algorithm: iterative min-label propagation with pointer doubling. Each
  * round every node takes the min of its own label, its neighbors' labels,
  * and its label's label — the halving shortcut turns chain collapse from
  * O(length) rounds into O(log length), so even pathological long chains
  * converge well inside the default `maxIter`. Near-dup clusters are tight
  * (diameter a few hops) and finish in 2–4 rounds. Every round `localCheckpoint`s its result: iterative
  * Spark without lineage truncation re-executes the whole history each
  * round and blows the planner up — checkpointing keeps each round O(edges).
  * At 100 TB the edge list (id pairs only, from the LSH candidate stage) is
  * orders of magnitude smaller than the corpus, so the loop runs on a
  * skinny two-column relation.
  *
  * Reference: the dedup surface this extends is the engine's north-star
  * extension area; label propagation is the standard MapReduce CC shape
  * (cf. Kiveris et al., "Connected Components in MapReduce and Beyond").
  */
object Clustering {

  /** Label every node of the (aCol, bCol) edge relation with the minimum id
    * reachable from it. Returns (id, comp); `comp == id` marks the
    * component representative. Nodes not present in any edge are absent —
    * callers treat them as singleton components.
    */
  def connectedComponents(edges: DataFrame, aCol: String = "id_a",
                          bCol: String = "id_b", maxIter: Int = 20): DataFrame = {
    // Symmetrize once and materialize: the loop re-reads the edges every
    // round, and without the checkpoint each round would recompute the
    // upstream candidate-generation plan from scratch.
    val e = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = e.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val neighborMin = e.join(labels.select(col("id").as("dst"), col("comp")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min(col("comp")).as("ncomp"))
      // Pointer doubling: also adopt the label OF my current label —
      // comp(comp(id)). comp(id) is always a node of the same component
      // (labels only ever take ids seen through edges), so the shortcut is
      // safe, and it collapses chains in O(log length) rounds where plain
      // neighbor propagation needs O(length) (Kiveris et al.'s halving idea).
      val labelMin = labels.join(
          labels.select(col("id").as("comp"), col("comp").as("lcomp")), Seq("comp"))
        .select(col("id"), col("lcomp"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .join(labelMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"),
            coalesce(col("ncomp"), col("comp")),
            coalesce(col("lcomp"), col("comp"))).as("comp"))
        .localCheckpoint()
      changed = next.join(labels.select(col("id"), col("comp").as("prev")), Seq("id"))
        .filter(col("comp") < col("prev")).count()
      labels = next
      iter += 1
    }
    if (changed > 0)
      System.err.println(s"[connectedComponents] labels still changing after " +
        s"maxIter=$maxIter rounds ($changed updates in the last round) — " +
        "components spanning longer chains are split; raise maxIter")
    labels
  }

  /** Keep one representative (the component's min id) per duplicate cluster:
    * transitive closure of the pair relation, unlike the greedy pairwise
    * survivor rule. Docs that appear in no pair survive untouched.
    */
  def dedupByComponents(df: DataFrame, idCol: String, pairs: DataFrame,
                        aCol: String = "id_a", bCol: String = "id_b",
                        maxIter: Int = 20): DataFrame = {
    val losers = connectedComponents(pairs, aCol, bCol, maxIter)
      .filter(col("comp") =!= col("id"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
