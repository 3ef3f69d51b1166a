package graft

import org.apache.spark.sql.functions._
import graft.operators.Clustering

/** Connected-components clustering over near-dup pair relations. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("chain pairs collapse into one component (transitive closure)") {
    // a-b, b-c, c-d: greedy pairwise dedup would keep a and c; CC must
    // label all four with the chain minimum.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val comps = Clustering.connectedComponents(pairs)
      .orderBy("id").as[(Long, Long)].collect()
    assert(comps.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("edge direction does not matter") {
    val pairs = Seq((5L, 2L), (2L, 9L)).toDF("id_a", "id_b")
    val comps = Clustering.connectedComponents(pairs)
      .orderBy("id").as[(Long, Long)].collect()
    assert(comps.toSeq == Seq(2L -> 2L, 5L -> 2L, 9L -> 2L))
  }

  test("dedupByComponents keeps the min id per cluster and all singletons") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (7L, "x"),
      (10L, "b"), (11L, "b")).toDF("doc_id", "txt")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val kept = Clustering.dedupByComponents(docs, "doc_id", pairs)
      .orderBy("doc_id").select("doc_id").as[Long].collect()
    assert(kept.toSeq == Seq(1L, 7L, 10L))
  }

  test("dedupByComponentsBest keeps the highest-quality member, min id only on ties") {
    val docs = Seq(
      (1L, 5L), (2L, 9L), (3L, 9L), (4L, 2L), // cluster {1,2,3,4}: best q=9, tie -> id 2
      (7L, 1L),                               // singleton: untouched
      (10L, 3L), (11L, 8L)                    // cluster {10,11}: best is 11
    ).toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val kept = Clustering.dedupByComponentsBest(docs, "doc_id", col("q"), pairs)
      .orderBy("doc_id").select("doc_id").as[Long].collect()
    assert(kept.toSeq == Seq(2L, 7L, 11L))
    // same cluster structure as min-id dedup: one survivor per cluster
    assert(Clustering.dedupByComponents(docs, "doc_id", pairs).count() == kept.length)
  }

  test("long chain converges under the DEFAULT maxIter (pointer doubling)") {
    // a 60-node path needs ~59 rounds of plain neighbor propagation; the
    // label-of-label shortcut must collapse it in O(log n) rounds, well
    // inside the default bound of 20. maxLocalEdges = 0 pins the
    // DISTRIBUTED loop — the convergence property under test lives there.
    val pairs = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comps = Clustering.connectedComponents(pairs, maxLocalEdges = 0)
      .agg(countDistinct(col("comp")), min(col("comp"))).as[(Long, Long)].head()
    assert(comps == ((1L, 1L)))
  }

  test("one-box fast path is value-identical to the distributed loop") {
    // chains, a star, a cycle, self-contained singleton pairs, and edges
    // given in both directions — the local union-find and the label loop
    // must agree on every (id, comp) row, and the fast path's output must
    // be a driver-local relation (no jobs at consumption time).
    val pairs = (Seq((9L, 3L), (3L, 12L), (12L, 9L), (40L, 41L), (41L, 42L),
      (50L, 7L), (7L, 50L), (60L, 60L)) ++ (100L until 130L).map(i => (i + 1, i)))
      .toDF("id_a", "id_b")
    val local = Clustering.connectedComponents(pairs)
    val loop = Clustering.connectedComponents(pairs, maxLocalEdges = 0)
    assert(local.schema.map(f => (f.name, f.dataType)) ==
      loop.schema.map(f => (f.name, f.dataType)))
    assert(local.orderBy("id").as[(Long, Long)].collect().toSeq ==
      loop.orderBy("id").as[(Long, Long)].collect().toSeq)
    assert(local.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.nonEmpty, "fast-path labels must be a LocalRelation")
  }

  test("over-budget edge relations take the distributed loop") {
    val pairs = (1L to 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val viaTinyBudget = Clustering.connectedComponents(pairs, maxLocalEdges = 5)
    assert(viaTinyBudget.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isEmpty, "over-budget input must not collect")
    assert(viaTinyBudget.filter(col("comp") === 1L).count() == 41L)
  }

  test("empty pair relation yields empty labels") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Clustering.connectedComponents(pairs).count() == 0L)
  }

  test("minhashDedupCC collapses a duplicate chain the greedy rule splits") {
    // doc 2 is near-identical to 1, doc 3 near-identical to 2 — with no
    // direct 1-3 pair required, the cluster must still keep only doc 1
    val base = "the quick brown fox jumps over the lazy dog again and again for testing"
    val docs = Seq(
      (1L, base + " one"),
      (2L, base + " two"),
      (3L, base + " two extra"),
      (50L, "completely different content about spark physical plans and shuffles"))
      .toDF("doc_id", "text")
    val kept = graft.operators.NearDedup
      .minhashDedupCC(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 50L))
  }

  test("closure property: survivors admit no qualifying pair (real corpus)") {
    // after component dedup, any qualifying pair between two survivors
    // would contradict the transitive closure — re-running pair generation
    // on the survivors must come back empty
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = graft.operators.NearDedup.ngramJaccardPairs(
      docs, "doc_id", "text", shingleSize = 3, threshold = 0.5)
    val kept = Clustering.dedupByComponents(docs, "doc_id", pairs)
    val residual = graft.operators.NearDedup.ngramJaccardPairs(
      kept, "doc_id", "text", shingleSize = 3, threshold = 0.5)
    assert(pairs.count() > 0L, "fixture must contain near-dup pairs")
    assert(residual.count() == 0L)
  }

  test("pageRankInt matches the hand-unrolled integer recurrence") {
    // a->b, a->c, b->c at scale=100, damp 85/100 (base 15), 2 iterations:
    //   r1: a=15, b=15+(85*50)//100=57, c=15+(85*150)//100=142
    //   r2: a=15, b=15+(85*7)//100=20,  c=15+(85*(7+57))//100=69
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = Clustering.pageRankInt(edges, "src", "dst", iters = 2, scale = 100L)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 15L, 2L -> 20L, 3L -> 69L))
  }

  test("pageRankInt is deterministic across partitionings and ranks hubs above leaves") {
    val edges = (for (i <- 2L to 20L) yield (i, 1L)).toDF("src", "dst") // star into node 1
    val r1 = Clustering.pageRankInt(edges, "src", "dst").as[(Long, Long)].collect().toMap
    val r2 = Clustering.pageRankInt(edges.repartition(7), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(r1 === r2)
    assert(r1(1L) > r1(2L), "the 19-in-link hub must outrank a leaf")
  }

  test("contrastivePairs: star per component (c-1 pairs, not the clique), sizes ride along") {
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L))
      .toDF("id", "comp")
    val out = Clustering.contrastivePairs(comps)
      .orderBy(col("anchor_id"), col("positive_id"))
      .as[(Long, Long, Long)].collect().toSeq
    // 3-member cluster -> 2 pairs anchored at the representative (the
    // clique would emit 3); singleton representative rows never pair
    assert(out == Seq((1L, 2L, 3L), (1L, 3L, 3L), (7L, 9L, 2L)))
  }
}
