package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("greedy contiguous packing: boundaries, offsets, straddling docs") {
    val docs = Seq(
      (1L, "s1", 300L), (2L, "s1", 300L), (3L, "s1", 500L), (4L, "s1", 10L))
      .toDF("id", "shard", "tok")
    val got = Packing.packSequences(docs, "shard", "id", col("tok"), budget = 512)
      .select("id", "seq_id", "seq_offset").orderBy("id")
      .as[(Long, Long, Long)].collect().toSeq
    // starts: 0, 300, 600, 1100 -> seqs 0,0,1,2; offsets 0,300,88,76
    assert(got == Seq((1L, 0L, 0L), (2L, 0L, 300L), (3L, 1L, 88L), (4L, 2L, 76L)))
  }

  test("ties on the order column still get distinct, non-overlapping starts") {
    // Three docs sharing one order value: the ROWS frame must hand each a
    // distinct running start (the default RANGE frame gave all three the
    // same cumulative sum -> overlapping seq_id/seq_offset).
    val docs = Seq((1L, "s1", 0L, 200L), (2L, "s1", 0L, 200L), (3L, "s1", 0L, 200L))
      .toDF("id", "shard", "ord", "tok")
    val got = Packing.packSequences(docs, "shard", "ord", col("tok"), budget = 512)
      .select("seq_id", "seq_offset").as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((0L, 0L), (0L, 200L), (0L, 400L)))
  }

  test("shards pack independently") {
    val docs = Seq((1L, "a", 400L), (2L, "b", 400L), (3L, "a", 400L))
      .toDF("id", "shard", "tok")
    val got = Packing.packSequences(docs, "shard", "id", col("tok"), budget = 512)
      .select("id", "seq_id").orderBy("id").as[(Long, Long)].collect().toSeq
    // each shard restarts at position 0: doc 2 is b's first doc, seq 0
    assert(got == Seq((1L, 0L), (2L, 0L), (3L, 0L)))
  }

  test("chunkBySentences: straddler stays, oversize sentence stands alone, ids dense") {
    import spark.implicits._
    val docs = Seq(
      // sentences of 3/3/3 tokens at budget 5: the second sentence starts
      // at cum 3 < 5 so it STAYS in chunk 0 (6 tokens — over budget by the
      // straddler); the third starts at 6 -> chunk 1
      (1L, "a b c. d e f. g h i."),
      // a 7-token sentence between 3-token ones: raw chunk ids 0,0,2 must
      // densify to 0,0,1
      (2L, "a b c. t u v w x y z. d e f."),
      (3L, "short only.")).toDF("doc_id", "text")
    val got = Packing.chunkBySentences(docs, "doc_id", "text", budget = 5)
      .orderBy(col("doc_id"), col("chunk_id"))
      .as[(Long, Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, "a b c. d e f.", 2L, 6L),
      (1L, 1L, "g h i.", 1L, 3L),
      (2L, 0L, "a b c. t u v w x y z.", 2L, 10L),
      (2L, 1L, "d e f.", 1L, 3L),
      (3L, 0L, "short only.", 1L, 2L)))
  }
}
