package graft

import org.apache.spark.sql.functions._
import graft.operators.{NearDedup, Phrases, Releases}

/** Round-8 release/linkage surfaces: snapshot diff, CDC apply, word2phrase
  * collocations, blocked edit-distance record linkage.
  */
class ReleaseOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- snapshotDiff

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val oldRel = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("id", "s", "n")
    val newRel = Seq((1L, "a", 10L), (2L, "B", 20L), (4L, "d", 41L), (5L, "e", 50L))
      .toDF("id", "s", "n")
    val got = Releases.snapshotDiff(oldRel, newRel, Seq("id"), Seq("s", "n"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(2L -> "changed", 3L -> "removed", 4L -> "changed", 5L -> "added"))
  }

  test("snapshotDiff null-vs-sentinel cells do not collide") {
    val oldRel = Seq((1L, Some("x"), None: Option[String])).toDF("id", "a", "b")
    val newRel = Seq((1L, None: Option[String], Some("x"))).toDF("id", "a", "b")
    val got = Releases.snapshotDiff(oldRel, newRel, Seq("id"), Seq("a", "b"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "changed"))
    // and a genuine null-for-null match stays unchanged (empty diff)
    assert(Releases.snapshotDiff(oldRel, oldRel, Seq("id"), Seq("a", "b")).count() === 0L)
  }

  // -------------------------------------------------------------- applyCdc

  private val cdcBase = Seq((1L, "one", 1L), (2L, "two", 2L), (3L, "three", 3L))
    .toDF("id", "s", "n")

  test("applyCdc: highest version wins, deletes drop, inserts add, base passes through") {
    val feed = Seq(
      (2L, "two-v1", 20L, 1L, "U"),
      (2L, "two-v2", 22L, 2L, "U"),
      (3L, "gone", 0L, 1L, "D"),
      (9L, "nine", 9L, 1L, "I")).toDF("id", "s", "n", "version", "op")
    val got = Releases.applyCdc(cdcBase, feed, Seq("id"), "version", "op")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "one", 1L), (2L, "two-v2", 22L), (9L, "nine", 9L)))
  }

  test("applyCdc: same-version D and U on one key resolves upsert-first (op desc)") {
    val feed = Seq((1L, "kept", 11L, 5L, "U"), (1L, "one", 1L, 5L, "D"))
      .toDF("id", "s", "n", "version", "op")
    val got = Releases.applyCdc(cdcBase, feed, Seq("id"), "version", "op")
      .filter($"id" === 1L).as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((1L, "kept", 11L)))
  }

  test("applyCdc rejects a base that carries the feed metadata columns") {
    val clash = Seq((1L, "x", 2L)).toDF("id", "s", "version")
    val feed = Seq((1L, "y", 3L, 1L, "U")).toDF("id", "s", "version2", "version", "op")
    val e = intercept[IllegalArgumentException] {
      Releases.applyCdc(clash, feed, Seq("id"), "version", "op")
    }
    assert(e.getMessage.contains("feed metadata columns"))
  }

  test("applyCdc fails fast on ops outside I/U/D instead of upserting them") {
    val feed = Seq((2L, "two", 2L, 1L, "d")).toDF("id", "s", "n", "version", "op")
    val e = intercept[Exception] {
      Releases.applyCdc(cdcBase, feed, Seq("id"), "version", "op").count()
    }
    assert(e.getMessage.contains("op must be I|U|D") ||
      Option(e.getCause).exists(_.getMessage.contains("op must be I|U|D")))
  }

  // ---------------------------------------------------------- collocations

  test("collocations scores adjacent pairs against the independence baseline") {
    // "new york" always adjacent (a true phrase); "the cat" co-occurs at
    // chance. 8 docs x "new york" + filler keeps counts above minCount.
    val docs = (0 until 8).map(i => s"new york trip $i")
      .toDF("text")
    val got = Phrases.collocations(docs, "text", minCount = 4L, delta = 1L, threshold = 2L)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // N = 32 tokens; c(new)=c(york)=8, c_ab=8: score_num=(8-1)*32=224,
    // den=64 -> 3.5x baseline, kept
    val ny = got(("new", "york"))
    assert(ny._3 === 8L && ny._4 === 8L && ny._5 === 8L)
    assert(ny._6 === 224L && ny._7 === 64L)
    // "trip 0".."trip 7" bigrams have c_ab=1 < minCount -> absent entirely
    assert(!got.contains(("trip", "0")))
    // "york trip" is as frequent as "new york" but... also kept (8x8) — the
    // spec's point is the exact integer algebra, asserted above
  }

  test("collocations: below-threshold pairs are dropped by cross-multiplication") {
    // alternate fillers so "a b" hits chance-level co-occurrence only
    val docs = Seq("a b", "a c", "a b", "a c", "a b", "a c", "a b", "a c")
      .toDF("text")
    // c(a)=8, c(b)=4, c_ab(a,b)=4, N=16: num=(4-0)*16=64, den=32 -> 2.0x
    val kept = Phrases.collocations(docs, "text", minCount = 2L, delta = 0L, threshold = 3L)
    assert(kept.count() === 0L)
    val loose = Phrases.collocations(docs, "text", minCount = 2L, delta = 0L, threshold = 2L)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(loose.map(r => (r._1, r._2)).toSet === Set(("a", "b"), ("a", "c")))
  }

  test("collocations ignores empty/null documents") {
    val docs = Seq(Some("x y"), None, Some("   "), Some("x y")).toDF("text")
    val got = Phrases.collocations(docs, "text", minCount = 2L, delta = 0L, threshold = 1L)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2)).toSet === Set(("x", "y")))
    assert(got.head._4 === 2L) // null/blank docs contributed no tokens
  }

  // ----------------------------------------------------- editDistancePairs

  test("editDistancePairs matches within blocks only, at the distance cap") {
    val rows = Seq(
      (1L, "small ring", "B1"), (2L, "small rin", "B1"),   // dist 1, same block
      (3L, "small ring", "B2"),                            // same text, other block
      (4L, "small widget", "B1"),                          // dist 6 from id 1
      (5L, "large bolt", "B1"), (6L, "large bolt", "B1"))  // dist 0 pair
      .toDF("id", "name", "brand")
    val got = NearDedup.editDistancePairs(rows, "id", "name",
        concat_ws("|", col("brand"), element_at(split(col("name"), " "), 1)), maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 2L, 1), (5L, 6L, 0)))
  }

  test("editDistancePairs drops oversized blocks whole (LSH bucket-cap contract)") {
    val rows = ((1L to 6L).map(i => (i, s"word$i", "hot")) ++
      Seq((10L, "abc", "cold"), (11L, "abd", "cold"))).toDF("id", "name", "brand")
    val got = graft.operators.NearDedup.editDistancePairs(
        rows, "id", "name", col("brand"), maxDist = 5, maxBlockSize = 5)
      .as[(Long, Long, Int)].collect().toSet
    // the 6-row "hot" block exceeds the cap and contributes nothing; the
    // 2-row "cold" block survives
    assert(got === Set((10L, 11L, 1)))
  }

  test("editDistancePairs emits the true distance, not the threshold sentinel") {
    val rows = Seq((1L, "abcd", "k"), (2L, "abxd", "k"), (3L, "abcd", "k"))
      .toDF("id", "name", "brand")
    val got = NearDedup.editDistancePairs(rows, "id", "name", col("brand"), maxDist = 3)
      .as[(Long, Long, Int)].collect()
      .map { case (a, b, d) => ((a, b), d) }.toMap
    assert(got === Map((1L, 2L) -> 1, (1L, 3L) -> 0, (2L, 3L) -> 1))
  }

  test("manifest: order-independent checksum, content-sensitive, dedup audit counts") {
    import spark.implicits._
    val rel = Seq(
      (1L, "src_a", "hello world"),
      (2L, "src_a", "hello  world"), // same canonical form as doc 1
      (3L, "src_a", "different"),
      (4L, "src_b", "only one")).toDF("doc_id", "source", "text")
    def get(df: org.apache.spark.sql.DataFrame) =
      Releases.manifest(df, "source", "doc_id", "text")
        .orderBy(col("source"))
        .as[(String, Long, Long, Long, Long)].collect().toSeq
    val base = get(rel)
    assert(base.map(t => (t._1, t._2, t._4)) == Seq(("src_a", 3L, 2L), ("src_b", 1L, 1L)))
    assert(base.head._3 == 11L + 12L + 9L) // n_chars sums raw (pre-canonical) lengths
    // row order / partitioning cannot move the checksum: XOR commutes
    assert(get(rel.orderBy(col("doc_id").desc).repartition(3)) == base)
    // one flipped character in one doc must flip that source's checksum only
    val tweaked = get(rel.withColumn("text",
      when(col("doc_id") === 3, lit("differenT")).otherwise(col("text"))))
    assert(tweaked.head._5 != base.head._5 && tweaked(1)._5 == base(1)._5)
  }

  test("manifest checksum: separator-safe string ids and null ids hash distinctly") {
    import spark.implicits._
    def sum(rows: Seq[(Option[String], String)]) =
      Releases.manifest(
          rows.map { case (id, t) => (id, "s", t) }.toDF("doc_id", "source", "text"),
          "source", "doc_id", "text")
        .select(col("checksum")).as[Long].head()
    // id="a:b",text="c" must not alias id="a",text="b:c" (a ':'-joined
    // checksum input would make these identical corpora)
    assert(sum(Seq((Some("a:b"), "c"))) != sum(Seq((Some("a"), "b:c"))))
    // a null id contributes the sentinel, not a silently-dropped field:
    // (null,"x") and ("x","") must differ, and two corpora differing only
    // in a null-id row's text must differ
    assert(sum(Seq((None, "x"))) != sum(Seq((Some("x"), ""))))
    assert(sum(Seq((None, "x"))) != sum(Seq((None, "y"))))
  }

  test("snapshotDiff rejects inputs carrying its reserved working columns") {
    val clean = Seq((1L, "a")).toDF("id", "s")
    for (bad <- Seq("__old_fp", "__new_fp", "status")) {
      val tainted = clean.withColumn(bad, lit("x"))
      val e = intercept[IllegalArgumentException] {
        Releases.snapshotDiff(tainted, clean, Seq("id"), Seq("s"))
      }
      assert(e.getMessage.contains(bad))
      val e2 = intercept[IllegalArgumentException] {
        Releases.snapshotDiff(clean, tainted, Seq("id"), Seq("s"))
      }
      assert(e2.getMessage.contains(bad))
    }
  }
}
