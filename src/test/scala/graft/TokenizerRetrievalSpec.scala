package graft

import org.apache.spark.sql.functions._
import graft.operators.{Retrieval, SpanDedup, Vocab}
import graft.functions.Classifier

/** Tokenizer induction (vocab/BPE), keyword retrieval, model-based quality
  * scoring, and C4 line dedup.
  */
class TokenizerRetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("keywordTopK ranks by total term frequency with deterministic ties") {
    val docs = Seq(
      (1L, "spark spark join other words here"),
      (2L, "spark join window"),          // 3 distinct terms, score 3
      (3L, "spark spark spark spark"),    // score 4
      (4L, "nothing relevant at all"),
      (5L, "spark join window"))          // ties doc 2 -> doc 2 first
      .toDF("doc_id", "text")
    val got = Retrieval.keywordTopK(docs, "doc_id", "text",
      Seq("spark", "join", "window"), k = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((3L, 4L, 1L), (1L, 3L, 2L), (2L, 3L, 3L)))
  }

  test("bm25TopK prefers rare terms and penalizes long documents") {
    val filler = (1 to 50).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "rare common"),              // short doc, has the rare term
      (2L, s"common common $filler"),   // long doc, common term only
      (3L, "common here"),
      (4L, s"rare $filler $filler"),    // rare term but much longer
      (5L, "common filler text")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("rare", "common"), k = 5)
      .select("doc_id").as[Long].collect().toSeq
    // doc 1: rare idf + short length -> top; doc 4 next (rare, long);
    // common-only docs trail
    assert(got.head == 1L)
    assert(got.indexOf(4L) < got.indexOf(2L))
    assert(Retrieval.bm25TopK(docs, "doc_id", "text", Seq("rare"), k = 2)
      .select("doc_id").as[Long].collect().toSeq == Seq(1L, 4L))
  }

  test("vocabCoverage: ranked vocabulary with exact cumulative coverage") {
    val docs = Seq((1L, "a a a b b c"), (2L, "a b d")).toDF("doc_id", "text")
    // counts: a=4, b=3, c=1, d=1 (ties lexicographic), total 9
    val got = Vocab.vocabCoverage(docs, "text", vocabSize = 3)
      .orderBy("rank").as[(Long, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "a", 4L, 4.0 / 9), (2L, "b", 3L, 7.0 / 9), (3L, "c", 1L, 8.0 / 9)))
  }

  test("BPE learns the classic merges on a toy corpus") {
    // Sennrich-style example: 'low' x5, 'lowest' x2, 'newer' x6, 'wider' x3
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lowest") ++
      Seq.fill(6)("newer") ++ Seq.fill(3)("wider")).mkString(" ")
    val docs = Seq((1L, corpus)).toDF("doc_id", "text")
    val merges = Vocab.train(docs, "text", nMerges = 4)
    // pair freqs round 1: (e,r)=9 wins; then (er,</w>)=9; then 'low' pairs
    assert(merges.take(2) == Seq(("e", "r"), ("er", "</w>")))
    assert(merges.length == 4)
    // encoding replays the merges: 'newer' ends in the er</w> symbol
    val enc = docs.select(Vocab.encode(col("text"), merges).as("s"))
      .as[Seq[String]].head()
    assert(enc.contains("er</w>"))
  }

  test("applyMerge is greedy left-to-right on overlapping runs") {
    val df = Seq(Seq("o", "o", "o"), Seq("a", "b", "b"), Seq("a", "a", "b"))
      .toDF("syms")
    val got = df.select(Vocab.applyMerge(col("syms"), "o", "o").as("m"),
      Vocab.applyMerge(col("syms"), "a", "b").as("ab"))
      .as[(Seq[String], Seq[String])].collect().toSeq
    assert(got(0)._1 == Seq("oo", "o"))
    assert(got(1)._2 == Seq("ab", "b"))
    assert(got(2)._2 == Seq("a", "ab"))
  }

  test("hashed linear scorer is exact, narrow, and length-normalized") {
    val docs = Seq((1L, "a b c"), (2L, "a a a a a a"), (3L, null: String))
      .toDF("doc_id", "text")
    val out = Classifier.scoreDocsPortable(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // same token repeated: score scales linearly, quality constant
    val qa = out(1).getAs[Double]("quality")
    val one = Classifier.scoreDocsPortable(
      Seq((9L, "a")).toDF("doc_id", "text"), "doc_id", "text")
      .head().getAs[Double]("quality")
    assert(math.abs(qa - one) < 1e-12)
    assert(out(0).getAs[Long]("n_tokens") == 3L)
    // no shuffle anywhere in the scoring plan
    val plan = Classifier.scoreDocsPortable(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("prCurve: hand-checked confusion counts, monotone recall, P=1 at the top") {
    // scores 30,20,20,10 with labels T,T,F,F: thresholds 30/20/10 give
    // (tp,fp) = (1,0), (2,1), (2,2)
    val scored = Seq((30L, true), (20L, true), (20L, false), (10L, false))
      .toDF("score", "label")
    val got = Classifier.prCurve(scored, "score", "label")
      .orderBy(col("threshold").desc)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (30L, 1L, 0L, 1L, 1.0, 0.5),
      (20L, 2L, 1L, 0L, 2.0 / 3.0, 1.0),
      (10L, 2L, 2L, 0L, 0.5, 1.0)))
    // laws: recall never decreases as the threshold drops; tp+fn constant
    got.sliding(2).foreach { case Seq(hi, lo) => assert(lo._6 >= hi._6) case _ => }
    assert(got.map(r => r._2 + r._4).distinct == Seq(2L))
    // all-negative labels: recall pinned to 0, no division blow-up
    val neg = Classifier.prCurve(
        Seq((5L, false), (1L, false)).toDF("score", "label"), "score", "label")
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(neg.forall(r => r._2 == 0L && r._6 == 0.0))
  }

  test("removeDupLines keeps first global occurrence, blanks survive") {
    val docs = Seq(
      (1L, "unique one\nshared boilerplate\n\nclosing line"),
      (2L, "shared boilerplate\nits own text"),
      (3L, "shared boilerplate"),          // fully duplicated -> empty
      (4L, null: String))
      .toDF("doc_id", "text")
    val got = SpanDedup.removeDupLines(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(got(0) == ((1L, "unique one\nshared boilerplate\n\nclosing line", 0L)))
    assert(got(1) == ((2L, "its own text", 1L)))
    assert(got(2) == ((3L, "", 1L)))
    assert(got(3) == ((4L, "", 0L)))
  }

  test("decodeIds inverts encodeIds for in-vocabulary text, marks OOV") {
    val docs = Seq((1L, "the cat sat"), (2L, "the mat")).toDF("doc_id", "text")
    val vocab = Seq(("the", 1L), ("cat", 2L), ("mat", 3L)).toDF("token", "id")
    val enc = Vocab.encodeIds(docs, "doc_id", "text", vocab)
    val dec = Vocab.decodeIds(enc, "doc_id", "ids", vocab)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(dec == Seq((1L, "the cat <unk>"), (2L, "the mat")))
  }

  test("encodeIds maps tokens in order, OOV to the sentinel, keeps empty docs") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "unknown words only"),
      (3L, "  the   the  "),  // ragged whitespace
      (4L, "   "),            // whitespace-only -> empty ids, not dropped
      (5L, null: String))     // null text -> empty ids, not dropped
      .toDF("doc_id", "text")
    val vocab = Seq(("the", 1L), ("cat", 2L), ("mat", 3L)).toDF("token", "id")
    val got = Vocab.encodeIds(docs, "doc_id", "text", vocab)
      .orderBy("doc_id").as[(Long, Seq[Long], Long, Long)].collect().toSeq
    assert(got(0) == ((1L, Seq(1L, 2L, 0L, 0L, 1L, 3L), 6L, 2L)))
    assert(got(1) == ((2L, Seq(0L, 0L, 0L), 3L, 3L)))
    assert(got(2) == ((3L, Seq(1L, 1L), 2L, 0L)))
    assert(got(3) == ((4L, Seq(), 0L, 0L)))
    assert(got(4) == ((5L, Seq(), 0L, 0L)))
  }

  test("pairCounts survives fully-merged single-symbol words; train runs deep") {
    val wf = Seq(("a", 5L)).toDF("word", "freq")
      .select(Vocab.charSymbols(col("word")).as("syms"), col("freq"))
    val merged = wf.select(Vocab.applyMerge(col("syms"), "a", "</w>").as("syms"), col("freq"))
    // 'a' + '</w>' merges to the single symbol 'a</w>' -> zero pairs, no crash
    assert(Vocab.pairCounts(merged).count() == 0L)
    // a deep train on a tiny corpus exhausts some words completely
    val docs = Seq((1L, "aa aa aa bb bb cc")).toDF("id", "text")
    val merges = Vocab.train(docs, "text", nMerges = 12)
    assert(merges.nonEmpty && merges.size <= 12)
  }

  test("rrfFuse: doc in both lists outranks single-list docs; absence scores 0") {
    import graft.operators.Retrieval
    // query 1: doc 10 is rank 2 in both lists; doc 11 rank 1 sparse only,
    // doc 12 rank 1 dense only. 2/(60+2) > 1/(60+1) so doc 10 must win.
    val sparse = Seq((1L, 11L, 1), (1L, 10L, 2), (2L, 20L, 1)).toDF("query_id", "doc_id", "rank")
    val dense = Seq((1L, 12L, 1), (1L, 10L, 2), (2L, 21L, 1)).toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(sparse, dense, k = 10)
      .orderBy(col("query_id"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().toSeq
    val q1 = out.filter(_._1 == 1L)
    assert(q1.map(_._2) == Seq(10L, 11L, 12L)) // both-lists doc first, then doc_id tiebreak
    assert(q1.head._3 == 2.0 / 62.0)
    assert(q1(1)._3 == 1.0 / 61.0 && q1(2)._3 == 1.0 / 61.0)
    // query 2: one doc per list, tie broken by doc_id
    assert(out.filter(_._1 == 2L).map(_._2) == Seq(20L, 21L))
    // k truncates
    assert(Retrieval.rrfFuse(sparse, dense, k = 1).filter(col("query_id") === 1).count() == 1L)
  }

  test("hardNegatives: positives excised BEFORE the rank cut, so k true negatives survive") {
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple banana cherry"), // duplicate of the query: false negative
      (3L, "apple banana date"),
      (4L, "apple fig grape"),
      (5L, "kiwi lemon mango")).toDF("doc_id", "text")
    val idx = Retrieval.sparseTfIdfIndex(docs, "doc_id", "text")
    val pos = Seq((1L, 2L)).toDF("query_id", "doc_id")
    val out = Retrieval.hardNegatives(idx, docs.filter(col("doc_id") === 1),
        "doc_id", "text", pos, k = 2)
      .orderBy(col("rank"))
      .as[(Long, Long, Long, Long, Int)].collect().toSeq
    // the duplicate tops the raw ranking; mining top-k first and filtering
    // after would return a single negative — the anti-join-before-cut
    // contract yields exactly k
    assert(out.map(_._2) == Seq(3L, 4L))
    assert(out.map(_._5) == Seq(1, 2))
    // no positives: plain sparse TF-IDF top-k on the same index
    val plain = Retrieval.hardNegatives(idx, docs.filter(col("doc_id") === 1),
        "doc_id", "text", pos.limit(0), k = 2)
      .orderBy(col("rank")).as[(Long, Long, Long, Long, Int)].collect().toSeq
    assert(plain.map(_._2) == Seq(2L, 3L))
  }

  test("termCounts kernel ≡ explode+groupBy tokenization (parity law)") {
    // the row-local tf kernel replaced a corpus-sized exchange; this law
    // pins its tokenization to the SQL formulation every oracle replays:
    // java-regex \s+ split, empty tokens dropped, null text = no tokens
    val docs = Seq(
      (1L, "plain words plain"),
      (2L, "\t tabform\ffeed\r\nnewline  tab"),
      (3L, "   "),                       // whitespace only: no tokens
      (4L, null.asInstanceOf[String]),   // null: no tokens
      (5L, ""),                          // empty: no tokens
      (6L, "ünïcode ünïcode 漢字"),       // non-ASCII tokens count fine
      (7L, " lead and trail "),
      (8L, "a a a a b")).toDF("doc_id", "text")
    val kernel = graft.operators.Retrieval.termCounts(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().toSet
    val sql = docs.select(col("doc_id"),
        explode(split(trim(coalesce(col("text"), lit(""))), "\\s+")).as("t"))
      .filter(length(col("t")) > 0)
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
      .as[(Long, String, Long)].collect().toSet
    assert(kernel == sql)
    assert(!kernel.exists(r => r._1 == 3L || r._1 == 4L || r._1 == 5L))
    assert(kernel((8L, "a", 4L)) && kernel((8L, "b", 1L)))
  }

  test("streaming serve decomposition ≡ batch serve (scored + rankCut law)") {
    // q199's legality argument, pinned as a law: per-query tf is row-local
    // (no streaming aggregation), the score sum is the ONE streaming agg
    // (complete mode), and the batch rank cut over the drained sink equals
    // sparseTfIdfTopKWith bit-for-bit on the same queries
    val docs = Seq(
      (1L, "apple banana cherry apple"),
      (2L, "apple banana cherry"),
      (3L, "apple banana date banana"),
      (4L, "apple fig grape"),
      (5L, "kiwi lemon mango"),
      (6L, "banana date fig")).toDF("doc_id", "text")
    val idx = Retrieval.sparseTfIdfIndex(docs, "doc_id", "text", maxPostings = 2)
    val qs = Seq((1L, "apple banana cherry apple"), (5L, "kiwi lemon mango"))
    val batch = Retrieval.sparseTfIdfTopKWith(
        idx, qs.toDF("doc_id", "text"), "doc_id", "text", k = 3)
      .as[(Long, Long, Long, Long, Int)].collect().toSet
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    mem.addData(qs: _*)
    val scored = Retrieval.sparseTfIdfScored(
      broadcast(idx), mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = scored.writeStream.format("memory")
      .queryName("champ_stream_law").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = Retrieval.sparseTfIdfRankCutK(
        spark.table("champ_stream_law"), k = 3)
      .as[(Long, Long, Long, Long, Int)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }
}
