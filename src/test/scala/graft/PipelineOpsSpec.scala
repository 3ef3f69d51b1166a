package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.{Packing, Sampling, SpanDedup}

/** Training-pipeline curation operators: span-level duplication, deterministic
  * splits/quotas, sliding-window chunking, streaming heavy hitters.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("spanStats counts cross-doc duplicated grams and the longest run") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),            // 3 grams, 2 shared with doc 2
      (2L, "z z a b c d e f g h i w"),        // 5 grams, same 2 shared
      (3L, "only seven tokens here not eight ok")) // < n -> one whole-doc gram
      .toDF("doc_id", "text")
    val out = SpanDedup.spanStats(docs, "doc_id", "text", n = 8)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 2L, 2L), (2L, 5L, 2L, 2L), (3L, 1L, 0L, 0L)))
  }

  test("removeDupSpans excises exactly the qualifying shared span") {
    val boiler = (1 to 20).map(i => s"b$i").mkString(" ")   // 20 shared tokens
    val short  = (1 to 19).map(i => s"s$i").mkString(" ")   // 19: below threshold
    val docs = Seq(
      (1L, s"u1 u2 u3 $boiler v1 v2 v3"),
      (2L, s"w1 w2 w3 w4 $boiler x1"),
      (3L, s"p1 p2 $short p3"),
      (4L, s"q1 q2 $short q3"),
      (5L, "nothing shared with anyone at all here")).toDF("doc_id", "text")
    val out = SpanDedup.removeDupSpans(docs, "doc_id", "text",
      n = 8, minSpanTokens = 20)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    // 20-token boilerplate: 13 consecutive dup 8-gram positions = a 20-token
    // span -> removed, unique context survives on both sides
    assert(out(0) == ((1L, "u1 u2 u3 v1 v2 v3", 20L)))
    assert(out(1) == ((2L, "w1 w2 w3 w4 x1", 20L)))
    // 19-token shared span is below the threshold -> untouched
    assert(out(2)._2.startsWith("p1 p2 s1") && out(2)._3 == 0L)
    assert(out(3)._3 == 0L)
    assert(out(4) == ((5L, "nothing shared with anyone at all here", 0L)))
  }

  test("removeDupSpans: fully-duplicated document collapses to empty text") {
    val body = (1 to 30).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, body), (2L, body)).toDF("doc_id", "text")
    val out = SpanDedup.removeDupSpans(docs, "doc_id", "text",
      n = 8, minSpanTokens = 20)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "", 30L), (2L, "", 30L)))
  }

  test("NULL-text rows survive spanStats and removeDupSpans (as empty docs)") {
    // split(NULL) yields NULL and posexplode emits no rows, so without the
    // coalesce a NULL-text doc silently vanished from both outputs.
    val docs = Seq((1L, "a b c d e f g h i"), (2L, null: String))
      .toDF("doc_id", "text")
    val stats = SpanDedup.spanStats(docs, "doc_id", "text", n = 8)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(stats.map(_._1) == Seq(1L, 2L))
    assert(stats(1) == ((2L, 1L, 0L, 0L))) // one whole-doc (empty) gram
    val removed = SpanDedup.removeDupSpans(docs, "doc_id", "text",
      n = 8, minSpanTokens = 20)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(removed.map(_._1) == Seq(1L, 2L))
    assert(removed(1)._3 == 0L)
  }

  test("spanStats: within-doc repetition alone is not duplication") {
    val docs = Seq((1L, Seq.fill(4)("p q r s t u v w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = SpanDedup.spanStats(docs, "doc_id", "text", n = 8)
      .as[(Long, Long, Long, Long)].head()
    assert(out._3 == 0L && out._4 == 0L) // 25 grams, none cross-doc
  }

  test("hashSplit is deterministic, subset-stable, and roughly proportional") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val split = Sampling.hashSplit(docs, col("doc_id"),
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("doc_id", "split")
    val m1 = split.as[(Long, String)].collect().toMap
    assert(m1.values.toSet.subsetOf(Set("train", "val", "test")))
    val n = m1.size
    val trainN = m1.values.count(_ == "train")
    assert(trainN > n * 6 / 10 && trainN < n * 95 / 100,
      s"train fraction implausible: $trainN/$n")
    // A row's membership is a pure function of its key: dropping other rows
    // (or re-running) never moves it — the property rand() cannot give.
    val m2 = Sampling.hashSplit(docs.filter(col("doc_id") % 3 === 0),
        col("doc_id"), Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    m2.foreach { case (id, s) => assert(m1(id) == s) }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, col("doc_id"), Seq("a" -> 50, "b" -> 40))
    }
  }

  test("selectToTokenBudget: best-first fill, boundary greedy, never exceeds") {
    val docs = Seq(
      (1L, 3L, 10L),
      (2L, 2L, 10L), (3L, 2L, 10L), (4L, 2L, 10L), // boundary score: 1 of 3 cut
      (5L, 1L, 10L)).toDF("doc_id", "s", "t")
    def sel(b: Long) = Sampling.selectToTokenBudget(docs, "doc_id", col("s"), col("t"), b)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val got = sel(30L)
    assert(got.map(_._3).sum == 30L)
    assert(got.map(_._1).contains(1L) && !got.map(_._1).contains(5L))
    assert(got.count(r => r._2 == 2L) == 2) // exactly two boundary docs fit
    // deterministic under reshuffling (hash order, not partition order)
    assert(sel(30L) == Sampling.selectToTokenBudget(
      docs.repartition(7), "doc_id", col("s"), col("t"), 30L)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1))
    // budget beyond the corpus takes everything; sub-document budget takes nothing
    assert(sel(1000L).map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(sel(5L).isEmpty && sel(0L).isEmpty)
  }

  test("selectToTokenBudgetPerGroup: independent budgets, per-group boundaries") {
    val docs = Seq(
      (1L, "a", 3L, 10L), (2L, "a", 2L, 10L), (3L, "a", 1L, 10L),
      (4L, "b", 5L, 10L), (5L, "b", 4L, 10L)).toDF("doc_id", "g", "s", "t")
    val budgets = Seq(("a", 20L), ("b", 10L)).toDF("g", "budget")
    val got = Sampling.selectToTokenBudgetPerGroup(
        docs, "doc_id", "g", col("s"), col("t"), budgets)
      .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)
    // a's 20-token budget takes its top two scores; b's 10 takes one —
    // each group cuts at ITS budget, never a global one
    assert(got.map(_._1) == Seq(1L, 2L, 4L))
    // a group absent from the budgets relation contributes nothing
    val partial = Sampling.selectToTokenBudgetPerGroup(
        docs, "doc_id", "g", col("s"), col("t"), budgets.filter(col("g") === "b"))
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(partial.map(_._1) == Seq(4L))
  }

  test("leakageFreeSplit: every member of a dup cluster lands in the same split") {
    val docs = (0L until 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // chain 1-2-3 is one cluster; 10-11 another; rest are singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Sampling.leakageFreeSplit(docs, "doc_id", pairs,
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select(col("doc_id"), col("split_key"), col("split"))
      .as[(Long, Long, String)].collect().toSeq
    val byId = out.map(t => t._1 -> t).toMap
    assert(out.size == 40)
    // clustered docs share the representative key AND the split
    assert(Seq(1L, 2L, 3L).map(byId(_)._2).distinct == Seq(1L))
    assert(Seq(1L, 2L, 3L).map(byId(_)._3).distinct.size == 1)
    assert(Seq(10L, 11L).map(byId(_)._3).distinct.size == 1)
    // unpaired docs key on their own id -> identical to plain hashSplit
    val plain = Sampling.hashSplit(docs, col("doc_id"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select(col("doc_id"), col("split")).as[(Long, String)].collect().toMap
    out.filter(t => !Seq(1L, 2L, 3L, 10L, 11L).contains(t._1))
      .foreach(t => assert(t._3 == plain(t._1)))
  }

  test("capPerGroup keeps at most k rows per group, deterministically") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val capped = Sampling.capPerGroup(docs.select("doc_id", "source"),
      col("source"), k = 5, tieBreak = col("doc_id"))
    val perGroup = capped.groupBy("source").count().as[(String, Long)].collect()
    val sizes = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    perGroup.foreach { case (src, c) => assert(c == math.min(5L, sizes(src))) }
    assert(capped.agg(max("rk")).as[Int].head() <= 5)
    val again = Sampling.capPerGroup(docs.select("doc_id", "source"),
      col("source"), k = 5, tieBreak = col("doc_id"))
    assert(capped.orderBy("doc_id").collect().toSeq ==
      again.orderBy("doc_id").collect().toSeq)
  }

  test("weightedMix replicates by floor(w/100) + deterministic fractional keep") {
    val docs = spark.range(1000).toDF("doc_id")
    // weight 250 -> every row 2 copies, ~half get a 3rd; expectation 2.5x
    val mixed = Sampling.weightedMix(docs, col("doc_id"), lit(250L))
    val perRow = mixed.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(perRow.size == 1000 && perRow.values.forall(c => c == 2L || c == 3L))
    val total = perRow.values.sum
    assert(total > 2300 && total < 2700, s"expected ~2500 rows, got $total")
    // copy indices are 0..copies-1
    assert(mixed.groupBy("doc_id").agg(max("copy")).as[(Long, Long)]
      .collect().forall { case (id, m) => m == perRow(id) - 1 })
    // weight 0 drops everything; determinism across runs
    assert(Sampling.weightedMix(docs, col("doc_id"), lit(0L)).count() == 0)
    val again = Sampling.weightedMix(docs, col("doc_id"), lit(250L))
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(again == perRow)
  }

  test("chunkSliding emits overlapping windows incl. the partial tail") {
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2L, "x"))
      .toDF("doc_id", "text")
    val out = Packing.chunkSliding(docs, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 1L, 3L, 4L, "t3 t4 t5 t6"),
      (1L, 2L, 6L, 4L, "t6 t7 t8 t9"),
      (1L, 3L, 9L, 1L, "t9"),
      (2L, 0L, 0L, 1L, "x")))
    intercept[IllegalArgumentException] {
      Packing.chunkSliding(docs, "doc_id", "text", chunkSize = 4, stride = 5)
    }
  }

  test("hashSplit composes with Structured Streaming unchanged (stateless map)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val split = graft.operators.Sampling.hashSplit(
      mem.toDS().toDF("doc_id"), col("doc_id"),
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val q = split.writeStream.format("memory").queryName("split_stream")
      .outputMode("append").start()
    try {
      mem.addData(0L to 49L: _*)
      q.processAllAvailable()
      val streamed = spark.table("split_stream")
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      // identical assignment to the batch path — same rows, same labels
      val batch = graft.operators.Sampling.hashSplit(
        spark.range(50).toDF("doc_id"), col("doc_id"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      assert(streamed == batch && streamed.size == 50)
    } finally q.stop()
  }

  test("streamingHeavyHitters tracks hot items across batches in bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, String)]
    val capacity = 3
    val hh = graft.streaming.Streams.streamingHeavyHitters(mem.toDS(), capacity)
    val q = hh.writeStream.format("memory").queryName("hh_out")
      .outputMode("update").start()
    try {
      def emitted() = spark.table("hh_out")
        .as[(Int, String, Long, Long)].collect().toSeq
      mem.addData(Seq.fill(10)((0, "a")) ++ Seq((0, "b"), (0, "b"), (0, "c"),
        (0, "c"), (0, "d")): _*)
      q.processAllAvailable()
      val b1 = emitted()
      // MG invariant after 15 rows, cap 3: err = 15/4 = 3; "a" (true 10)
      // must survive with est in [true-err, true]
      assert(b1.size <= capacity)
      val a1 = b1.find(_._2 == "a").get
      assert(a1._3 >= 10L - a1._4 && a1._3 <= 10L)
      val k1 = b1.size
      mem.addData(Seq.fill(5)((0, "a")) ++ Seq.fill(4)((0, "e")): _*)
      q.processAllAvailable()
      val b2 = emitted().drop(k1) // memory sink appends per trigger
      assert(b2.size <= capacity)
      val a2 = b2.find(_._2 == "a").get
      assert(a2._3 >= 15L - a2._4 && a2._3 <= 15L, s"a after batch 2: $a2")
      assert(a2._3 > a1._3) // state carried across triggers
    } finally q.stop()
  }

  test("count-min and HLL registers maintain LIVE sketches over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val items = Seq("x", "y", "x", "z", "x", "y")
    val mem = MemoryStream[String]
    // the BATCH expressions applied verbatim to a streaming frame: both are
    // bounded-state streaming aggregations (grid / register table)
    val cm = graft.operators.Sketches.countMinSketch(
      mem.toDF().toDF("item"), col("item"), depth = 4, width = 64L)
    val hll = graft.operators.Sketches.hllRegisters(
      mem.toDF().toDF("item"), col("item"), p = 6)
    val q1 = cm.writeStream.format("memory").queryName("cm_live")
      .outputMode("complete").start()
    val q2 = hll.writeStream.format("memory").queryName("hll_live")
      .outputMode("complete").start()
    try {
      mem.addData(items.take(3): _*)
      q1.processAllAvailable(); q2.processAllAvailable()
      mem.addData(items.drop(3): _*)
      q1.processAllAvailable(); q2.processAllAvailable()
      val batchDf = items.map(Tuple1(_)).toDF("item")
      val cmBatch = graft.operators.Sketches.countMinSketch(
        batchDf, col("item"), depth = 4, width = 64L)
        .orderBy("row", "cell").collect().toSeq
      val hllBatch = graft.operators.Sketches.hllRegisters(
        batchDf, col("item"), p = 6)
        .orderBy("register").collect().toSeq
      assert(spark.table("cm_live").orderBy("row", "cell").collect().toSeq == cmBatch)
      assert(spark.table("hll_live").orderBy("register").collect().toSeq == hllBatch)
    } finally { q1.stop(); q2.stop() }
  }

  test("streamingManifest: running checksum across triggers equals the batch manifest") {
    import graft.streaming.Streams
    import graft.operators.Releases
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val q = Streams.streamingManifest(
        mem.toDF().toDF("doc_id", "source", "text"), "source", "doc_id", "text")
      .writeStream.format("memory").queryName("manifest_live")
      .outputMode("update").start()
    try {
      mem.addData((1L, "a", "x"), (2L, "a", "yy"), (3L, "b", "z"))
      q.processAllAvailable()
      mem.addData((4L, "a", "www"))
      q.processAllAvailable()
      // the latest re-emission per source (highest n_rows) must equal the
      // batch manifest of everything fed — XOR accumulates order-free
      val latest = spark.table("manifest_live")
        .as[(String, Long, Long, Long)].collect().toSeq
        .groupBy(_._1).map { case (_, rs) => rs.maxBy(_._2) }.toSet
      val batch = Releases.manifest(
          Seq((1L, "a", "x"), (2L, "a", "yy"), (3L, "b", "z"), (4L, "a", "www"))
            .toDF("doc_id", "source", "text"), "source", "doc_id", "text")
        .select(col("source"), col("n_rows"), col("n_chars"), col("checksum"))
        .as[(String, Long, Long, Long)].collect().toSet
      assert(latest == batch)
    } finally q.stop()
  }

  test("applyCdcStream: cross-batch merge matches batch applyCdc; D/U tie and deletes") {
    import graft.streaming.Streams
    import graft.operators.Releases
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Streams.CdcChange]
    val q = Streams.applyCdcStream(mem.toDS())
      .writeStream.format("memory").queryName("cdc_stream_spec")
      .outputMode("update").start()
    try {
      mem.addData(
        Streams.CdcChange(1L, 0L, "I", "a", 10L),
        Streams.CdcChange(2L, 0L, "I", "a", 20L),
        Streams.CdcChange(3L, 0L, "I", "b", 30L))
      q.processAllAvailable()
      mem.addData(
        Streams.CdcChange(1L, 2L, "U", "a", 11L), // plain update
        Streams.CdcChange(2L, 1L, "D", "a", 0L),  // delete across batches
        Streams.CdcChange(3L, 1L, "D", "b", 0L),  // same-version D/U tie:
        Streams.CdcChange(3L, 1L, "U", "b", 33L), //   U must win (op desc)
        Streams.CdcChange(4L, 1L, "I", "c", 40L)) // fresh key, no base row
      q.processAllAvailable()
      val rows = spark.table("cdc_stream_spec")
        .as[(Long, Long, String, Long)].collect().toSeq
      // a deleted key emits nothing once the D wins: key 2's only emission
      // is its batch-1 insert
      assert(rows.filter(_._1 == 2L).map(_._2) == Seq(0L))
      // the latest emission per surviving key is the batch MERGE of the
      // full feed over an empty base — the lambda-architecture parity
      val latest = rows.groupBy(_._1).map { case (_, rs) => rs.maxBy(_._2) }
        .map(r => (r._1, r._3, r._4)).toSet
      val feed = Seq(
        (1L, 0L, "I", "a", 10L), (2L, 0L, "I", "a", 20L), (3L, 0L, "I", "b", 30L),
        (1L, 2L, "U", "a", 11L), (2L, 1L, "D", "a", 0L), (3L, 1L, "D", "b", 0L),
        (3L, 1L, "U", "b", 33L), (4L, 1L, "I", "c", 40L))
        .toDF("key", "version", "op", "source", "nChars")
      val batch = Releases.applyCdc(feed.limit(0).drop("version", "op"),
          feed, Seq("key"), "version", "op")
        .as[(Long, String, Long)].collect().toSet
      assert(batch == Set((1L, "a", 11L), (3L, "b", 33L), (4L, "c", 40L)))
      assert(batch.forall(latest.contains))
    } finally q.stop()
    // ops outside I/U/D fail the trigger — the batch twin's raise_error
    // contract (a lowercase 'u' would lexicographically outrank 'U')
    val bad = MemoryStream[Streams.CdcChange]
    val qb = Streams.applyCdcStream(bad.toDS())
      .writeStream.format("memory").queryName("cdc_stream_bad")
      .outputMode("update").start()
    try {
      bad.addData(Streams.CdcChange(1L, 1L, "u", "a", 1L))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        qb.processAllAvailable()
      }
      assert(e.getMessage.contains("op must be I|U|D") ||
        Option(e.getCause).exists(_.getMessage.contains("op must be I|U|D")))
    } finally qb.stop()
  }

  test("transcript assembly: exact text, mask ranges cut the assistant lines, empty mask") {
    import graft.operators.Transcripts
    val turns = Seq(
      (1L, 1L, "user", "hello there"),
      (1L, 2L, "assistant", "hi"),
      (1L, 3L, "user", "bye"),
      (1L, 4L, "assistant", "see you"),
      (2L, 1L, "user", "alone"),
      (3L, 1L, "assistant", null.asInstanceOf[String])
    ).toDF("uid", "ord", "role", "txt")
    val got = Transcripts.assemble(turns, Seq("uid"), Seq(col("ord")), "role", "txt")
      .as[(Long, String, Long, String)].collect().sortBy(_._1).toSeq
    val t1 = "user: hello there\nassistant: hi\nuser: bye\nassistant: see you"
    assert(got(0) == (1L, t1, 4L, "18-31;42-60"))
    // the ranges substring to exactly the assistant lines
    for (r <- got(0)._4.split(";")) {
      val Array(s, e) = r.split("-").map(_.toInt)
      assert(t1.substring(s, e).startsWith("assistant: "))
    }
    assert(t1.substring(18, 31) == "assistant: hi")
    assert(got(1) == (2L, "user: alone", 1L, "")) // no assistant -> empty mask
    assert(got(2) == (3L, "assistant: ", 1L, "0-11")) // null text -> empty payload
  }
}
