package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.{Multimodal, Transforms}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Multimodal binary-column plumbing + Structured Streaming extension. */
class MultimodalStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("binaryFile ingest + typed media metadata + batched decode stub") {
    val dir = tmp("media")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.jpg"),
      Array[Byte](1, 2, 3, 4))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.mp4"),
      Array[Byte](9, 9, 9))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/c.bin"),
      Array[Byte](0))
    val media = Multimodal.readMedia(spark, s"$dir/*")
    val types = media.select("media_type").as[String].collect().sorted.toSeq
    assert(types == Seq("image", "unknown", "video"))

    val decoded = Multimodal.decode(media, batchSize = 2)
    assert(decoded.schema == Multimodal.decodedSchema)
    assert(decoded.count() == 3)
    // deterministic stub: same content -> same feature
    val f1 = decoded.filter(col("path").endsWith("a.jpg")).select("feature")
      .as[Seq[Float]].head()
    val f2 = Multimodal.decode(media).filter(col("path").endsWith("a.jpg"))
      .select("feature").as[Seq[Float]].head()
    assert(f1 == f2 && f1.length == 8)
    // video rows get n_frames >= 1 and frame sampling plans indices
    val frames = Multimodal.sampleFrames(decoded, stride = 10, maxFrames = 5)
    assert(frames.filter(col("media_type") =!= "video").count() == 0)
    assert(frames.select("frame_idx").as[Int].collect().forall(_ >= 0))
  }

  test("bulkMap batches rows through mapPartitions (transform.py:66-95)") {
    val df = (1 to 10).toDF("k")
    val schema = StructType(Seq(StructField("k", IntegerType), StructField("bs", IntegerType)))
    val out = Transforms.bulkMap(df.repartition(1), schema, bulkSize = 4) { batch =>
      batch.map(r => Row(r.getInt(0), batch.size))
    }
    // batch sizes must be 4,4,2 within the single partition
    assert(out.select("bs").as[Int].collect().sorted.toSeq == Seq(2, 2, 4, 4, 4, 4, 4, 4, 4, 4))
  }

  test("flatMap UDTF emits zero-or-more rows per input (transform.py:112-155)") {
    val df = Seq((1, "3:4"), (2, "")).toDF("a", "b")
    val schema = StructType(Seq(StructField("a", IntegerType), StructField("tok", StringType)))
    val out = Transforms.flatMapRows(df, schema) { r =>
      if (r.getString(1).isEmpty) Nil
      else r.getString(1).split(':').toSeq.map(t => Row(r.getInt(0), t))
    }
    assert(out.orderBy("tok").as[(Int, String)].collect().toSeq ==
      Seq((1, "3"), (1, "4")))
  }

  test("streaming windowed aggregation with watermark (Streams.windowedAgg)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "k", "v")
    val agg = graft.streaming.Streams.windowedAgg(events, "ts", "10 minutes",
      "5 minutes", Seq("k"), "total" -> sum(col("v")))
    val q = agg.writeStream.format("memory").queryName("winagg")
      .outputMode("update").start()
    try {
      mem.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "a", 1.0),
        (java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), "a", 2.0),
        (java.sql.Timestamp.valueOf("2024-01-01 00:07:00"), "a", 5.0))
      q.processAllAvailable()
      val res = spark.sql("SELECT k, total FROM winagg").as[(String, Double)].collect().toSet
      assert(res == Set(("a", 3.0), ("a", 5.0)))
    } finally q.stop()
  }

  test("streaming dedup within watermark drops repeats, keeps state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val events = mem.toDF().toDF("ts", "k")
    val deduped = graft.streaming.Streams.dedupWithinWatermark(events, "ts", "10 minutes", Seq("k"))
    val q = deduped.writeStream.format("memory").queryName("streamdedup")
      .outputMode("append").start()
    try {
      mem.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 1L),
        (java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 1L), // dup within watermark
        (java.sql.Timestamp.valueOf("2024-01-01 00:03:00"), 2L))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM streamdedup").as[Long].head() == 2L)
    } finally q.stop()
  }

  /** With ProcessingTimeTimeout, FlatMapGroupsWithStateExec reports
    * shouldRunAnotherBatch=true forever, so `noNewData` is never signaled and
    * `processAllAvailable` would block indefinitely — the query self-triggers
    * continuously instead, so tests poll the sink with a deadline.
    */
  private def pollUntil(deadlineMs: Long)(done: => Boolean): Unit = {
    val limit = System.currentTimeMillis() + deadlineMs
    while (!done && System.currentTimeMillis() < limit) Thread.sleep(100)
  }

  test("sessionize splits two bursts in ONE batch into two sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    // gap = 10 minutes; bursts 3x the gap apart inside a single micro-batch
    val sessions = graft.streaming.Streams.sessionize(mem.toDS(), gapMs = 600000L)
    val q = sessions.writeStream.format("memory").queryName("sess_split")
      .outputMode("append").start()
    try {
      mem.addData(
        (7L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
        (7L, java.sql.Timestamp.valueOf("2024-01-01 00:05:00")),
        (7L, java.sql.Timestamp.valueOf("2024-01-01 00:35:00")),
        (7L, java.sql.Timestamp.valueOf("2024-01-01 00:36:00")))
      pollUntil(60000) { spark.table("sess_split").count() >= 1 }
      // the first burst must close in-batch; the second stays open in state
      // (its processing-time timeout is 10 min away — far past this test)
      val closed = spark.table("sess_split")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSeq
      assert(closed == Seq((7L,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), 2L)))
    } finally q.stop()
  }

  test("sessionize processing-time timeout closes the trailing session") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    // gap must exceed the events' 1s event-time spacing (so they merge into
    // one session) while staying small enough for a quick real-time timeout
    val sessions = graft.streaming.Streams.sessionize(mem.toDS(), gapMs = 5000L)
    val q = sessions.writeStream.format("memory").queryName("sess_timeout")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
        (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01")))
      // the query triggers continuously; after ~5s of silence the state
      // times out and the open session is emitted
      pollUntil(60000) { spark.table("sess_timeout").count() >= 1 }
      val out = spark.table("sess_timeout")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSeq
      assert(out == Seq((1L,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 2L)))
    } finally q.stop()
  }

  test("primary-key metadata tagging (TypeDetect.withPrimaryKeyMetadata)") {
    val df = Seq(("a", 1), ("a", 2)).toDF("dup", "pk")
    val out = graft.operators.TypeDetect.withPrimaryKeyMetadata(df)
    assert(out.schema("pk").metadata.getBoolean("graft.primaryKey"))
    assert(!out.schema("dup").metadata.contains("graft.primaryKey"))
  }

  test("streaming file source reads appended files (Streams.fileStream)") {
    val dir = tmp("stream_src")
    val out = Seq((1L, "x")).toDF("id", "v")
    out.write.parquet(s"$dir/batch1")
    val stream = graft.streaming.Streams.fileStream(spark, s"$dir/batch1", out.schema)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("filesrc").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM filesrc").as[Long].head() == 1L)
    } finally q.stop()
  }
}
