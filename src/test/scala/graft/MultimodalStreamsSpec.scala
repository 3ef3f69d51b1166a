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

  // ---- hand-built media fixtures (no codec libs exist to write them) ----

  /** 24-bit bottom-up BMP: w x h, pixel (x,y) = rgb(x,y) as (r,g,b). */
  private def makeBmp(w: Int, h: Int)(rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](54 + stride * h)
    def le32(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte }
    def le16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
    out(0) = 'B'; out(1) = 'M'; le32(2, out.length); le32(10, 54)
    le32(14, 40); le32(18, w); le32(22, h); le16(26, 1); le16(28, 24); le32(34, stride * h)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgb(x, y)
      val o = 54 + (h - 1 - y) * stride + x * 3
      out(o) = b.toByte; out(o + 1) = g.toByte; out(o + 2) = r.toByte
    }
    out
  }

  /** Mono 16-bit PCM WAV at `rate` Hz from the given samples. */
  private def makeWav(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def tag(i: Int, s: String): Unit = (0 until 4).foreach(k => out(i + k) = s(k).toByte)
    def le32(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte }
    def le16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
    tag(0, "RIFF"); le32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 1); le32(24, rate)
    le32(28, rate * 2); le16(32, 2); le16(34, 16)
    tag(36, "data"); le32(40, dataLen)
    samples.zipWithIndex.foreach { case (s, i) =>
      out(44 + i * 2) = s.toByte; out(45 + i * 2) = (s >> 8).toByte }
    out
  }

  /** Minimal MP4: moov > trak > [mdia > hdlr(vide), minf > stbl > stts]. */
  private def makeMp4(frameCounts: Seq[Int]): Array[Byte] = {
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8 + payload.length) ++ typ.getBytes("ISO-8859-1") ++ payload
    // hdlr payload: version/flags, pre_defined, handler_type at offset 8
    val hdlr = box("hdlr", be32(0) ++ be32(0) ++ "vide".getBytes("ISO-8859-1") ++ new Array[Byte](12))
    val stts = box("stts", be32(0) ++ be32(frameCounts.length) ++
      frameCounts.toArray.flatMap(n => be32(n) ++ be32(1000)))
    val trak = box("trak", box("mdia", hdlr) ++ box("minf", box("stbl", stts)))
    box("ftyp", "isom0000".getBytes("ISO-8859-1")) ++ box("moov", trak)
  }

  test("real header parsing: PNG/GIF/BMP/JPEG dims, WAV info, MP4 frames") {
    import graft.operators.MediaCodecs
    // PNG signature + IHDR with dims 640x360
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      Array[Byte](0, 0, 0, 13) ++ "IHDR".getBytes ++
      Array[Byte](0, 0, 2, 0x80.toByte, 0, 0, 1, 0x68, 8, 6, 0, 0, 0)
    assert(MediaCodecs.imageDims(png).contains((640, 360)))
    // GIF89a 320x200
    val gif = "GIF89a".getBytes ++ Array[Byte](0x40, 0x01, 0xC8.toByte, 0x00, 0, 0, 0, 0)
    assert(MediaCodecs.imageDims(gif).contains((320, 200)))
    // JPEG: SOI, APP0 (empty), SOF0 with 100x50
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xE0.toByte, 0, 4, 0, 0, // APP0 len=4
      0xFF.toByte, 0xC0.toByte, 0, 11, 8, 0, 50, 0, 100, 1, 0, 0x11, 0)
    assert(MediaCodecs.imageDims(jpeg).contains((100, 50)))
    // BMP 6x4
    val bmp = makeBmp(6, 4)((x, y) => (40 * x, 40 * x, 40 * x))
    assert(MediaCodecs.imageDims(bmp).contains((6, 4)))
    // WAV: 8000 Hz, 8000 samples = 1000 ms, constant amplitude
    val wav = makeWav(8000, Array.fill(8000)(16384.toShort))
    val info = MediaCodecs.wavInfo(wav).get
    assert(info.sampleRate == 8000 && info.channels == 1 && info.durationMs == 1000L)
    assert(info.rmsEnvelope.forall(v => math.abs(v - 0.5f) < 0.01f))
    // MP4 with 24 + 6 frames in stts
    assert(MediaCodecs.mp4FrameCount(makeMp4(Seq(24, 6))).contains(30))
    // corrupt WAV (negative chunk size) must fail cleanly, not loop
    val bad = makeWav(8000, Array.fill(4)(1.toShort))
    bad(40) = -1; bad(41) = -1; bad(42) = -1; bad(43) = -1
    assert(MediaCodecs.wavInfo(bad).isEmpty)
  }

  test("bmp pixel feature and resize are real") {
    import graft.operators.MediaCodecs
    // left half black, right half white -> histogram mass in bins 0 and 7
    val bmp = makeBmp(8, 8)((x, _) => if (x < 4) (0, 0, 0) else (255, 255, 255))
    val hist = MediaCodecs.bmpLuminanceHistogram(bmp).get
    assert(math.abs(hist(0) - 0.5f) < 1e-6 && math.abs(hist(7) - 0.5f) < 1e-6)
    assert(hist.slice(1, 7).forall(_ == 0f))
    val small = MediaCodecs.bmpResize(bmp, 4, 4).get
    assert(MediaCodecs.imageDims(small).contains((4, 4)))
    // resized image keeps the half-black/half-white structure
    val smallHist = MediaCodecs.bmpLuminanceHistogram(small).get
    assert(math.abs(smallHist(0) - 0.5f) < 1e-6 && math.abs(smallHist(7) - 0.5f) < 1e-6)
  }

  /** Encode a PNG at bit depth 8 for the given color type, one scanline
    * filter per row (cycling None/Sub/Up/Average/Paeth) so decode must
    * invert all five. `px(x)(y)` gives per-channel samples.
    */
  private def makePng(w: Int, h: Int, colorType: Int,
                      palette: Array[Byte])(px: (Int, Int) => Array[Int]): Array[Byte] = {
    val channels = colorType match { case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4 }
    val stride = w * channels
    def sample(x: Int, y: Int, ch: Int): Int =
      if (x < 0 || y < 0) 0 else px(x, y)(ch)
    def paeth(a: Int, up: Int, c: Int): Int = {
      val p = a + up - c
      val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
    }
    val raw = new Array[Byte]((stride + 1) * h)
    for (y <- 0 until h) {
      val f = y % 5
      raw(y * (stride + 1)) = f.toByte
      for (i <- 0 until stride) {
        val x = i / channels; val ch = i % channels
        val g = sample(x, y, ch)
        val a = sample(x - 1, y, ch)
        val up = sample(x, y - 1, ch)
        val c = sample(x - 1, y - 1, ch)
        val v = f match {
          case 0 => g
          case 1 => g - a
          case 2 => g - up
          case 3 => g - ((a + up) >> 1)
          case 4 => g - paeth(a, up, c)
        }
        raw(y * (stride + 1) + 1 + i) = (v & 0xFF).toByte
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1024)
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()
    def be32(v: Int): Array[Byte] = Array(((v >> 24) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def chunk(typ: String, payload: Array[Byte]): Array[Byte] = {
      val tb = typ.getBytes("ISO-8859-1")
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(payload)
      be32(payload.length) ++ tb ++ payload ++ be32(crc.getValue.toInt)
    }
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, colorType.toByte, 0, 0, 0)
    val plte = if (palette == null) Array.empty[Byte] else chunk("PLTE", palette)
    sig ++ chunk("IHDR", ihdr) ++ plte ++ chunk("IDAT", zout.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
  }

  test("png pixel decode is real: inflate + all five filters, gray/RGB/palette/RGBA") {
    import graft.operators.MediaCodecs
    // grayscale: left half black, right half white; rows cycle all filters
    val gray = makePng(8, 10, 0, null)((x, _) => Array(if (x < 4) 0 else 255))
    val (gw, gh, grgb) = MediaCodecs.pngDecode(gray).get
    assert(gw == 8 && gh == 10)
    val gh0 = MediaCodecs.pngLuminanceHistogram(gray).get
    assert(math.abs(gh0(0) - 0.5f) < 1e-6 && math.abs(gh0(7) - 0.5f) < 1e-6)
    assert(grgb(0) == 0 && (grgb(3 * 7) & 0xFF) == 255) // first black, row-end white
    // RGB with a gradient (exercises Sub/Average/Paeth on non-trivial deltas)
    val rgb = makePng(6, 6, 2, null)((x, y) => Array(40 * x, 30 * y, 17 * (x + y)))
    val (_, _, rpix) = MediaCodecs.pngDecode(rgb).get
    for (y <- 0 until 6; x <- 0 until 6) {
      val o = (y * 6 + x) * 3
      assert((rpix(o) & 0xFF) == 40 * x && (rpix(o + 1) & 0xFF) == 30 * y &&
        (rpix(o + 2) & 0xFF) == 17 * (x + y), s"pixel ($x,$y)")
    }
    // palette: index 0 -> red, 1 -> blue
    val pal = Array[Byte](255.toByte, 0, 0, 0, 0, 255.toByte)
    val idx = makePng(4, 4, 3, pal)((x, _) => Array(if (x < 2) 0 else 1))
    val (_, _, ppix) = MediaCodecs.pngDecode(idx).get
    assert((ppix(0) & 0xFF) == 255 && (ppix(2) & 0xFF) == 0)        // red
    assert((ppix(3 * 3) & 0xFF) == 0 && (ppix(3 * 3 + 2) & 0xFF) == 255) // blue
    // RGBA: alpha dropped, color kept
    val rgba = makePng(4, 4, 6, null)((x, y) => Array(10 * x, 20 * y, 30, 128))
    val (_, _, apix) = MediaCodecs.pngDecode(rgba).get
    // pixel (3,0): r=10*3=30, g=0, b=30 — alpha (128) dropped
    assert((apix(9) & 0xFF) == 30 && (apix(10) & 0xFF) == 0 && (apix(11) & 0xFF) == 30)
    // malformed: truncated IDAT must return None, not throw
    val trunc = gray.dropRight(20)
    assert(MediaCodecs.pngDecode(trunc).isEmpty)
    // interlaced flag rejected (IHDR payload byte 12, abs offset 8+8+12)
    val inter = gray.clone()
    inter(28) = 1
    assert(MediaCodecs.pngDecode(inter).isEmpty)
  }

  test("decode stage uses real parsers per media type; resizeImages end-to-end") {
    val dir = tmp("media_real")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/img.bmp"),
      makeBmp(16, 9)((x, y) => (x * 10, y * 20, 128)))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/sound.wav"),
      makeWav(16000, Array.fill(1600)(8192.toShort)))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/clip.mp4"),
      makeMp4(Seq(48)))
    val media = Multimodal.readMedia(spark, s"$dir/*")
    val decoded = Multimodal.decode(media).collect().map(r =>
      r.getAs[String]("path").split('/').last -> r).toMap
    assert(decoded("img.bmp").getAs[Int]("width") == 16 &&
      decoded("img.bmp").getAs[Int]("height") == 9)
    assert(decoded("sound.wav").getAs[Int]("sample_rate") == 16000 &&
      decoded("sound.wav").getAs[Long]("duration_ms") == 100L)
    assert(decoded("clip.mp4").getAs[Int]("n_frames") == 48)
    val resized = Multimodal.resizeImages(media, 8, 4).collect()
      .map(r => r.getAs[String]("path").split('/').last -> r).toMap
    assert(resized("img.bmp").getAs[Boolean]("resized"))
    assert(graft.operators.MediaCodecs.imageDims(
      resized("img.bmp").getAs[Array[Byte]]("content")).contains((8, 4)))
    assert(!resized("sound.wav").getAs[Boolean]("resized"))
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

  test("session_window aggregation closes sessions on event-time gaps") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val events = mem.toDF().toDF("ts", "user")
    val agg = graft.streaming.Streams.sessionWindowAgg(
      events, "ts", "10 minutes", "5 minutes", Seq("user"),
      "events" -> count(lit(1)))
    val q = agg.writeStream.format("memory").queryName("sesswin")
      .outputMode("complete").start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      mem.addData(
        (ts("2024-01-01 00:01:00"), 1L), (ts("2024-01-01 00:03:00"), 1L),
        (ts("2024-01-01 00:30:00"), 1L)) // > 5 min silent -> new session
      q.processAllAvailable()
      val res = spark.sql("SELECT events FROM sesswin ORDER BY events").as[Long].collect().toSeq
      assert(res == Seq(1L, 2L))
    } finally q.stop()
  }

  test("streaming decontamination: stateless gram filter on an unbounded feed") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val cleaned = graft.operators.Contamination.decontaminateByGramSet(
      docs, "text", Seq("quick brown fox"), n = 3)
    val q = cleaned.writeStream.format("memory").queryName("decontam")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "the quick brown fox appears here"),
        (2L, "a perfectly clean training document text"),
        (3L, null)) // null text is uncontaminated by definition, must survive
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM decontam").as[Long].collect().toSeq.sorted
      assert(ids == Seq(2L, 3L))
    } finally q.stop()
  }

  test("stream-stream interval join attributes clicks within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(java.sql.Timestamp, Long)]
    val clicks = MemoryStream[(java.sql.Timestamp, Long)]
    val joined = graft.streaming.Streams.intervalJoin(
      imps.toDF().toDF("imp_ts", "imp_user"), "imp_ts", "20 minutes",
      clicks.toDF().toDF("click_ts", "click_user"), "click_ts", "20 minutes",
      "imp_user", "click_user", "10 minutes")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      imps.addData((ts("2024-01-01 00:00:00"), 1L), (ts("2024-01-01 00:00:00"), 2L))
      clicks.addData(
        (ts("2024-01-01 00:05:00"), 1L),  // within 10 min -> attributed
        (ts("2024-01-01 00:30:00"), 2L))  // past the horizon -> dropped
      q.processAllAvailable()
      val res = spark.sql("SELECT imp_user FROM attrib").as[Long].collect().toSeq
      assert(res == Seq(1L))
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

  test("incremental loop E2E: file stream -> windowed agg -> partitioned parquet sink") {
    // the reference's kontagent pattern end-to-end: hour files appear ->
    // watermarked rollup -> hive-partitioned parquet, re-readable in batch
    val dir = tmp("stream_e2e")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq((ts("2024-01-01 00:01:00"), "a", 1.0), (ts("2024-01-01 00:02:00"), "a", 2.0))
      .toDF("ts", "k", "v").write.parquet(s"$dir/in/batch1")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("ts", org.apache.spark.sql.types.TimestampType)
      .add("k", org.apache.spark.sql.types.StringType)
      .add("v", org.apache.spark.sql.types.DoubleType)
    val stream = graft.streaming.Streams.fileStream(spark, s"$dir/in/*", schema)
    val agg = graft.streaming.Streams.windowedAgg(stream, "ts", "10 minutes",
      "5 minutes", Seq("k"), "total" -> sum(col("v")))
      .select(col("k"), col("window.start").cast("date").as("day"), col("total"))
    val q = agg.writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .partitionBy("day").outputMode("append").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      // append-mode windows only emit once the watermark passes them: a
      // second batch of later data advances it past the first window
      q.awaitTermination(60000)
      Seq((ts("2024-01-01 01:00:00"), "a", 9.0)).toDF("ts", "k", "v")
        .write.parquet(s"$dir/in/batch2")
      val q2 = agg.writeStream.format("parquet")
        .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
        .partitionBy("day").outputMode("append").trigger(
          org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q2.awaitTermination(60000)
      val back = spark.read.parquet(s"$dir/out")
      assert(back.columns.toSet == Set("k", "total", "day"))
      val rows = back.select("k", "total").as[(String, Double)].collect().toSet
      assert(rows.contains(("a", 3.0)), s"missing first-window rollup in $rows")
    } finally if (q.isActive) q.stop()
  }
}
