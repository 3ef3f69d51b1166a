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

  /** Interleaved stereo 16-bit PCM WAV; `frames` holds (left, right). */
  private def makeStereoWav(rate: Int, frames: Array[(Short, Short)]): Array[Byte] = {
    val dataLen = frames.length * 4
    val out = new Array[Byte](44 + dataLen)
    def tag(i: Int, s: String): Unit = (0 until 4).foreach(k => out(i + k) = s(k).toByte)
    def le32(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte }
    def le16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
    tag(0, "RIFF"); le32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 2); le32(24, rate)
    le32(28, rate * 4); le16(32, 4); le16(34, 16)
    tag(36, "data"); le32(40, dataLen)
    frames.zipWithIndex.foreach { case ((l, r), i) =>
      le16(44 + i * 4, l & 0xFFFF); le16(46 + i * 4, r & 0xFFFF) }
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
    // WebP: lossy VP8 (start code + 14-bit dims), lossless VP8L (packed
    // minus-one fields), extended VP8X (24-bit minus-one canvas)
    def webp(tag: String, payload: Array[Byte]): Array[Byte] =
      "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "WEBP".getBytes ++
        tag.getBytes ++ Array[Byte](0, 0, 0, 0) ++ payload
    val vp8 = webp("VP8 ", Array[Byte](0, 0, 0, 0x9D.toByte, 0x01, 0x2A,
      0x40, 0x01, 0xC8.toByte, 0x00)) // 320×200
    assert(MediaCodecs.imageDims(vp8).contains((320, 200)))
    val vp8l = webp("VP8L", Array[Byte](0x2F) ++ {
      val v = (320 - 1) | ((200 - 1) << 14)
      Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    })
    assert(MediaCodecs.imageDims(vp8l).contains((320, 200)))
    val vp8x = webp("VP8X", Array[Byte](0, 0, 0, 0,
      (640 - 1).toByte, ((640 - 1) >> 8).toByte, 0, (360 - 1).toByte, ((360 - 1) >> 8).toByte, 0))
    assert(MediaCodecs.imageDims(vp8x).contains((640, 360)))
    // MP4 with 24 + 6 frames in stts
    assert(MediaCodecs.mp4FrameCount(makeMp4(Seq(24, 6))).contains(30))
    // corrupt WAV (negative chunk size) must fail cleanly, not loop
    val bad = makeWav(8000, Array.fill(4)(1.toShort))
    bad(40) = -1; bad(41) = -1; bad(42) = -1; bad(43) = -1
    assert(MediaCodecs.wavInfo(bad).isEmpty)
  }

  test("video container durations: MP4 mvhd v0/v1, AVI avih, Matroska Info") {
    import graft.operators.MediaCodecs
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8 + payload.length) ++ typ.getBytes("ISO-8859-1") ++ payload
    // MP4 mvhd v0: timescale 600, duration 900 ticks -> 1500 ms
    val mvhd0 = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(600) ++ be32(900))
    val mp4v0 = box("ftyp", "isom0000".getBytes("ISO-8859-1")) ++ box("moov", mvhd0)
    assert(MediaCodecs.mp4DurationMs(mp4v0).contains(1500L))
    // mvhd v1: 64-bit creation/modification times, timescale 1000, duration 2500
    val mvhd1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++
      be32(1000) ++ be32(0) ++ be32(2500))
    val mp4v1 = box("moov", mvhd1)
    assert(MediaCodecs.mp4DurationMs(mp4v1).contains(2500L))
    // AVI: avih payload has dwMicroSecPerFrame@0, dwTotalFrames@16
    val avih = new Array[Byte](64)
    def le32(o: Int, v: Int): Unit = { avih(o) = v.toByte; avih(o + 1) = (v >> 8).toByte
      avih(o + 2) = (v >> 16).toByte; avih(o + 3) = (v >> 24).toByte }
    "avih".getBytes("ISO-8859-1").copyToArray(avih)
    le32(4, 56); le32(8, 33333); le32(24, 60)
    val hdrl = "hdrl".getBytes("ISO-8859-1") ++ avih
    val avi = "RIFF".getBytes("ISO-8859-1") ++
      Array[Byte]((8 + hdrl.length).toByte, 0, 0, 0) ++
      "AVI ".getBytes("ISO-8859-1") ++
      "LIST".getBytes("ISO-8859-1") ++ Array[Byte](hdrl.length.toByte, 0, 0, 0) ++ hdrl
    assert(MediaCodecs.aviInfo(avi).contains((60, 1999L))) // 60 * 33333 / 1000
    // Matroska: Segment > Info > TimestampScale(1e6 ns) + Duration f32 750.0
    def eb(bytes: Int*): Array[Byte] = bytes.map(v => (v & 0xFF).toByte).toArray
    val mkv = eb(0x1A, 0x45, 0xDF, 0xA3, 0x80) ++
      eb(0x18, 0x53, 0x80, 0x67, 0x94) ++
      eb(0x15, 0x49, 0xA9, 0x66, 0x8F) ++
      eb(0x2A, 0xD7, 0xB1, 0x84, 0x00, 0x0F, 0x42, 0x40) ++
      eb(0x44, 0x89, 0x84) ++ be32(java.lang.Float.floatToIntBits(750.0f))
    assert(MediaCodecs.mkvDurationMs(mkv).contains(750L))
    // truncated inputs fail cleanly
    assert(MediaCodecs.mp4DurationMs(mp4v0.take(10)).isEmpty)
    assert(MediaCodecs.aviInfo(avi.take(16)).isEmpty)
    assert(MediaCodecs.mkvDurationMs(mkv.take(7)).isEmpty)
    // 64-bit largesize (size==1) boxes skip correctly: a big-file-layout
    // mdat with largesize must not swallow the following moov
    val largeMdat = be32(1) ++ "mdat".getBytes("ISO-8859-1") ++
      be32(0) ++ be32(24) ++ new Array[Byte](8) // largesize 24 = header+8 payload
    assert(MediaCodecs.mp4DurationMs(largeMdat ++ mp4v0.drop(box("ftyp",
      "isom0000".getBytes("ISO-8859-1")).length)).contains(1500L))
  }

  test("malformed media inputs fail soft, never crash (int-overflow guards)") {
    import graft.operators.MediaCodecs
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    // PNG whose chunk length is near Int.MaxValue: i+12+len wraps negative
    // in int arithmetic — must return None, not throw
    val evilPng = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      be32(0x7FFFFFF0) ++ "IDAT".getBytes("ISO-8859-1") ++ new Array[Byte](16)
    assert(MediaCodecs.pngDecode(evilPng).isEmpty)
    MediaCodecs.imageDims(evilPng) // lenient fixed-offset read; must not throw
    // WAV whose chunk size is 0x7FFFFFFF: the offset advance wraps negative
    val evilWav = "RIFF".getBytes("ISO-8859-1") ++ be32(100).reverse ++
      "WAVE".getBytes("ISO-8859-1") ++
      "junk".getBytes("ISO-8859-1") ++ Array[Byte](-1, -1, -1, 0x7F) ++
      new Array[Byte](32)
    assert(MediaCodecs.wavInfo(evilWav).isEmpty)
    // MP4 box with size near Int.MaxValue: end offset must clamp, not wrap
    val evilMp4 = be32(0x7FFFFFF0) ++ "moov".getBytes("ISO-8859-1") ++ new Array[Byte](64)
    assert(MediaCodecs.mp4DurationMs(evilMp4).isEmpty)
    assert(MediaCodecs.mp4FrameCount(evilMp4).isEmpty)
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

  test("dHash: spec-derived bits, brightness invariance, size guard, cross-format") {
    import graft.operators.MediaCodecs
    def gray(v: Int) = (v, v, v)
    // 18x16 gradient: 9x8 grid of exact 2x2-px cells, means strictly
    // increasing left-to-right -> every bit set
    val grad = makeBmp(18, 16)((x, _) => gray(x * 14))
    def hashOf(b: Array[Byte]): Long = {
      val (w, h, rgb) = MediaCodecs.imageRgb(b).get
      MediaCodecs.dHash64(w, h, rgb).get
    }
    assert(hashOf(grad) == -1L)
    // brightness shift preserves every gradient sign -> identical hash
    assert(hashOf(makeBmp(18, 16)((x, _) => gray(x * 14 + 17))) == -1L)
    // inverted gradient: no cell is brighter to the right -> 0
    assert(hashOf(makeBmp(18, 16)((x, _) => gray((17 - x) * 14))) == 0L)
    // zeroing exactly grid cell (r=0, c=4) flips only bit r*8+c = 3
    val dip = makeBmp(18, 16)((x, y) =>
      if (y < 2 && (x == 8 || x == 9)) gray(0) else gray(x * 14))
    assert(hashOf(dip) == (-1L ^ 8L))
    // below the 9x8 grid there is no signature
    val (w8, h8, rgb8) = MediaCodecs.imageRgb(makeBmp(8, 8)((x, _) => gray(x))).get
    assert(MediaCodecs.dHash64(w8, h8, rgb8).isEmpty)
    // the same pixels through the PNG decoder hash identically (format
    // independence of the perceptual key)
    val png = makePng(18, 16, 2, null)((x, _) => Array(x * 14, x * 14, x * 14))
    assert(hashOf(png) == -1L)
  }

  test("imageDHashes + imageNearDupPairs: shifted copy pairs at 0, inverse never; hamming boundary") {
    import graft.operators.{MediaCodecs, Multimodal, NearDedup}
    val dir = tmp("dhash_media")
    def gray(v: Int) = (v, v, v)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.bmp"),
      makeBmp(18, 16)((x, _) => gray(x * 14)))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.bmp"),
      makeBmp(18, 16)((x, _) => gray(x * 14 + 17)))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/c.bmp"),
      makeBmp(18, 16)((x, _) => gray((17 - x) * 14)))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/tiny.bmp"),
      makeBmp(8, 8)((x, _) => gray(x))) // no 9x8 grid: silently dropped
    val hashes = Multimodal.imageDHashes(Multimodal.readMedia(spark, s"$dir/*"))
      .withColumn("file", regexp_extract(col("path"), "([^/]+)$", 1))
    assert(hashes.count() == 3L)
    val pairs = Multimodal.imageNearDupPairs(hashes, "file", "dhash", maxHamming = 8)
      .as[(String, String, Int)].collect().toSeq.sorted
    assert(pairs == Seq(("a.bmp", "b.bmp", 0)))
    // hammingPairs64 budget boundary: distance exactly maxHamming passes,
    // maxHamming + 1 does not (pigeonhole chunks guarantee the candidate)
    val sigs = Seq((1L, 0L), (2L, 255L), (3L, 511L)).toDF("id", "sig")
    val got = NearDedup.hammingPairs64(sigs, maxHamming = 8)
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(got == Seq((1L, 2L, 8), (2L, 3L, 1)))
  }

  test("audio fingerprint: delta-sign bits from real PCM, gain invariance, size guard") {
    import graft.operators.{MediaCodecs, Multimodal}
    def envelope(amps: Seq[Int]): Array[Short] =
      amps.flatMap(a => Seq.fill(100)(a.toShort)).toArray
    val asc = (1 to 65).map(_ * 450)
    def fpOf(samples: Array[Short]): Long = {
      val (rate, decoded) = MediaCodecs.wavSamples(makeWav(8000, samples)).get
      assert(rate == 8000)
      MediaCodecs.audioFingerprint64(decoded).get
    }
    // strictly ascending window energies -> every delta-sign bit set
    assert(fpOf(envelope(asc)) == -1L)
    // a uniform gain change scales every window energy equally
    assert(fpOf(envelope(asc.map(_ / 2))) == -1L)
    // reversed envelope: no window louder than its predecessor
    assert(fpOf(envelope(asc.reverse)) == 0L)
    // muting window 4 clears exactly bit 3 (e4 > e3 becomes false)
    assert(fpOf(envelope(asc.updated(4, 0))) == (-1L ^ 8L))
    // below 65 samples there is no fingerprint
    assert(MediaCodecs.audioFingerprint64(Array.fill(64)(0.5)).isEmpty)
    // stereo downmix: an L==R stereo copy decodes to the mono waveform
    // (frame count, not interleaved-sample count), and a one-sided mix
    // (R muted) is a uniform gain change — same fingerprint as the mono
    val monoSamples = envelope(asc)
    val (srate, stereoDec) = MediaCodecs.wavSamples(
      makeStereoWav(8000, monoSamples.map(s => (s, s)))).get
    assert(srate == 8000 && stereoDec.length == monoSamples.length)
    assert(stereoDec.sameElements(monoSamples.map(_.toDouble / 32768.0)))
    val (_, oneSided) = MediaCodecs.wavSamples(
      makeStereoWav(8000, monoSamples.map(s => (s, 0.toShort)))).get
    assert(MediaCodecs.audioFingerprint64(oneSided).get == fpOf(monoSamples))
    // end-to-end: the G.711-style distinct copies pair, the reversal never
    val dir = tmp("afp_media")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.wav"),
      makeWav(8000, envelope(asc)))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/half.wav"),
      makeWav(8000, envelope(asc.map(_ / 2))))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/rev.wav"),
      makeWav(8000, envelope(asc.reverse)))
    val fps = Multimodal.audioFingerprints(Multimodal.readMedia(spark, s"$dir/*"))
      .withColumn("file", regexp_extract(col("path"), "([^/]+)$", 1))
    val pairs = Multimodal.audioNearDupPairs(fps, "file", "afp", maxHamming = 2)
      .as[(String, String, Int)].collect().toSeq.sorted
    assert(pairs == Seq(("a.wav", "half.wav", 0)))
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

  /** Bit-writer for JPEG entropy segments: MSB-first, 0xFF byte-stuffing,
    * 1-padding to byte alignment (T.81 F.1.2.3).
    */
  private final class JBits {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var cnt = 0
    def put(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1); cnt += 1
        if (cnt == 8) { out.write(cur); if (cur == 0xFF) out.write(0x00); cur = 0; cnt = 0 }
        i -= 1
      }
    }
    def align(): Unit = while (cnt != 0) put(1, 1)
    def raw(bytes: Int*): Unit = { align(); bytes.foreach(out.write) }
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  /** Encode one DC-only block: category in the trivial DC table (cat k ↔
    * 4-bit code k), magnitude bits, then the 1-bit EOB of the trivial AC
    * table.
    */
  private def putDcBlock(bw: JBits, diff: Int): Unit = {
    val s = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
    bw.put(s, 4)
    if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    bw.put(0, 1)
  }

  /** Baseline JPEG encoder for DC-only fixtures: flat all-ones quant (so a
    * DC coefficient of (v-128)*8 decodes to the uniform sample v), trivial
    * huffman tables, any sampling factors, optional restart markers.
    * `value(mcu, comp, by, bx)` gives each block's uniform sample 0..255.
    */
  private def makeJpeg(w: Int, h: Int, sofComps: Seq[(Int, Int, Int)],
                       restartInterval: Int = 0)
                      (value: (Int, Int, Int, Int) => Int): Array[Byte] = {
    // T.81 A.2: a single-component scan is non-interleaved — the data-unit
    // raster ignores declared sampling (the SOF below still declares it)
    val comps = if (sofComps.length == 1) sofComps.map { case (id, _, _) => (id, 1, 1) }
                else sofComps
    val hmax = comps.map(_._2).max
    val vmax = comps.map(_._3).max
    val mcus = ((w + 8 * hmax - 1) / (8 * hmax)) * ((h + 8 * vmax - 1) / (8 * vmax))
    val out = new java.io.ByteArrayOutputStream()
    def wr(bytes: Int*): Unit = bytes.foreach(v => out.write(v & 0xFF))
    wr(0xFF, 0xD8)
    wr(0xFF, 0xDB, 0x00, 0x43, 0x00); (0 until 64).foreach(_ => wr(1))
    wr(0xFF, 0xC0, 0x00, 8 + comps.length * 3, 8,
      h >> 8, h & 0xFF, w >> 8, w & 0xFF, comps.length)
    sofComps.foreach { case (id, hs, vs) => wr(id, (hs << 4) | vs, 0) } // declared sampling
    wr(0xFF, 0xC4, 0x00, 0x1F, 0x00)
    wr(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    (0 to 11).foreach(v => wr(v))
    wr(0xFF, 0xC4, 0x00, 0x14, 0x10)
    wr(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    wr(0x00)
    if (restartInterval > 0)
      wr(0xFF, 0xDD, 0x00, 0x04, restartInterval >> 8, restartInterval & 0xFF)
    wr(0xFF, 0xDA, 0x00, 6 + comps.length * 2, comps.length)
    comps.foreach { case (id, _, _) => wr(id, 0x00) }
    wr(0, 63, 0)
    val bw = new JBits
    val pred = new Array[Int](comps.length)
    var rst = 0
    for (mcu <- 0 until mcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.raw(0xFF, 0xD0 + (rst % 8)); rst += 1
        java.util.Arrays.fill(pred, 0)
      }
      for (c <- comps.indices) {
        val (_, hs, vs) = comps(c)
        for (by <- 0 until vs; bx <- 0 until hs) {
          val dc = (value(mcu, c, by, bx) - 128) * 8
          putDcBlock(bw, dc - pred(c))
          pred(c) = dc
        }
      }
    }
    out.write(bw.bytes)
    wr(0xFF, 0xD9)
    out.toByteArray
  }

  test("baseline JPEG pixel decode is real: huffman + EXTEND + IDCT, exact grays") {
    import graft.operators.MediaCodecs
    // two 8×8 MCUs: left pixels 0, right pixels 128 — DC-only, predictor-chained
    val jpg = makeJpeg(16, 8, Seq((1, 1, 1)))((mcu, _, _, _) => if (mcu == 0) 0 else 128)
    val (w, h, rgb) = MediaCodecs.jpegDecode(jpg).get
    assert(w == 16 && h == 8)
    for (y <- 0 until 8; x <- 0 until 16) {
      val expect = if (x < 8) 0 else 128
      val o = (y * 16 + x) * 3
      assert((rgb(o) & 0xFF) == expect && (rgb(o + 1) & 0xFF) == expect &&
        (rgb(o + 2) & 0xFF) == expect, s"pixel ($x,$y)")
    }
    val hist = MediaCodecs.jpegLuminanceHistogram(jpg).get
    assert(math.abs(hist(0) - 0.5f) < 1e-6 && math.abs(hist(4) - 0.5f) < 1e-6)
    // grayscale frames DECLARING 2×2 sampling (some encoders do): a
    // single-component scan is non-interleaved per T.81 A.2 — the block
    // raster must ignore the sampling factors, not expect phantom padding
    val sampled = makeJpeg(24, 8, Seq((1, 2, 2)))(
      (mcu, _, _, _) => Seq(0, 128, 255)(mcu))
    val (sw2, sh2, spix) = MediaCodecs.jpegDecode(sampled).get
    assert(sw2 == 24 && sh2 == 8)
    for (x <- 0 until 24) {
      val expect = Seq(0, 128, 255)(x / 8)
      assert((spix(x * 3) & 0xFF) == expect, s"col $x")
    }
  }

  test("JPEG 4:2:0 color: MCU interleave, chroma upsampling, YCbCr→RGB") {
    import graft.operators.MediaCodecs
    // 16×16, Y sampled 2×2 (quadrant values 0/64/128/192), Cb=192, Cr=64
    val jpg = makeJpeg(16, 16, Seq((1, 2, 2), (2, 1, 1), (3, 1, 1))) {
      (_, c, by, bx) =>
        if (c == 0) Seq(0, 64, 128, 192)(by * 2 + bx)
        else if (c == 1) 192
        else 64
    }
    val (w, h, rgb) = MediaCodecs.jpegDecode(jpg).get
    assert(w == 16 && h == 16)
    // expected per quadrant from the BT.601 formulas (cb=+64, cr=-64):
    // R = Y - 89.728 | G = Y + 23.68 | B = Y + 113.408, clamped and rounded
    val expect = Map(
      (0, 0) -> (0, 24, 113), (1, 0) -> (0, 88, 177),
      (0, 1) -> (38, 152, 241), (1, 1) -> (102, 216, 255))
    for (y <- 0 until 16; x <- 0 until 16) {
      val (er, eg, eb) = expect((x / 8, y / 8))
      val o = (y * 16 + x) * 3
      assert((rgb(o) & 0xFF) == er && (rgb(o + 1) & 0xFF) == eg &&
        (rgb(o + 2) & 0xFF) == eb, s"pixel ($x,$y)")
    }
  }

  /** Independent reference IDCT (direct 4-loop T.81 A.3.3 formula) for
    * checking decoded pixels without sharing the decoder's basis matrix.
    */
  private def refIdct(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var acc = 0.0
      for (u <- 0 until 8; v <- 0 until 8) {
        val cu = if (u == 0) 1 / math.sqrt(2.0) else 1.0
        val cv = if (v == 0) 1 / math.sqrt(2.0) else 1.0
        acc += cu * cv / 4 * coef(u * 8 + v) *
          math.cos((2 * y + 1) * u * math.Pi / 16) * math.cos((2 * x + 1) * v * math.Pi / 16)
      }
      out(y * 8 + x) = math.max(0, math.min(255, math.round(acc + 128).toInt))
    }
    out
  }

  /** Shared progressive-JPEG header: SOF2, flat quant, trivial DC table
    * (cat k ↔ 4-bit code k) and an all-3-bit AC table covering the symbols
    * the tests emit (EOB0, (0,1), (0,2), EOB4=0x20, ZRL).
    */
  private def progHeader(w: Int, h: Int, comps: Seq[(Int, Int, Int)]): java.io.ByteArrayOutputStream = {
    val out = new java.io.ByteArrayOutputStream()
    def wr(bytes: Int*): Unit = bytes.foreach(v => out.write(v & 0xFF))
    wr(0xFF, 0xD8)
    wr(0xFF, 0xDB, 0x00, 0x43, 0x00); (0 until 64).foreach(_ => wr(1))
    wr(0xFF, 0xC2, 0x00, 8 + comps.length * 3, 8,
      h >> 8, h & 0xFF, w >> 8, w & 0xFF, comps.length)
    comps.foreach { case (id, hs, vs) => wr(id, (hs << 4) | vs, 0) }
    wr(0xFF, 0xC4, 0x00, 0x1F, 0x00)
    wr(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    (0 to 11).foreach(v => wr(v))
    wr(0xFF, 0xC4, 0x00, 0x1B, 0x10)                          // AC: 8 codes of length 3
    wr(0, 0, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    wr(0x00, 0x01, 0x02, 0x20, 0xF0, 0x31, 0x12, 0x21)       // EOB0,(0,1),(0,2),EOB4,ZRL,…
    out
  }

  private def sosHeader(out: java.io.ByteArrayOutputStream, compIds: Seq[Int],
                        ss: Int, se: Int, ah: Int, al: Int): Unit = {
    def wr(bytes: Int*): Unit = bytes.foreach(v => out.write(v & 0xFF))
    wr(0xFF, 0xDA, 0x00, 6 + compIds.length * 2, compIds.length)
    compIds.foreach(id => wr(id, 0x00))
    wr(ss, se, (ah << 4) | al)
  }

  /** DC category code (trivial table: cat k ↔ 4-bit code k) + magnitude. */
  private def putDcValue(bw: JBits, diff: Int): Unit = {
    val s = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
    bw.put(s, 4)
    if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
  }

  test("progressive JPEG: DC successive approximation + AC band scan, exact pixels") {
    import graft.operators.MediaCodecs
    // gray 8×8, one block: DC -1024 coded at Al=1 then refined; AC coef 6
    // at k=1 coded at Al=1 (value 3, size 2) then refined with a 0 bit
    val out = progHeader(8, 8, Seq((1, 1, 1)))
    def scan(ss: Int, se: Int, ah: Int, al: Int)(body: JBits => Unit): Unit = {
      sosHeader(out, Seq(1), ss, se, ah, al)
      val bw = new JBits; body(bw); out.write(bw.bytes)
    }
    scan(0, 0, 0, 1)(bw => putDcValue(bw, -512))   // DC first: -1024 >> 1
    scan(0, 0, 1, 0)(bw => bw.put(0, 1))           // DC refine: low bit 0
    scan(1, 63, 0, 1) { bw =>
      bw.put(2, 3)                                 // symbol (0,2) → code 010
      bw.put(3, 2)                                 // value 3 (= 6 >> 1)
      bw.put(0, 3)                                 // EOB0 → code 000
    }
    scan(1, 63, 1, 0) { bw =>
      bw.put(0, 3)                                 // EOB0: run = 1 (this block)
      bw.put(0, 1)                                 // correction bit for coef@k=1
    }
    out.write(0xFF); out.write(0xD9)
    val (w, h, rgb) = MediaCodecs.jpegDecode(out.toByteArray).get
    assert(w == 8 && h == 8)
    val coefs = new Array[Int](64)
    coefs(0) = -1024; coefs(1) = 6
    val expect = refIdct(coefs)
    for (y <- 0 until 8; x <- 0 until 8) {
      val o = (y * 8 + x) * 3
      assert((rgb(o) & 0xFF) == expect(y * 8 + x), s"pixel ($x,$y)")
    }
  }

  test("progressive JPEG 4:2:0: interleaved DC scan, EOB runs, matches baseline") {
    import graft.operators.MediaCodecs
    val out = progHeader(16, 16, Seq((1, 2, 2), (2, 1, 1), (3, 1, 1)))
    // DC first, interleaved, Al=1: Y quadrants 0/64/128/192 → coef>>1 =
    // -512/-256/0/256 (diffs -512,+256,+256,+256); Cb 256; Cr -256
    sosHeader(out, Seq(1, 2, 3), 0, 0, 0, 1)
    val bw1 = new JBits
    putDcValue(bw1, -512); putDcValue(bw1, 256); putDcValue(bw1, 256); putDcValue(bw1, 256)
    putDcValue(bw1, 256); putDcValue(bw1, -256)
    out.write(bw1.bytes)
    // DC refine: all DC coefficients even → 6 zero bits
    sosHeader(out, Seq(1, 2, 3), 0, 0, 1, 0)
    val bw2 = new JBits; (0 until 6).foreach(_ => bw2.put(0, 1)); out.write(bw2.bytes)
    // AC first per component at Al=0: Y = EOB4 (code 011 + 2 extra bits 00),
    // Cb/Cr = EOB0
    sosHeader(out, Seq(1), 1, 63, 0, 0)
    val bw3 = new JBits; bw3.put(3, 3); bw3.put(0, 2); out.write(bw3.bytes)
    sosHeader(out, Seq(2), 1, 63, 0, 0)
    val bw4 = new JBits; bw4.put(0, 3); out.write(bw4.bytes)
    sosHeader(out, Seq(3), 1, 63, 0, 0)
    val bw5 = new JBits; bw5.put(0, 3); out.write(bw5.bytes)
    out.write(0xFF); out.write(0xD9)
    val prog = MediaCodecs.jpegDecode(out.toByteArray).get
    // identical final coefficients as the baseline encoder's version
    val base = MediaCodecs.jpegDecode(
      makeJpeg(16, 16, Seq((1, 2, 2), (2, 1, 1), (3, 1, 1))) { (_, c, by, bx) =>
        if (c == 0) Seq(0, 64, 128, 192)(by * 2 + bx) else if (c == 1) 192 else 64
      }).get
    assert(prog._1 == 16 && prog._2 == 16)
    assert(prog._3.toSeq == base._3.toSeq)
  }

  test("JPEG restart markers: byte-align, consume RSTn, reset DC predictors") {
    import graft.operators.MediaCodecs
    val plain = makeJpeg(16, 8, Seq((1, 1, 1)))((mcu, _, _, _) => if (mcu == 0) 0 else 128)
    val rst = makeJpeg(16, 8, Seq((1, 1, 1)), restartInterval = 1)(
      (mcu, _, _, _) => if (mcu == 0) 0 else 128)
    assert(rst.length > plain.length) // the RST marker is actually in there
    assert(MediaCodecs.jpegDecode(rst).get._3.toSeq == MediaCodecs.jpegDecode(plain).get._3.toSeq)
  }

  test("JPEG odd dims crop the MCU grid; malformed/truncated rejected cleanly") {
    import graft.operators.MediaCodecs
    // 12×6 still needs two MCUs horizontally; output must crop to 12×6
    val odd = makeJpeg(12, 6, Seq((1, 1, 1)))((mcu, _, _, _) => if (mcu == 0) 0 else 128)
    val (w, h, rgb) = MediaCodecs.jpegDecode(odd).get
    assert(w == 12 && h == 6 && rgb.length == 12 * 6 * 3)
    assert((rgb(0) & 0xFF) == 0 && (rgb(11 * 3) & 0xFF) == 128)
    val sof = (0 until odd.length - 1).find(i =>
      (odd(i) & 0xFF) == 0xFF && (odd(i + 1) & 0xFF) == 0xC0).get
    // flip SOF0 to SOF2: the baseline Ss=0/Se=63 scan header is invalid in
    // a progressive frame (DC scans carry only coefficient 0) — reject
    val prog = odd.clone()
    prog(sof + 1) = 0xC2.toByte
    assert(MediaCodecs.jpegDecode(prog).isEmpty)
    assert(MediaCodecs.imageDims(prog).contains((12, 6)))
    // arithmetic coding (SOF9) is out of scope — reject
    val arith = odd.clone()
    arith(sof + 1) = 0xC9.toByte
    assert(MediaCodecs.jpegDecode(arith).isEmpty)
    // truncated entropy data must terminate without throwing
    MediaCodecs.jpegDecode(odd.dropRight(6))
  }

  /** Proper GIF LZW encoder (variable-width LSB-first codes, dictionary
    * growth in decoder lockstep) — an independent implementation the
    * decoder must round-trip exactly.
    */
  private def gifLzwEncode(indices: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0
    var codeSize = minCode + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << accBits; accBits += codeSize
      while (accBits >= 8) { out.write((acc & 0xFF).toInt); acc >>>= 8; accBits -= 8 }
    }
    val dict = scala.collection.mutable.HashMap[List[Int], Int]()
    var nextCode = end + 1
    put(clear)
    var cur: List[Int] = Nil // reversed current sequence
    for (px <- indices) {
      val cand = px :: cur
      if (cand.lengthCompare(1) == 0 || dict.contains(cand)) cur = cand
      else {
        put(if (cur.lengthCompare(1) == 0) cur.head else dict(cur))
        if (nextCode < 4096) {
          dict(cand) = nextCode; nextCode += 1
          // the decoder's dictionary adds LAG the encoder's by one emitted
          // code (it defines nothing on the first code), so the encoder
          // bumps width one code later than its own dict size suggests
          if (nextCode == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
        }
        cur = List(px)
      }
    }
    if (cur.nonEmpty) put(if (cur.lengthCompare(1) == 0) cur.head else dict(cur))
    put(end)
    if (accBits > 0) out.write((acc & 0xFF).toInt)
    out.toByteArray
  }

  /** GIF89a with one image frame at (fx, fy); `px(x, y)` gives the palette
    * index per frame pixel.
    */
  private def makeGif(sw: Int, sh: Int, palette: Array[Byte], minCode: Int,
                      fx: Int = 0, fy: Int = 0, fw: Int = -1, fh: Int = -1,
                      interlaced: Boolean = false, bg: Int = 0)
                     (px: (Int, Int) => Int): Array[Byte] = {
    val w = if (fw < 0) sw else fw
    val h = if (fh < 0) sh else fh
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("ISO-8859-1"))
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    le16(sw); le16(sh)
    val sizeBits = (math.log(palette.length / 3) / math.log(2)).round.toInt - 1
    out.write(0x80 | 0x70 | sizeBits); out.write(bg); out.write(0)
    out.write(palette)
    out.write(0x21); out.write(0xFE) // a comment extension in the way
    out.write(3); out.write("hi!".getBytes("ISO-8859-1")); out.write(0)
    out.write(0x2C); le16(fx); le16(fy); le16(w); le16(h)
    out.write(if (interlaced) 0x40 else 0)
    out.write(minCode)
    // file stores rows in pass order when interlaced
    val rowOrder =
      if (!interlaced) Array.range(0, h)
      else Array.range(0, h, 8) ++ Array.range(4, h, 8) ++
        Array.range(2, h, 4) ++ Array.range(1, h, 2)
    val indices = rowOrder.flatMap(y => (0 until w).map(x => px(x, y)))
    val lzw = gifLzwEncode(indices, minCode)
    lzw.grouped(255).foreach { blk => out.write(blk.length); out.write(blk, 0, blk.length) }
    out.write(0); out.write(0x3B)
    out.toByteArray
  }

  test("GIF pixel decode is real: LZW dictionary growth, KwK case, exact round-trip") {
    import graft.operators.MediaCodecs
    val pal = Array[Byte](0, 0, 0, -1, -1, -1, -1, 0, 0, 0, 0, -1) // black white red blue
    // alternating 0101… pattern forces the KwK (cScSc) code path
    val gif = makeGif(8, 8, pal, minCode = 2)((x, y) => (x + y) % 2)
    val (w, h, rgb) = MediaCodecs.gifDecode(gif).get
    assert(w == 8 && h == 8)
    for (y <- 0 until 8; x <- 0 until 8) {
      val expect = if ((x + y) % 2 == 0) 0 else 255
      val o = (y * 8 + x) * 3
      assert((rgb(o) & 0xFF) == expect && (rgb(o + 1) & 0xFF) == expect, s"pixel ($x,$y)")
    }
    // long repeated runs exercise multi-byte dictionary chains + width growth
    val runs = makeGif(64, 32, pal, minCode = 2)((x, y) => (y / 4) % 4)
    val (_, _, rpix) = MediaCodecs.gifDecode(runs).get
    for (y <- 0 until 32 by 4) {
      val o = (y * 64 + 17) * 3 // spot-check a mid-row pixel per stripe
      val expect = Seq((0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 0, 255))((y / 4) % 4)
      assert(((rpix(o) & 0xFF, rpix(o + 1) & 0xFF, rpix(o + 2) & 0xFF)) == expect, s"row $y")
    }
    val hist = MediaCodecs.gifLuminanceHistogram(gif).get
    assert(math.abs(hist(0) - 0.5f) < 1e-6 && math.abs(hist(7) - 0.5f) < 1e-6)
  }

  test("GIF interlace, frame offset composite onto background, truncation") {
    import graft.operators.MediaCodecs
    val pal = Array[Byte](0, 0, 0, -1, -1, -1, -1, 0, 0, 0, 0, -1)
    // interlaced: row color cycles by palette index; decode must restore order
    val inter = makeGif(8, 8, pal, minCode = 2, interlaced = true)((_, y) => y % 4)
    val (_, _, ipix) = MediaCodecs.gifDecode(inter).get
    for (y <- 0 until 8) {
      val expect = Seq((0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 0, 255))(y % 4)
      val o = (y * 8 + 3) * 3
      assert(((ipix(o) & 0xFF, ipix(o + 1) & 0xFF, ipix(o + 2) & 0xFF)) == expect, s"row $y")
    }
    // 4×4 white frame at (2,2) on an 8×8 screen with red background
    val framed = makeGif(8, 8, pal, minCode = 2, fx = 2, fy = 2, fw = 4, fh = 4, bg = 2)(
      (_, _) => 1)
    val (_, _, fpix) = MediaCodecs.gifDecode(framed).get
    assert((fpix(0) & 0xFF) == 255 && (fpix(1) & 0xFF) == 0)   // outside: red bg
    val inside = ((3 * 8) + 3) * 3
    assert((fpix(inside) & 0xFF) == 255 && (fpix(inside + 1) & 0xFF) == 255)
    // truncated LZW data → None, no throw
    val gif = makeGif(8, 8, pal, minCode = 2)((x, _) => x % 2)
    assert(MediaCodecs.gifDecode(gif.dropRight(8)).isEmpty)
  }

  // IMA ADPCM tables, duplicated here so the test encoder is independent
  private val imaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190, 209, 230,
    253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724, 796, 876, 963,
    1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
    3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794,
    32767)
  private val imaIdx: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Reference IMA ADPCM encoder (quantize against the step table, track
    * the decoder's reconstruction) — the decoder must track it to RMS
    * fidelity on a real signal.
    */
  private def imaEncode(samples: Array[Short], blockAlign: Int): Array[Byte] = {
    val spb = (blockAlign - 4) * 2 + 1
    val nBlocks = (samples.length + spb - 1) / spb
    val out = new Array[Byte](nBlocks * blockAlign)
    var index = 0
    var s = 0
    for (blk <- 0 until nBlocks) {
      val base = blk * blockAlign
      var predictor: Int = if (s < samples.length) samples(s) else 0
      out(base) = predictor.toByte; out(base + 1) = (predictor >> 8).toByte
      out(base + 2) = index.toByte
      s += 1 // the header carries the block's first sample verbatim
      var i = base + 4
      var half = 0
      var cur = 0
      while (i < base + blockAlign) {
        val target: Int = if (s < samples.length) samples(s) else 0
        s += 1
        val step = imaStep(index)
        var diff = target - predictor
        var nib = 0
        if (diff < 0) { nib = 8; diff = -diff }
        var st = step
        if (diff >= st) { nib |= 4; diff -= st }
        st >>= 1
        if (diff >= st) { nib |= 2; diff -= st }
        st >>= 1
        if (diff >= st) nib |= 1
        var d2 = step >> 3
        if ((nib & 1) != 0) d2 += step >> 2
        if ((nib & 2) != 0) d2 += step >> 1
        if ((nib & 4) != 0) d2 += step
        predictor = if ((nib & 8) != 0) predictor - d2 else predictor + d2
        predictor = math.max(-32768, math.min(32767, predictor))
        index = math.max(0, math.min(88, index + imaIdx(nib & 7)))
        if (half == 0) { cur = nib; half = 1 }
        else { out(i) = (cur | (nib << 4)).toByte; half = 0; i += 1 }
      }
    }
    out
  }

  /** Mono IMA ADPCM WAV container (format 0x11, fmt cbSize 2 + samplesPerBlock). */
  private def makeAdpcmWav(rate: Int, samples: Array[Short], blockAlign: Int): Array[Byte] = {
    val spb = (blockAlign - 4) * 2 + 1
    val data = imaEncode(samples, blockAlign)
    val out = new Array[Byte](12 + 28 + 8 + data.length)
    def tag(i: Int, s: String): Unit = (0 until 4).foreach(k => out(i + k) = s(k).toByte)
    def le32(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte }
    def le16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
    tag(0, "RIFF"); le32(4, out.length - 8); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 20); le16(20, 0x11); le16(22, 1); le32(24, rate)
    le32(28, rate * blockAlign / spb); le16(32, blockAlign); le16(34, 4)
    le16(36, 2); le16(38, spb)
    tag(40, "data"); le32(44, data.length)
    System.arraycopy(data, 0, out, 48, data.length)
    out
  }

  test("IMA ADPCM decode: hand-checked step math and encoder round-trip RMS") {
    import graft.operators.MediaCodecs
    // hand vector: predictor 0, index 0 (step 7); nibble 4 → +7 (index→2,
    // step 9), nibble 0 → +1 — decoded must start 0, 7, 8
    val block = Array[Byte](0, 0, 0, 0, 0x04, 0, 0, 0, 0, 0, 0, 0)
    val pcm = MediaCodecs.imaAdpcmDecode(block, 0, 12, 12, 17)
    assert(pcm.take(3).toSeq == Seq[Short](0, 7, 8))
    // full-file round-trip: constant half-scale signal, 16 blocks
    val spb = (256 - 4) * 2 + 1
    val samples = Array.fill[Short](16 * spb)(16384)
    val wav = makeAdpcmWav(8000, samples, 256)
    val info = MediaCodecs.wavInfo(wav).get
    assert(info.sampleRate == 8000 && info.channels == 1 && info.bitsPerSample == 4)
    assert(info.durationMs == samples.length * 1000L / 8000)
    // ADPCM is lossy but adapts within a few samples; every RMS segment of
    // a constant signal must sit tight on 0.5
    assert(info.rmsEnvelope.forall(v => math.abs(v - 0.5f) < 0.02f), info.rmsEnvelope.toSeq)
  }

  /** `frames` MPEG1 Layer III frames (64 kbps / 32 kHz / mono → 288 bytes,
    * 36 ms each), optionally behind an ID3v2 tag of `id3Pad` content bytes.
    */
  private def makeMp3(frames: Int, id3Pad: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (id3Pad > 0) {
      out.write(Array[Byte]('I', 'D', '3', 4, 0, 0))
      // sync-safe size
      out.write((id3Pad >> 21) & 0x7F); out.write((id3Pad >> 14) & 0x7F)
      out.write((id3Pad >> 7) & 0x7F); out.write(id3Pad & 0x7F)
      (0 until id3Pad).foreach(_ => out.write(0xFF)) // worst case: tag full of syncs
    }
    for (_ <- 0 until frames) {
      out.write(0xFF); out.write(0xFB); out.write(0x58); out.write(0xC0)
      (4 until 288).foreach(_ => out.write(0x22))
    }
    out.toByteArray
  }

  private def makeFlac(rate: Int, channels: Int, totalSamples: Long): Array[Byte] = {
    val out = new Array[Byte](8 + 34)
    "fLaC".getBytes("ISO-8859-1").copyToArray(out)
    out(4) = 0x80.toByte; out(7) = 34
    out(8 + 10) = (rate >> 12).toByte
    out(8 + 11) = ((rate >> 4) & 0xFF).toByte
    out(8 + 12) = (((rate & 0xF) << 4) | ((channels - 1) << 1) | (15 >> 4)).toByte
    out(8 + 13) = ((15 << 4) | ((totalSamples >> 32) & 0xF)).toInt.toByte
    (0 until 4).foreach(k => out(8 + 14 + k) = ((totalSamples >> (8 * (3 - k))) & 0xFF).toByte)
    out
  }

  private def makeOgg(rate: Int, channels: Int, granule: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def page(typ: Int, g: Long, seq: Int, payload: Array[Byte]): Unit = {
      out.write("OggS".getBytes("ISO-8859-1")); out.write(0); out.write(typ)
      (0 until 8).foreach(k => out.write(((g >> (8 * k)) & 0xFF).toInt))
      (0 until 4).foreach(_ => out.write(7))
      (0 until 4).foreach(k => out.write((seq >> (8 * k)) & 0xFF))
      (0 until 4).foreach(_ => out.write(0))
      out.write(1); out.write(payload.length); out.write(payload)
    }
    val id = new java.io.ByteArrayOutputStream()
    id.write(1); id.write("vorbis".getBytes("ISO-8859-1"))
    (0 until 4).foreach(_ => id.write(0))
    id.write(channels)
    (0 until 4).foreach(k => id.write((rate >> (8 * k)) & 0xFF))
    (0 until 12).foreach(_ => id.write(0))
    id.write(0x66); id.write(1)
    page(0x02, 0L, 0, id.toByteArray)
    page(0x00, granule / 2, 1, Array[Byte](0)) // mid page: granule must not win
    page(0x04, granule, 2, Array[Byte](0))
    out.toByteArray
  }

  private def makeG711Wav(ulaw: Boolean, rate: Int, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](44 + data.length)
    def tag(i: Int, s: String): Unit = (0 until 4).foreach(k => out(i + k) = s(k).toByte)
    def le32(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte }
    def le16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
    tag(0, "RIFF"); le32(4, 36 + data.length); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, if (ulaw) 7 else 6); le16(22, 1)
    le32(24, rate); le32(28, rate); le16(32, 1); le16(34, 8)
    tag(36, "data"); le32(40, data.length)
    System.arraycopy(data, 0, out, 44, data.length)
    out
  }

  test("G.711 μ-law/A-law: spec expansion vectors and WAV envelope") {
    import graft.operators.MediaCodecs
    // CCITT G.711 reference vectors: μ-law 0x00 → -32124, 0x80 → +32124,
    // 0xFF → 0; A-law 0x55 → -8, 0xAA → +32256, 0xD5 → +8
    assert(MediaCodecs.ulawToPcm(0x00) == -32124)
    assert(MediaCodecs.ulawToPcm(0x80) == 32124)
    assert(MediaCodecs.ulawToPcm(0xFF) == 0)
    assert(MediaCodecs.alawToPcm(0x55) == -8)
    assert(MediaCodecs.alawToPcm(0xAA) == 32256)
    assert(MediaCodecs.alawToPcm(0xD5) == 8)
    val u = MediaCodecs.wavInfo(makeG711Wav(ulaw = true, 8000, Array.fill(4000)(0x80.toByte))).get
    assert(u.sampleRate == 8000 && u.bitsPerSample == 8 && u.durationMs == 500)
    assert(u.rmsEnvelope.forall(v => math.abs(v - 32124f / 32768f) < 1e-6))
    val a = MediaCodecs.wavInfo(makeG711Wav(ulaw = false, 8000, Array.fill(8000)(0xAA.toByte))).get
    assert(a.durationMs == 1000 && a.rmsEnvelope.forall(v => math.abs(v - 32256f / 32768f) < 1e-6))
  }

  test("MP3/FLAC/Ogg stream metadata: frame walk, STREAMINFO, granules") {
    import graft.operators.MediaCodecs
    // MP3: ID3v2 skipped even when the tag body is full of 0xFF sync bytes;
    // 25 × 1152/32000 s = 900 ms exactly
    val mp3 = MediaCodecs.mp3Info(makeMp3(25, id3Pad = 64)).get
    assert(mp3.format == "mp3" && mp3.sampleRate == 32000 && mp3.channels == 1)
    assert(mp3.frames == 25 && mp3.durationMs == 900)
    // truncated final frame: walk reports only the complete frames
    assert(MediaCodecs.mp3Info(makeMp3(3).dropRight(10)).get.frames == 2)
    // a lone sync in garbage must NOT parse (two chained frames required)
    assert(MediaCodecs.mp3Info(Array[Byte](0xFF.toByte, 0xFB.toByte, 0x58, 0xC0.toByte) ++
      Array.fill(300)(0x00.toByte)).isEmpty)
    val flac = MediaCodecs.flacInfo(makeFlac(48000, 2, 96000L)).get
    assert(flac.sampleRate == 48000 && flac.channels == 2 && flac.durationMs == 2000)
    val ogg = MediaCodecs.oggVorbisInfo(makeOgg(16000, 1, 8000L)).get
    assert(ogg.sampleRate == 16000 && ogg.channels == 1 && ogg.durationMs == 500)
    // dispatcher routes each format
    assert(MediaCodecs.audioStreamInfo(makeMp3(2)).exists(_.format == "mp3"))
    assert(MediaCodecs.audioStreamInfo(makeFlac(44100, 1, 44100L)).exists(_.format == "flac"))
    assert(MediaCodecs.audioStreamInfo(makeOgg(8000, 2, 4000L)).exists(_.format == "ogg"))
    assert(MediaCodecs.audioStreamInfo(Array.fill(64)(0x33.toByte)).isEmpty)
  }

  test("FLAC payload decode: full fixture PCM, every subframe family, exact RMS") {
    import graft.operators.MediaCodecs
    // the bit-built 24-frame fixture: constant / LPC / fixed+Rice2 /
    // mid-side frames, stereo 48 kHz, all samples ±16384
    val (info, frames) = MediaCodecs.flacDecodeInfo(SparkEntry.fixtureFlac()).get
    assert(frames == 24)
    assert(info.sampleRate == 48000 && info.channels == 2 && info.bitsPerSample == 16)
    assert(info.durationMs == 2000)
    info.rmsEnvelope.foreach(v => assert(v == 0.5f, s"env $v != 0.5"))
    val pcm = MediaCodecs.flacDecodePcm(SparkEntry.fixtureFlac()).get
    assert(pcm.samples.length == 96000 * 2)
    assert(pcm.samples.forall(s => s == 16384 || s == -16384))
    // frame 22 (fixed+Rice2) region: alternating square, both channels
    val f22 = 22 * 4096 * 2
    assert(pcm.samples(f22) == 16384 && pcm.samples(f22 + 2) == -16384)
    // STREAMINFO-only stream (no frames) must NOT decode — it falls back
    // to the metadata path, which still reports rate/duration
    assert(MediaCodecs.flacDecodePcm(makeFlac(48000, 2, 96000L)).isEmpty)
  }

  test("FLAC decode: verbatim subframes, escape partitions, wasted bits") {
    import graft.operators.MediaCodecs
    // mono 8 kHz 16-bit, one 192-sample frame, hand-packed
    final class FW {
      val bb = new java.io.ByteArrayOutputStream()
      private var cur = 0; private var cnt = 0
      def put(v: Long, n: Int): Unit = {
        var i = n - 1
        while (i >= 0) {
          cur = (cur << 1) | ((v >> i) & 1L).toInt; cnt += 1
          if (cnt == 8) { bb.write(cur); cur = 0; cnt = 0 }
          i -= 1
        }
      }
      def bytes: Array[Byte] = { if (cnt > 0) put(0, 8 - cnt); bb.toByteArray }
    }
    def stream(total: Long)(body: FW => Unit): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("fLaC".getBytes("ISO-8859-1"))
      out.write(Array[Byte](0x80.toByte, 0, 0, 34))
      val si = new Array[Byte](34)
      si(0) = 0x00; si(1) = 0xC0.toByte; si(2) = 0x00; si(3) = 0xC0.toByte // block 192
      si(10) = 0x01; si(11) = 0xF4.toByte; si(12) = 0x00 // rate 8000, 1 ch
      si(13) = 0x70 // 16 bps
      (0 until 4).foreach(k => si(14 + k) = ((total >> (8 * (3 - k))) & 0xFF).toByte)
      out.write(si)
      val w = new FW
      w.put(0xFFF8L, 16); w.put(1, 4); w.put(0, 4)      // sync, block 192, rate SI
      w.put(0, 4); w.put(4, 3); w.put(0, 1)             // mono, 16-bit
      w.put(0, 8)                                        // frame 0
      val hdr = w.bytes
      out.write(hdr)
      var c8 = 0
      hdr.foreach { x => c8 ^= x & 0xFF; (0 until 8).foreach(_ =>
        c8 = if ((c8 & 0x80) != 0) ((c8 << 1) ^ 0x07) & 0xFF else (c8 << 1) & 0xFF) }
      out.write(c8)
      val pw = new FW
      body(pw)
      out.write(pw.bytes)
      out.write(0); out.write(0)                         // CRC-16 (not validated)
      out.toByteArray
    }
    // VERBATIM: 192 explicit samples 0..191
    val verb = stream(192) { w =>
      w.put(0, 1); w.put(1, 6); w.put(0, 1)
      (0 until 192).foreach(i => w.put(i.toLong, 16))
    }
    val vp = MediaCodecs.flacDecodePcm(verb).get
    assert(vp.samples.toSeq == (0 until 192))
    // FIXED order 0 with an ESCAPE partition (raw 9-bit residuals ±200)
    val esc = stream(192) { w =>
      w.put(0, 1); w.put(8, 6); w.put(0, 1)              // fixed order 0
      w.put(0, 2); w.put(0, 4)                           // method 00, po 0
      w.put(15, 4)                                       // param 15 = escape
      w.put(9, 5)                                        // raw width 9
      (0 until 192).foreach(i => w.put((if (i % 2 == 0) 200L else -200L) & 0x1FF, 9))
    }
    val ep = MediaCodecs.flacDecodePcm(esc).get
    assert(ep.samples.forall(s => s == 200 || s == -200))
    assert(ep.samples(0) == 200 && ep.samples(1) == -200)
    // CONSTANT with wasted bits: k=3, stored value 100 → sample 800
    val wast = stream(192) { w =>
      w.put(0, 1); w.put(0, 6); w.put(1, 1)              // constant, wasted flag
      w.put(0, 2); w.put(1, 1)                           // unary 2 ⇒ k=3
      w.put(100, 13)                                     // 16-3 bits
    }
    val wp = MediaCodecs.flacDecodePcm(wast).get
    assert(wp.samples.forall(_ == 800))
  }

  test("FLAC decode: random-PCM verbatim round-trip; fixed order-2 with 4 Rice partitions") {
    import graft.operators.MediaCodecs
    final class FW {
      val bb = new java.io.ByteArrayOutputStream()
      private var cur = 0; private var cnt = 0
      def put(v: Long, n: Int): Unit = {
        var i = n - 1
        while (i >= 0) {
          cur = (cur << 1) | ((v >> i) & 1L).toInt; cnt += 1
          if (cnt == 8) { bb.write(cur); cur = 0; cnt = 0 }
          i -= 1
        }
      }
      def bytes: Array[Byte] = { if (cnt > 0) put(0, 8 - cnt); bb.toByteArray }
    }
    def stream(total: Long)(body: FW => Unit): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("fLaC".getBytes("ISO-8859-1"))
      out.write(Array[Byte](0x80.toByte, 0, 0, 34))
      val si = new Array[Byte](34)
      si(0) = 0x00; si(1) = 0xC0.toByte; si(2) = 0x00; si(3) = 0xC0.toByte
      si(10) = 0x01; si(11) = 0xF4.toByte; si(12) = 0x00
      si(13) = 0x70
      (0 until 4).foreach(k => si(14 + k) = ((total >> (8 * (3 - k))) & 0xFF).toByte)
      out.write(si)
      val w = new FW
      w.put(0xFFF8L, 16); w.put(1, 4); w.put(0, 4)
      w.put(0, 4); w.put(4, 3); w.put(0, 1)
      w.put(0, 8)
      val hdr = w.bytes
      out.write(hdr)
      var c8 = 0
      hdr.foreach { x => c8 ^= x & 0xFF; (0 until 8).foreach(_ =>
        c8 = if ((c8 & 0x80) != 0) ((c8 << 1) ^ 0x07) & 0xFF else (c8 << 1) & 0xFF) }
      out.write(c8)
      val pw = new FW
      body(pw)
      out.write(pw.bytes)
      out.write(0); out.write(0)
      out.toByteArray
    }
    // property: ANY 16-bit PCM survives a verbatim encode→decode bit-exactly
    val rnd = new scala.util.Random(0x74AC5EEDL)
    (0 until 10).foreach { trial =>
      val pcm = Array.fill(192)((rnd.nextInt(65536) - 32768).toShort)
      val bytes = stream(192) { w =>
        w.put(0, 1); w.put(1, 6); w.put(0, 1)
        pcm.foreach(s => w.put(s.toLong & 0xFFFF, 16))
      }
      val got = MediaCodecs.flacDecodePcm(bytes)
        .getOrElse(fail(s"trial $trial failed to decode"))
      assert(got.samples.toSeq == pcm.map(_.toInt).toSeq, s"trial $trial mismatch")
    }
    // fixed order 2 over a linear ramp: residuals are all zero, encoded
    // through FOUR Rice method-0 partitions (partition order 2) with
    // param 0 — exercises the multi-partition walk and the
    // first-partition-minus-order accounting
    val ramp = stream(192) { w =>
      w.put(0, 1); w.put(10, 6); w.put(0, 1)      // fixed order 2
      w.put(0, 16); w.put(1, 16)                   // warmup s0=0, s1=1
      w.put(0, 2); w.put(2, 4)                     // method 00, po 2
      (0 until 4).foreach { part =>
        w.put(0, 4)                                // rice param 0
        val n = if (part == 0) 48 - 2 else 48
        (0 until n).foreach(_ => w.put(1, 1))      // quotient 0 ⇒ lone stop bit
      }
    }
    val rp = MediaCodecs.flacDecodePcm(ramp).get
    assert(rp.samples.toSeq == (0 until 192), "order-2 ramp mismatch")
  }

  test("binary parsers never throw on corrupt input (fuzz: random + mutated + truncated)") {
    import graft.operators.MediaCodecs
    // at corpus scale the decode stage WILL see garbage; every parser must
    // return None/empty, never raise
    val parsers: Seq[(String, Array[Byte] => Any)] = Seq(
      "imageDims" -> (b => MediaCodecs.imageDims(b)),
      "jpegDecode" -> (b => MediaCodecs.jpegDecode(b)),
      "pngDecode" -> (b => MediaCodecs.pngDecode(b)),
      "gifDecode" -> (b => MediaCodecs.gifDecode(b)),
      "wavInfo" -> (b => MediaCodecs.wavInfo(b)),
      "mp4FrameCount" -> (b => MediaCodecs.mp4FrameCount(b)),
      "bmpHist" -> (b => MediaCodecs.bmpLuminanceHistogram(b)),
      "audioStreamInfo" -> (b => MediaCodecs.audioStreamInfo(b)),
      "flacDecodePcm" -> (b => MediaCodecs.flacDecodePcm(b)))
    val pal = Array[Byte](0, 0, 0, -1, -1, -1, -1, 0, 0, 0, 0, -1)
    val seeds: Seq[Array[Byte]] = Seq(
      makeJpeg(16, 8, Seq((1, 1, 1)))((m, _, _, _) => if (m == 0) 0 else 128),
      makeJpeg(16, 16, Seq((1, 2, 2), (2, 1, 1), (3, 1, 1)))((_, _, _, _) => 100),
      { // progressive: mutations hit the multi-scan/table-id/EOB-run guards
        val out = progHeader(8, 8, Seq((1, 1, 1)))
        sosHeader(out, Seq(1), 0, 0, 0, 1)
        val b1 = new JBits; putDcValue(b1, -512); out.write(b1.bytes)
        sosHeader(out, Seq(1), 1, 63, 0, 0)
        val b2 = new JBits; b2.put(0, 3); out.write(b2.bytes)
        out.write(0xFF); out.write(0xD9)
        out.toByteArray
      },
      makeGif(8, 8, pal, minCode = 2)((x, y) => (x + y) % 2),
      makePng(8, 8, 0, null)((x, _) => Array(if (x < 4) 0 else 255)),
      makeBmp(8, 8)((_, _) => (10, 20, 30)),
      makeWav(8000, Array.fill(100)(16384.toShort)),
      makeAdpcmWav(8000, Array.fill(509)(1000.toShort), 256),
      makeG711Wav(ulaw = true, 8000, Array.fill(100)(0x80.toByte)),
      makeMp3(2, id3Pad = 16),
      makeFlac(48000, 2, 96000L),
      SparkEntry.fixtureFlac(),
      makeOgg(16000, 1, 8000L),
      makeMp4(Seq(24)))
    val rnd = new scala.util.Random(20260813L)
    def check(label: String, bytes: Array[Byte]): Unit =
      parsers.foreach { case (name, p) =>
        try p(bytes)
        catch { case e: Throwable =>
          fail(s"$name threw ${e.getClass.getSimpleName} on $label: ${e.getMessage}")
        }
      }
    for (i <- 0 until 300) check(s"random#$i",
      Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte))
    for ((seed, si) <- seeds.zipWithIndex) {
      for (m <- 0 until 120) { // single-byte mutations keep headers plausible
        val mut = seed.clone()
        mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
        check(s"seed$si/mut#$m", mut)
      }
      for (t <- 0 until 20) check(s"seed$si/trunc#$t",
        seed.take(rnd.nextInt(seed.length)))
    }
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

  test("streaming raw-WARC ingestion: shards land, envelopes split, HTML extracts") {
    import graft.sources.Warc
    val dir = tmp("warc_stream")
    new java.io.File(dir).mkdirs()
    def member(uri: String, html: String): Array[Byte] = {
      val payload = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$html"
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${payload.getBytes("UTF-8").length}\r\n\r\n$payload\r\n")
        .getBytes("UTF-8")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/shard1.warc"),
      member("https://s/1", "<p>first shard</p>"))
    val extracted = Warc.readWarcResponsesStream(spark, s"$dir/*")
      .filter(col("http_status") === 200 && col("content_type") === "text/html")
      .select(col("target_uri"),
        graft.functions.Html.htmlToText(col("body")).as("text"))
    assert(extracted.isStreaming)
    val q = extracted.writeStream.format("memory").queryName("warcstream").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT text FROM warcstream ORDER BY target_uri")
        .as[String].collect().toSeq == Seq("first shard"))
      // a second shard lands -> exactly one new micro-batch row
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/shard2.warc"),
        member("https://s/2", "<p>second shard</p>"))
      q.processAllAvailable()
      assert(spark.sql("SELECT text FROM warcstream ORDER BY target_uri")
        .as[String].collect().toSeq == Seq("first shard", "second shard"))
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
