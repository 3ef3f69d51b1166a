package graft.operators

/** Dependency-free media parsing for the multimodal decode stage. These are
  * REAL parsers for the container-free subset — everything a byte scan can
  * do without codec libraries (none are installable in this environment):
  *
  *  - image DIMENSIONS from PNG/GIF/BMP/JPEG headers (no pixel decode needed);
  *  - full pixel decode + nearest-neighbor RESIZE for uncompressed 24-bit BMP;
  *  - full PNG pixel decode (zlib IDAT inflate via java.util.zip + all five
  *    scanline filters, gray/RGB/palette/alpha at bit depth 8);
  *  - PCM WAV: sample rate / channels / duration + an 8-segment RMS envelope
  *    (a real audio feature, not a hash);
  *  - MP4: frame count of the video track from the `stts` box sums.
  *
  * Entropy-coded pixel/sample data (JPEG huffman decode, MP3 frames, H.264)
  * still falls back to `Multimodal.decodeStub` — that boundary is the honest
  * stub; everything here is exercised against hand-built fixtures.
  */
object MediaCodecs {

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) | ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  // ------------------------------------------------------------------
  // Image dimensions (header-only, all common formats)
  // ------------------------------------------------------------------

  /** (width, height) from PNG / GIF / BMP / JPEG headers. */
  def imageDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length >= 24 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      Some((be32(b, 16), be32(b, 20)))                       // IHDR
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      Some((le16(b, 6), le16(b, 8)))                         // logical screen
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      Some((le32(b, 18), math.abs(le32(b, 22))))             // BITMAPINFOHEADER
    else if (b.length >= 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8)
      jpegDims(b)
    else None
  }

  private def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    // walk [FF marker][len_be16 payload] segments to the first SOFn
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xFF) != 0xFF) return None
      val marker = b(i + 1) & 0xFF
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) i += 2 // no payload
      else {
        val len = be16(b, i + 2)
        val isSof = (marker >= 0xC0 && marker <= 0xCF) &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          if (i + 9 >= b.length) return None
          return Some((be16(b, i + 7), be16(b, i + 5)))      // [prec][h][w]
        }
        i += 2 + len
      }
    }
    None
  }

  // ------------------------------------------------------------------
  // Uncompressed 24-bit BMP: pixel decode, luminance feature, resize
  // ------------------------------------------------------------------

  private case class Bmp(w: Int, h: Int, dataOffset: Int, rowStride: Int, topDown: Boolean)

  private def bmp24(b: Array[Byte]): Option[Bmp] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (bpp != 24 || compression != 0) return None          // BI_RGB only
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val stride = ((w * 3 + 3) / 4) * 4                      // rows pad to 4 bytes
    val bmp = Bmp(w, math.abs(hRaw), le32(b, 10), stride, hRaw < 0)
    if (bmp.dataOffset + bmp.rowStride.toLong * bmp.h > b.length) None else Some(bmp)
  }

  private def pixelOffset(m: Bmp, x: Int, y: Int): Int = {
    val row = if (m.topDown) y else m.h - 1 - y
    m.dataOffset + row * m.rowStride + x * 3
  }

  /** Normalized 8-bin luminance histogram of a 24-bit BMP — a real image
    * feature from real pixels.
    */
  def bmpLuminanceHistogram(b: Array[Byte]): Option[Array[Float]] =
    bmp24(b).map { m =>
      val bins = new Array[Float](8)
      var y = 0
      while (y < m.h) {
        var x = 0
        while (x < m.w) {
          val o = pixelOffset(m, x, y)
          val lum = (((b(o + 2) & 0xFF) * 299 + (b(o + 1) & 0xFF) * 587 + (b(o) & 0xFF) * 114) / 1000)
          bins(math.min(lum >> 5, 7)) += 1f
          x += 1
        }
        y += 1
      }
      val n = (m.w * m.h).toFloat
      if (n > 0) { var i = 0; while (i < 8) { bins(i) /= n; i += 1 } }
      bins
    }

  /** Nearest-neighbor resize of a 24-bit BMP to (newW, newH), emitted as a
    * new bottom-up BMP. A real image transform, no libraries.
    */
  def bmpResize(b: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] =
    bmp24(b).map { m =>
      val outStride = ((newW * 3 + 3) / 4) * 4
      val dataSize = outStride * newH
      val out = new Array[Byte](54 + dataSize)
      out(0) = 'B'; out(1) = 'M'
      def putLe32(i: Int, v: Int): Unit = {
        out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
        out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
      }
      def putLe16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
      putLe32(2, 54 + dataSize); putLe32(10, 54)
      putLe32(14, 40); putLe32(18, newW); putLe32(22, newH)
      putLe16(26, 1); putLe16(28, 24); putLe32(34, dataSize)
      var y = 0
      while (y < newH) {
        val sy = math.min((y.toLong * m.h / newH).toInt, m.h - 1)
        var x = 0
        while (x < newW) {
          val sx = math.min((x.toLong * m.w / newW).toInt, m.w - 1)
          val src = pixelOffset(m, sx, sy)
          val dst = 54 + (newH - 1 - y) * outStride + x * 3
          out(dst) = b(src); out(dst + 1) = b(src + 1); out(dst + 2) = b(src + 2)
          x += 1
        }
        y += 1
      }
      out
    }

  // ------------------------------------------------------------------
  // PNG: full pixel decode (deflate is in the JDK — no codec library)
  // ------------------------------------------------------------------

  /** Decode a non-interlaced bit-depth-8 PNG (color types 0 gray, 2 RGB,
    * 3 palette, 4 gray+alpha, 6 RGBA) to (width, height, top-down row-major
    * RGB triplets): concatenate IDAT chunks, inflate (java.util.zip), undo
    * the per-scanline filter (None/Sub/Up/Average/Paeth — RFC 2083 §6), and
    * expand samples to RGB (alpha dropped — features below are luminance).
    * Interlaced, 1/2/4/16-bit, or malformed input → None (dims still come
    * from `imageDims`; feature falls back to the stub).
    */
  def pngDecode(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (!(b.length >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'))
      return None
    var i = 8
    var w = 0; var h = 0; var bitDepth = 0; var colorType = -1; var interlace = 0
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    while (i + 8 <= b.length) {
      val len = be32(b, i)
      if (len < 0 || i + 12 + len > b.length) { i = b.length } // truncated: stop
      else {
        val typ = new String(b, i + 4, 4, "ISO-8859-1")
        typ match {
          case "IHDR" if len >= 13 =>
            w = be32(b, i + 8); h = be32(b, i + 12)
            bitDepth = b(i + 16) & 0xFF; colorType = b(i + 17) & 0xFF
            interlace = b(i + 20) & 0xFF
          case "PLTE" => palette = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
          case "IDAT" => idat.write(b, i + 8, len)
          case _ => ()
        }
        i += 12 + len                                        // len + type + payload + crc
      }
    }
    if (w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0) return None
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    if (colorType == 3 && palette == null) return None
    val stride = w * channels
    // guard against dimension bombs before allocating (64 MP cap ≈ 192 MB
    // RGB — one task's worth, not a corrupted-header multi-GB allocation)
    if (w.toLong * h > 64L * 1024 * 1024) return None
    val raw = new Array[Byte]((stride + 1) * h)
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var off = 0
      while (!inf.finished() && off < raw.length) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) {
          inf.end(); return None                             // truncated stream
        }
        off += n
      }
      inf.end()
      if (off < raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    // defilter in place into the reconstructed sample plane
    val px = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val f = raw(y * (stride + 1)) & 0xFF
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val v = raw(rowIn + x) & 0xFF
        val a = if (x >= channels) px(rowOut + x - channels) & 0xFF else 0
        val up = if (y > 0) px(rowOut - stride + x) & 0xFF else 0
        val c = if (x >= channels && y > 0) px(rowOut - stride + x - channels) & 0xFF else 0
        val recon = f match {
          case 0 => v
          case 1 => v + a
          case 2 => v + up
          case 3 => v + ((a + up) >> 1)
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
            v + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
          case _ => return None                              // invalid filter id
        }
        px(rowOut + x) = (recon & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    // expand to RGB
    val rgb = new Array[Byte](w * h * 3)
    var s = 0; var d = 0
    while (s < px.length) {
      colorType match {
        case 0 | 4 =>                                        // gray (+alpha)
          val g = px(s); rgb(d) = g; rgb(d + 1) = g; rgb(d + 2) = g
        case 2 | 6 =>                                        // RGB(+alpha)
          rgb(d) = px(s); rgb(d + 1) = px(s + 1); rgb(d + 2) = px(s + 2)
        case 3 =>                                            // palette index
          val pi = (px(s) & 0xFF) * 3
          if (pi + 2 >= palette.length) return None
          rgb(d) = palette(pi); rgb(d + 1) = palette(pi + 1); rgb(d + 2) = palette(pi + 2)
      }
      s += channels; d += 3
    }
    Some((w, h, rgb))
  }

  /** Normalized 8-bin luminance histogram from REAL PNG pixels — same
    * feature contract as `bmpLuminanceHistogram`.
    */
  def pngLuminanceHistogram(b: Array[Byte]): Option[Array[Float]] =
    pngDecode(b).map { case (w, h, rgb) =>
      val bins = new Array[Float](8)
      var o = 0
      while (o < rgb.length) {
        val lum = ((rgb(o) & 0xFF) * 299 + (rgb(o + 1) & 0xFF) * 587 + (rgb(o + 2) & 0xFF) * 114) / 1000
        bins(math.min(lum >> 5, 7)) += 1f
        o += 3
      }
      val n = (w * h).toFloat
      if (n > 0) { var i = 0; while (i < 8) { bins(i) /= n; i += 1 } }
      bins
    }

  // ------------------------------------------------------------------
  // PCM WAV
  // ------------------------------------------------------------------

  case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
                     durationMs: Long, rmsEnvelope: Array[Float])

  /** Parse a RIFF/WAVE file; for 16-bit PCM also compute an 8-segment RMS
    * envelope (normalized to [0,1]) — a real audio feature.
    */
  def wavInfo(b: Array[Byte]): Option[WavInfo] = {
    def tag(i: Int, t: String): Boolean =
      i + 4 <= b.length && b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3)
    if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None            // audioFormat, ch, rate, bits
    var data: Option[(Int, Int)] = None                     // offset, length
    var corrupt = false
    while (!corrupt && i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (size < 0) corrupt = true // malformed chunk size: stop, don't loop
      else {
        if (tag(i, "fmt ") && i + 24 <= b.length)
          fmt = Some((le16(b, i + 8), le16(b, i + 10), le32(b, i + 12), le16(b, i + 22)))
        else if (tag(i, "data"))
          data = Some((i + 8, math.min(size, b.length - i - 8)))
        i += 8 + size + (size & 1)                          // chunks pad to even
      }
    }
    for ((af, ch, rate, bits) <- fmt; (off, len) <- data
         if af == 1 && ch > 0 && rate > 0 && bits > 0) yield {
      val bytesPerSec = rate.toLong * ch * bits / 8
      val durationMs = if (bytesPerSec > 0) len * 1000L / bytesPerSec else 0L
      val env = new Array[Float](8)
      if (bits == 16) {
        val nSamples = len / 2
        if (nSamples > 0) {
          val seg = math.max(nSamples / 8, 1)
          val sums = new Array[Double](8)
          val counts = new Array[Int](8)
          var s = 0
          while (s < nSamples) {
            val v = (le16(b, off + s * 2).toShort).toDouble / 32768.0
            val k = math.min(s / seg, 7)
            sums(k) += v * v; counts(k) += 1
            s += 1
          }
          var k = 0
          while (k < 8) {
            env(k) = if (counts(k) > 0) math.sqrt(sums(k) / counts(k)).toFloat else 0f
            k += 1
          }
        }
      }
      WavInfo(rate, ch, bits, durationMs, env)
    }
  }

  // ------------------------------------------------------------------
  // MP4: video-track frame count from stts
  // ------------------------------------------------------------------

  /** Sum of `stts` sample counts of the first track whose handler is 'vide'
    * — the real frame count of a (non-fragmented) MP4.
    */
  def mp4FrameCount(b: Array[Byte]): Option[Int] = {
    def boxes(lo: Int, hi: Int): Iterator[(String, Int, Int)] = new Iterator[(String, Int, Int)] {
      private var i = lo
      def hasNext: Boolean = i + 8 <= hi
      def next(): (String, Int, Int) = {
        val size = be32(b, i)
        val typ = new String(b, i + 4, 4, "ISO-8859-1")
        val end = if (size <= 0) hi else math.min(i + size, hi)
        val r = (typ, i + 8, end)
        i = math.max(end, i + 8)                            // malformed sizes still advance
        r
      }
    }
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    def find(lo: Int, hi: Int, path: List[String]): Iterator[(List[String], Int, Int)] =
      boxes(lo, hi).flatMap { case (t, s, e) =>
        val here = Iterator((t :: path, s, e))
        if (containers(t)) here ++ find(s, e, t :: path) else here
      }
    if (b.length < 8) return None
    // group leaf boxes by their trak: walk traks, inspect each for hdlr+stts
    val traks = find(0, b.length, Nil).collect { case ("trak" :: _, s, e) => (s, e) }.toSeq
    traks.iterator.map { case (s, e) =>
      val leaves = find(s, e, Nil).toSeq
      val isVideo = leaves.exists { case (p, ls, le_) =>
        p.head == "hdlr" && ls + 12 <= le_ &&
          new String(b, ls + 8, 4, "ISO-8859-1") == "vide"
      }
      if (!isVideo) None
      else leaves.collectFirst { case ("stts" :: _, ls, le_) if ls + 8 <= le_ =>
        val n = be32(b, ls + 4)
        var total = 0L
        var k = 0
        while (k < n && ls + 8 + k * 8 + 4 <= le_) {
          total += (be32(b, ls + 8 + k * 8).toLong & 0xFFFFFFFFL)
          k += 1
        }
        math.min(total, Int.MaxValue.toLong).toInt
      }
    }.collectFirst { case Some(n) => n }
  }
}
