package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media are opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / resize / frame-sample run as BATCHED
  * per-partition transforms (`mapPartitions` over row batches — the Scala
  * analogue of `mapInPandas`: one vectorized call per batch, not per row).
  *
  * Decode is REAL wherever the format is losslessly specified (BMP, PNG,
  * baseline+progressive JPEG, GIF, PCM/ADPCM/G.711 WAV, FLAC payload —
  * see MediaCodecs, all written from the public specs); only PERCEPTUAL
  * codec payloads (MP3 waveforms, H.264/VP9 pixels) fall to `decodeStub`,
  * a deterministic fake from the byte content clearly marked as such. The
  * Spark-side plumbing — schema, binaryFile ingestion, partition sizing,
  * batch shape, output contract — is identical for both; swapping a stub
  * for a codec is replacing one function.
  *
  * Scale notes: `binaryFile` spreads files across tasks and caps per-file
  * size at `spark.sql.sources.binaryFile.maxLength`; large media corpora
  * should be repartitioned by size-bucket before decode so one task doesn't
  * draw all the 4K videos; decoded features (small arrays) shuffle, raw bytes
  * never do after the decode stage.
  */
object Multimodal {

  /** Typed metadata carried alongside every blob. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modification_time", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType),
    StructField("media_type", StringType) // image | audio | video | unknown
  ))

  /** Ingest a directory of media files as (path, mtime, length, content,
    * media_type) — `binaryFile` source + extension-typed metadata.
    */
  def readMedia(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)
      .withColumn("media_type",
        when(lower(col("path")).rlike("\\.(jpe?g|png|gif|bmp|webp)$"), "image")
          .when(lower(col("path")).rlike("\\.(wav|mp3|flac|ogg|m4a)$"), "audio")
          .when(lower(col("path")).rlike("\\.(mp4|mkv|avi|webm|mov)$"), "video")
          .otherwise("unknown"))

  /** Output schema of the decode stage: per-blob feature record. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType),
    StructField("feature", ArrayType(FloatType))))

  /** Deterministic fake decode: "dimensions" and an 8-float "feature" derived
    * from the content hash — the fallback for formats whose payload needs a
    * codec library (MP3, H.264). Replace with a real codec by swapping this
    * function only — the batch plumbing stays.
    */
  def decodeStub(path: String, mediaType: String, content: Array[Byte]): Row = {
    val h = java.util.Arrays.hashCode(content)
    val w = 64 + math.abs(h % 1024)
    val ht = 64 + math.abs((h / 1024) % 1024)
    val frames = if (mediaType == "video") 1 + math.abs(h % 300) else 1
    val feat = Array.tabulate(8)(i => ((h >> (i * 4)) & 0xF).toFloat / 15f)
    Row(path, mediaType, w, ht, frames, 0, 0L, feat.toSeq)
  }

  /** Decode one blob: REAL parsing where no codec library is needed
    * (PNG/GIF/BMP/JPEG header dims; full pixel histograms for BMP, PNG,
    * baseline AND progressive JPEG, GIF; PCM + IMA-ADPCM + G.711 WAV info
    * with RMS envelope; MP3/FLAC/Ogg stream metadata — rate, channels,
    * frames, exact duration; MP4 stts frame count — see MediaCodecs),
    * deterministic stub otherwise (the remaining stub surface is
    * perceptual-codec PAYLOAD decode: MP3 waveforms, H.264 pixels).
    */
  def decodeOne(path: String, mediaType: String, content: Array[Byte]): Row = mediaType match {
    case "image" =>
      MediaCodecs.imageDims(content) match {
        case Some((w, h)) =>
          val feat = MediaCodecs.bmpLuminanceHistogram(content)
            .orElse(MediaCodecs.pngLuminanceHistogram(content))
            .orElse(MediaCodecs.jpegLuminanceHistogram(content))
            .orElse(MediaCodecs.gifLuminanceHistogram(content))
            .map(_.toSeq)
            .getOrElse(decodeStub(path, mediaType, content).getAs[Seq[Float]](7))
          Row(path, mediaType, w, h, 1, 0, 0L, feat)
        case None => decodeStub(path, mediaType, content)
      }
    case "audio" =>
      MediaCodecs.wavInfo(content) match {
        case Some(w) =>
          Row(path, mediaType, 0, 0, 1, w.sampleRate, w.durationMs, w.rmsEnvelope.toSeq)
        case None => MediaCodecs.flacDecodeInfo(content) match {
          // FLAC is lossless and fully specified — REAL PCM decode
          // (constant/verbatim/fixed/LPC subframes + Rice residuals), real
          // RMS envelope, duration from the decoded sample count
          case Some((w, frames)) =>
            Row(path, mediaType, 0, 0, frames, w.sampleRate, w.durationMs,
              w.rmsEnvelope.toSeq)
          case None => MediaCodecs.audioStreamInfo(content) match {
            // framing-layer metadata (MP3 frame walk / FLAC STREAMINFO /
            // Ogg granules) is real; the PERCEPTUAL waveform (MP3/Vorbis
            // payload) would need a codec, so the feature is an explicit
            // zero envelope, not a fake
            case Some(a) =>
              Row(path, mediaType, 0, 0, a.frames, a.sampleRate, a.durationMs,
                Seq.fill(8)(0f))
            case None => decodeStub(path, mediaType, content)
          }
        }
      }
    case "video" =>
      // container-layer truth: MP4 stts frames + mvhd duration, AVI avih
      // frames × µs-per-frame, MKV/WebM Info duration
      val avi = MediaCodecs.aviInfo(content)
      val frames = MediaCodecs.mp4FrameCount(content).orElse(avi.map(_._1))
      val durMs = MediaCodecs.mp4DurationMs(content)
        .orElse(avi.map(_._2))
        .orElse(MediaCodecs.mkvDurationMs(content))
      if (frames.isEmpty && durMs.isEmpty) decodeStub(path, mediaType, content)
      else Row(path, mediaType, 0, 0, frames.getOrElse(1), 0, durMs.getOrElse(0L),
        decodeStub(path, mediaType, content).getAs[Seq[Float]](7))
    case _ => decodeStub(path, mediaType, content)
  }

  /** Decode stage: batched per-partition transform. `batchSize` bounds the
    * bytes held per call (the `mapInPandas` batch-shape contract).
    */
  def decode(media: DataFrame, batchSize: Int = 32): DataFrame = {
    implicit val enc: Encoder[Row] = Encoders.row(decodedSchema)
    media.select("path", "media_type", "content")
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // One call per batch: a real codec would hand `batch` to a native
          // library in one vectorized invocation.
          batch.map(r => decodeOne(r.getString(0), r.getString(1), r.getAs[Array[Byte]](2)))
        }
      }
  }

  /** Real image resize over the media frame: 24-bit BMPs are resized
    * (nearest-neighbor, no libraries); other formats pass through unchanged
    * with `resized=false`. Batched like `decode`.
    */
  def resizeImages(media: DataFrame, newW: Int, newH: Int, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("media_type", StringType),
      StructField("content", BinaryType),
      StructField("resized", BooleanType)))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    media.select("path", "media_type", "content")
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val bytes = r.getAs[Array[Byte]](2)
            MediaCodecs.bmpResize(bytes, newW, newH) match {
              case Some(out) => Row(r.getString(0), r.getString(1), out, true)
              case None      => Row(r.getString(0), r.getString(1), bytes, false)
            }
          }
        }
      }
  }

  /** Perceptual hashes for image near-dup: decode real pixels (BMP / PNG /
    * baseline+progressive JPEG / GIF via [[MediaCodecs.imageRgb]]) and emit
    * (path, width, height, dhash) — the 64-bit difference hash
    * ([[MediaCodecs.dHash64]]). Rows that do not decode, or are smaller
    * than the 9×8 grid, are dropped (they have no perceptual signature —
    * exact-byte dedup still covers them). Batched like `decode`; the raw
    * bytes never leave the decode task, only 8-byte hashes shuffle.
    */
  def imageDHashes(media: DataFrame, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("dhash", LongType)))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    media.select("path", "content")
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { r =>
            for {
              (w, h, rgb) <- MediaCodecs.imageRgb(r.getAs[Array[Byte]](1))
              hash <- MediaCodecs.dHash64(w, h, rgb)
            } yield Row(r.getString(0), w, h, hash)
          }
        }
      }
  }

  /** Image near-dup candidate pairs from dHash signatures: pairs of images
    * within `maxHamming` gradient-sign flips of each other — recompressed,
    * brightness-shifted, and rescaled copies land at distance ≈ 0. The
    * candidate stage is [[NearDedup.hammingPairs64]]'s pigeonhole chunk
    * scheme, so the pair space never goes quadratic even when a corpus is
    * full of near-identical thumbnails; the all-flat hash-0 collision
    * class is exactly the kind of degenerate bucket its cap bounds.
    */
  def imageNearDupPairs(hashes: DataFrame, idCol: String = "path",
                        hashCol: String = "dhash", maxHamming: Int = 8,
                        maxBucketSize: Int = NearDedup.DefaultMaxBucketSize): DataFrame =
    NearDedup.hammingPairs64(
      hashes.select(col(idCol).as("id"), col(hashCol).as("sig")),
      maxHamming, maxBucketSize)

  /** Audio energy fingerprints for near-dup: decode real waveforms (16-bit
    * PCM / G.711 / IMA-ADPCM WAV via [[MediaCodecs.wavSamples]]) and emit
    * (path, sample_rate, afp) — the 64-bit delta-sign energy fingerprint
    * ([[MediaCodecs.audioFingerprint64]]). Rows that do not decode, or are
    * shorter than the 65-window grid, are dropped. The audio twin of
    * [[imageDHashes]]: raw bytes stay in the decode task, 8-byte
    * fingerprints shuffle.
    */
  def audioFingerprints(media: DataFrame, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("sample_rate", IntegerType),
      StructField("afp", LongType)))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    media.select("path", "content")
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { r =>
            for {
              (rate, samples) <- MediaCodecs.wavSamples(r.getAs[Array[Byte]](1))
              fp <- MediaCodecs.audioFingerprint64(samples)
            } yield Row(r.getString(0), rate, fp)
          }
        }
      }
  }

  /** Audio near-dup candidate pairs from energy fingerprints — gain-shifted
    * or re-encoded (PCM vs G.711) copies of the same recording land within
    * a small Hamming ball. Same pigeonhole candidate machinery as images
    * ([[NearDedup.hammingPairs64]]).
    */
  def audioNearDupPairs(fingerprints: DataFrame, idCol: String = "path",
                        fpCol: String = "afp", maxHamming: Int = 8,
                        maxBucketSize: Int = NearDedup.DefaultMaxBucketSize): DataFrame =
    NearDedup.hammingPairs64(
      fingerprints.select(col(idCol).as("id"), col(fpCol).as("sig")),
      maxHamming, maxBucketSize)

  /** Frame sampling plan for video rows: every `stride`-th frame index up to
    * `maxFrames` — pure expression, no decode needed to PLAN the sample.
    */
  def sampleFrames(decoded: DataFrame, stride: Int, maxFrames: Int): DataFrame =
    decoded.filter(col("media_type") === "video")
      .withColumn("frame_idx",
        explode(slice(sequence(lit(0), col("n_frames") - 1, lit(stride)), 1, maxFrames)))
}
