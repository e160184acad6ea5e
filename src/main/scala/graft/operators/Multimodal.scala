package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: images/audio/video ride through the pipeline
  * as opaque `binary` columns plus a typed metadata struct — the layout a
  * 100 TB training-data pipeline uses (media bytes never leave the executor;
  * all planning happens on the small metadata columns).
  *
  * Decode/resize/frame-sample run as `mapPartitions` over typed Datasets in
  * fixed-size record batches — the Scala analog of Python's mapInPandas:
  * per-batch amortized setup (a real codec would initialize its native
  * context once per batch), iterator-in/iterator-out so partitions stream
  * without materializing.
  *
  * The pixel/sample decode is REAL for: BMP (24/32bpp uncompressed,
  * graft.core.media.BmpCodec) and WAV/PCM (8/16-bit,
  * graft.core.media.WavCodec) via pure integer arithmetic; PNG/JPEG/GIF via
  * the JDK's own javax.imageio (pure-JDK, headless —
  * graft.core.media.ImageIoCodec); plus a GRFT frame container holding
  * concatenated BMP frames (video). Formats genuinely outside the JDK
  * (MP3/H.264) fall back to deterministic byte-level features via the same
  * dispatch, so the plumbing — schemas, batching, partitioning, corrupt
  * handling — is exercised identically for every payload kind. */
object Multimodal {

  val Magic: Array[Byte] = "GRFT".getBytes(StandardCharsets.US_ASCII)
  val KindImage = 0; val KindAudio = 1; val KindVideo = 2
  val FeatureDim = 16
  val BatchSize = 64

  case class MediaRecord(media_id: Long, kind: Int, bytes: Array[Byte])

  case class MediaMeta(media_id: Long, kind: Int, width: Int, height: Int,
                       sample_rate: Int, n_frames: Int, payload_len: Int,
                       valid: Boolean)

  case class MediaFeatures(media_id: Long, kind: Int, features: Array[Float])

  case class Frame(media_id: Long, frame_idx: Int, byte_offset: Int)

  /** Synthesize a deterministic media corpus from the documents table:
    * header fields derive from media_id arithmetic (so the DuckDB oracle can
    * recompute them without parsing bytes), payload = UTF-8 text. */
  def synthesize(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val kind = (id % 3).toInt
          val payload = text.getBytes(StandardCharsets.UTF_8)
          val header = new Array[Byte](16)
          System.arraycopy(Magic, 0, header, 0, 4)
          header(4) = kind.toByte
          val width = 32 + (id % 8).toInt * 16
          val height = 32 + (id % 4).toInt * 32
          val sampleRate = 8000 + (id % 4).toInt * 8000
          val nFrames = 8 + (id % 32).toInt
          putBE16(header, 5, width)
          putBE16(header, 7, height)
          putBE24(header, 9, sampleRate)
          putBE16(header, 12, nFrames)
          MediaRecord(id, kind, header ++ payload)
        }
      }
  }

  private def putBE16(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >> 8).toByte; a(off + 1) = v.toByte
  }
  private def putBE24(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >> 16).toByte; a(off + 1) = (v >> 8).toByte; a(off + 2) = v.toByte
  }
  private def be16(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xff) << 8) | (a(off + 1) & 0xff)
  private def be24(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xff) << 16) | ((a(off + 1) & 0xff) << 8) | (a(off + 2) & 0xff)

  /** Parse media headers → typed metadata. Corrupt/truncated records yield
    * valid=false rows instead of failing the partition (PERMISSIVE-style). */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // per-batch setup would live here in a real codec
        batch.map { m =>
          val b = m.bytes
          if (b.length < 16 || !java.util.Arrays.equals(b.take(4), Magic))
            MediaMeta(m.media_id, m.kind, 0, 0, 0, 0, 0, valid = false)
          else
            MediaMeta(m.media_id, b(4).toInt, be16(b, 5), be16(b, 7),
              be24(b, 9), be16(b, 12), b.length - 16, valid = true)
        }
      }
    }
  }

  /** Media decode dispatch. Real parsers for everything the JVM can decode
    * (BMP, PNG/JPEG/GIF via javax.imageio, WAV, BMP-frame video container);
    * byte-level fallback features for everything else so unknown codecs
    * degrade gracefully instead of failing the partition. */
  object MediaCodec {
    import graft.core.media.{BmpCodec, WavCodec}

    sealed trait Decoded
    final case class DecodedImage(img: BmpCodec.BmpImage) extends Decoded
    final case class DecodedAudio(audio: WavCodec.WavAudio) extends Decoded
    final case class DecodedVideo(width: Int, height: Int,
                                  frames: Seq[BmpCodec.BmpImage]) extends Decoded
    final case class Opaque(payload: Array[Byte]) extends Decoded
    final case class Corrupt(reason: String) extends Decoded

    /** Sniff the container by magic and decode. GRFT containers whose
      * payload starts with a BMP are treated as a frame sequence (each
      * frame's length is read from its own BMP file header, so frames of
      * different sizes walk correctly); GRFT with any other payload is
      * opaque (the payload bytes feed the fallback features). */
    def decode(bytes: Array[Byte]): Decoded =
      // catch-all insurance on top of the codecs' Left-on-corrupt contract:
      // ONE hostile record must never fail a whole partition
      try decodeUnsafe(bytes)
      catch { case scala.util.control.NonFatal(e) => Corrupt(e.toString) }

    private def decodeUnsafe(bytes: Array[Byte]): Decoded = {
      import graft.core.media.ImageIoCodec
      if (BmpCodec.isBmp(bytes))
        BmpCodec.decode(bytes).fold(Corrupt.apply, DecodedImage.apply)
      else if (ImageIoCodec.isSupported(bytes)) // PNG/JPEG/GIF via the JDK
        ImageIoCodec.decode(bytes).fold(Corrupt.apply, DecodedImage.apply)
      else if (WavCodec.isWav(bytes))
        WavCodec.decode(bytes).fold(Corrupt.apply, DecodedAudio.apply)
      else if (bytes.length >= 16 &&
               java.util.Arrays.equals(bytes.take(4), Magic)) {
        val nFrames = be16(bytes, 12)
        val payload = java.util.Arrays.copyOfRange(bytes, 16, bytes.length)
        if (nFrames > 0 && BmpCodec.isBmp(payload)) decodeFrames(payload, nFrames)
        else Opaque(payload)
      } else Opaque(bytes)
    }

    private def decodeFrames(payload: Array[Byte], nFrames: Int): Decoded = {
      val frames = Seq.newBuilder[BmpCodec.BmpImage]
      var off = 0
      var i = 0
      while (i < nFrames) {
        if (off + 6 > payload.length)
          return Corrupt(s"frame $i starts past payload end ($off of ${payload.length})")
        // BMP file header carries its own total size at offset 2; Long-space
        // bounds check — a crafted size wraps off+size negative in Int space
        val size = graft.core.media.ByteIO.le32(payload, off + 2)
        if (size <= 0 || off.toLong + size > payload.length)
          return Corrupt(s"frame $i size $size overruns payload (${payload.length})")
        BmpCodec.decode(java.util.Arrays.copyOfRange(payload, off, off + size)) match {
          case Right(img) => frames += img
          case Left(err) => return Corrupt(s"frame $i: $err")
        }
        off += size
        i += 1
      }
      val fs = frames.result()
      DecodedVideo(fs.head.width, fs.head.height, fs)
    }

    /** Fixed-dim feature vector per media record.
      * Image: [w, h, meanR, meanG, meanB, 8-bin luminance histogram, 0...].
      * Audio: [n, rate, mean, rms, zero-crossing rate, 0...].
      * Video: [nFrames, w, h, first-frame mean, last-frame mean, 0...].
      * Opaque fallback: [len, byte mean, byte std, 13-bin byte histogram]. */
    def decodePayload(bytes: Array[Byte]): Array[Float] = {
      val f = new Array[Float](FeatureDim)
      decode(bytes) match {
        case DecodedImage(img) =>
          f(0) = img.width.toFloat; f(1) = img.height.toFloat
          f(2) = img.meanR.toFloat; f(3) = img.meanG.toFloat; f(4) = img.meanB.toFloat
          val hist = new Array[Int](8)
          img.pixels.foreach { p =>
            val lum = (((p >>> 16) & 0xff) + ((p >>> 8) & 0xff) + (p & 0xff)) / 3
            hist(lum >> 5) += 1
          }
          (0 until 8).foreach(i => f(5 + i) = hist(i).toFloat / math.max(1, img.pixels.length))
        case DecodedAudio(a) =>
          f(0) = a.nSamples.toFloat; f(1) = a.sampleRate.toFloat
          f(2) = a.mean.toFloat; f(3) = a.rms.toFloat
          f(4) = a.zeroCrossingRate.toFloat
        case DecodedVideo(w, h, frames) =>
          f(0) = frames.size.toFloat; f(1) = w.toFloat; f(2) = h.toFloat
          f(3) = frames.head.meanR.toFloat; f(4) = frames.last.meanR.toFloat
        case Opaque(payload) =>
          f(0) = payload.length.toFloat
          if (payload.nonEmpty) {
            var sum = 0L; var sumSq = 0L
            val hist = new Array[Int](13)
            payload.foreach { b =>
              val u = b & 0xff
              sum += u; sumSq += u.toLong * u
              hist(u * 13 / 256) += 1
            }
            val mean = sum.toDouble / payload.length
            f(1) = mean.toFloat
            f(2) = math.sqrt(sumSq.toDouble / payload.length - mean * mean).toFloat
            (0 until 13).foreach(i => f(3 + i) = hist(i).toFloat / payload.length)
          }
        case Corrupt(_) => () // zero vector
      }
      f
    }
  }

  /** Real-media variant of synthesize: every record is a genuinely encoded
    * file — a solid-color 24bpp BMP (kind 0), a square-wave 16-bit PCM WAV
    * (kind 1), or a GRFT container of concatenated BMP frames (kind 2).
    * Every encoded property derives from media_id arithmetic, so a SQL
    * oracle can predict the DECODED statistics without parsing a byte —
    * which is exactly what makes the real decode certifiable: the only way
    * the pipeline can reproduce the closed-form numbers is by correctly
    * parsing pixels/samples back out of the files it wrote. */
  def synthesizeMedia(documents: DataFrame): Dataset[MediaRecord] = {
    import graft.core.media.{BmpCodec, WavCodec}
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val kind = (id % 3).toInt
        val bytes = kind match {
          case KindImage =>
            val w = 16 + (id % 8).toInt * 8
            val h = 16 + (id % 4).toInt * 8
            val rgb = (((id * 3) % 256).toInt << 16) |
              (((id * 5) % 256).toInt << 8) | ((id * 7) % 256).toInt
            BmpCodec.encodeSolid(w, h, rgb)
          case KindAudio =>
            val rate = 8000 + (id % 4).toInt * 8000
            val n = 800 + (id % 16).toInt * 104 // multiple of 8 -> exact 0 mean
            val amp = 1000 + (id % 100).toInt * 10
            val s = Array.tabulate(n)(i => if ((i / 4) % 2 == 0) amp else -amp)
            WavCodec.encode(rate, 1, s)
          case _ =>
            val nf = 2 + (id % 4).toInt
            val frames = (0 until nf).toArray.flatMap { f =>
              val c = ((id * 5 + f) % 256).toInt
              BmpCodec.encodeSolid(16, 16, (c << 16) | (c << 8) | c)
            }
            val header = new Array[Byte](16)
            System.arraycopy(Magic, 0, header, 0, 4)
            header(4) = KindVideo.toByte
            putBE16(header, 5, 16)
            putBE16(header, 7, 16)
            putBE24(header, 9, 0)
            putBE16(header, 12, nf)
            header ++ frames
        }
        MediaRecord(id, kind, bytes)
      }
    }
  }

  /** PNG variant of synthesizeMedia: every record is a REAL PNG (encoded by
    * the JDK's ImageIO) of a solid color whose dims/colors are closed forms
    * of doc_id — so the ImageIO decode path (PNG is lossless) is certifiable
    * by the same arithmetic-oracle trick as the BMP/WAV media. */
  def synthesizePng(documents: DataFrame): Dataset[MediaRecord] = {
    import graft.core.media.ImageIoCodec
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = 8 + (id % 8).toInt * 4
        val h = 8 + (id % 4).toInt * 4
        val rgb = (((id * 11) % 256).toInt << 16) |
          (((id * 13) % 256).toInt << 8) | ((id * 17) % 256).toInt
        MediaRecord(id, KindImage,
          ImageIoCodec.encodePng(w, h, Array.fill(w * h)(rgb)))
      }
    }
  }

  /** Per-record decoded statistics. stat1/stat2 are kind-dependent:
    * image -> (mean R, mean B); audio -> (RMS, mean); video -> (first-frame
    * mean, last-frame mean). Corrupt records keep valid=false zeros. */
  case class MediaStats(media_id: Long, kind: Int, width: Int, height: Int,
                        n_frames: Int, n_samples: Int, sample_rate: Int,
                        stat1: Double, stat2: Double, valid: Boolean)

  def decodeStats(media: Dataset[MediaRecord]): Dataset[MediaStats] = {
    import MediaCodec._
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { m =>
          MediaCodec.decode(m.bytes) match {
            case DecodedImage(img) =>
              MediaStats(m.media_id, KindImage, img.width, img.height, 0, 0, 0,
                img.meanR, img.meanB, valid = true)
            case DecodedAudio(a) =>
              MediaStats(m.media_id, KindAudio, 0, 0, 0, a.nSamples, a.sampleRate,
                a.rms, a.mean, valid = true)
            case DecodedVideo(w, h, frames) =>
              MediaStats(m.media_id, KindVideo, w, h, frames.size, 0, 0,
                frames.head.meanR, frames.last.meanR, valid = true)
            case _ =>
              MediaStats(m.media_id, m.kind, 0, 0, 0, 0, 0, 0.0, 0.0, valid = false)
          }
        }
      }
    }
  }

  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map(m => MediaFeatures(m.media_id, m.kind, MediaCodec.decodePayload(m.bytes)))
      }
    }
  }

  /** REAL image resize over the decoded raster: aspect-preserving fit into
    * (maxW, maxH) via nearest-neighbor resample, re-encoded as 24bpp BMP.
    * Batched mapPartitions like the other media kernels; corrupt or
    * non-image payloads are dropped (the meta pass reports them). Output:
    * (media_id, out_width, out_height, out_bytes) — out_bytes is a valid
    * BMP any downstream decode step (or image viewer) accepts. */
  def resizeImages(media: Dataset[MediaRecord], maxW: Int,
                   maxH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    import graft.core.media.BmpCodec
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          MediaCodec.decode(m.bytes) match {
            case MediaCodec.DecodedImage(img) =>
              val scale = math.min(1.0,
                math.min(maxW.toDouble / img.width, maxH.toDouble / img.height))
              val ow = math.max(1, math.floor(img.width * scale).toInt)
              val oh = math.max(1, math.floor(img.height * scale).toInt)
              val resized = BmpCodec.resize(img, ow, oh)
              Some((m.media_id, ow, oh, BmpCodec.encode(ow, oh, resized.pixels)))
            case _ => None
          }
        }
      }
    }.toDF("media_id", "out_width", "out_height", "out_bytes")
  }

  /** Metadata-only resize planning: recomputes the shape a resize would
    * produce without touching pixels (cheap pre-pass for sizing/batching).
    * Aspect-preserving fit into (maxW, maxH). */
  def resizeShapes(meta: Dataset[MediaMeta], maxW: Int, maxH: Int): DataFrame = {
    meta.toDF()
      .filter(col("valid") && col("kind") === KindImage)
      .withColumn("scale",
        least(lit(maxW) / col("width"), lit(maxH) / col("height"), lit(1.0)))
      .withColumn("out_width", greatest(floor(col("width") * col("scale")), lit(1)).cast("int"))
      .withColumn("out_height", greatest(floor(col("height") * col("scale")), lit(1)).cast("int"))
      .select(col("media_id"), col("width"), col("height"),
        col("out_width"), col("out_height"))
  }

  /** REAL frame sampling over the decoded video container: every
    * `stride`-th frame of each valid GRFT/BMP-frame video, re-encoded as a
    * standalone 24bpp BMP — the fan-out unit per-frame downstream
    * operators (resize, embed, caption) consume. Batched mapPartitions;
    * non-video / corrupt payloads are dropped.
    * Output: (media_id, frame_idx, width, height, frame_bytes). */
  def sampleFrameImages(media: Dataset[MediaRecord], stride: Int): DataFrame = {
    require(stride >= 1)
    val spark = media.sparkSession
    import spark.implicits._
    import graft.core.media.BmpCodec
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.flatMap { m =>
          MediaCodec.decode(m.bytes) match {
            case MediaCodec.DecodedVideo(w, h, frames) =>
              Iterator.range(0, frames.length, stride).map { i =>
                val f = frames(i)
                (m.media_id, i, f.width, f.height,
                  BmpCodec.encode(f.width, f.height, f.pixels))
              }
            case _ => Iterator.empty
          }
        }
      }
    }.toDF("media_id", "frame_idx", "width", "height", "frame_bytes")
  }

  /** Metadata-only frame sampling plan: emits every `stride`-th frame index
    * with its estimated byte offset — the cheap pre-pass when only the
    * fan-out shape is needed, not the pixels. */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int): Dataset[Frame] = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.filter(m => m.valid && m.kind == KindVideo)
      .flatMap { m =>
        (0 until m.n_frames by stride).map { i =>
          Frame(m.media_id, i, 16 + i * math.max(1, m.payload_len / math.max(1, m.n_frames)))
        }
      }
  }
}
