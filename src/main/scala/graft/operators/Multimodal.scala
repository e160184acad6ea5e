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
  * STUB BOUNDARY: the actual pixel/sample decode is NOT real — this
  * container has no image/audio libraries. `MediaCodec.decodePayload` is a
  * deterministic fake (byte-histogram features). Everything around it —
  * schemas, header parsing, batch shape, partitioning, null/corrupt
  * handling — is real and tested.
  */
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

  /** STUB decode + feature extraction: a real implementation would decode
    * pixels/samples; this deterministic fake computes byte-histogram moments
    * over the payload so downstream plumbing (fixed-dim float features,
    * normalization, ANN indexing) is fully exercised. */
  object MediaCodec {
    def decodePayload(bytes: Array[Byte]): Array[Float] = {
      val payload = if (bytes.length > 16) bytes.drop(16) else Array.emptyByteArray
      val f = new Array[Float](FeatureDim)
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
      f
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

  /** STUB resize: recomputes the metadata shape a resize would produce (the
    * pixel transform itself is behind the codec stub). Aspect-preserving
    * fit into (maxW, maxH). */
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

  /** STUB frame sampling for video: emits every `stride`-th frame index with
    * its (fake) byte offset — the explode pattern a real sampler uses, so
    * per-frame downstream operators (decode, embed) fan out correctly. */
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
