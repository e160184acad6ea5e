package graft.core.seqfile

import java.io.ByteArrayInputStream
import java.util.zip.{Deflater, DeflaterOutputStream, GZIPInputStream, GZIPOutputStream, InflaterInputStream}

/** Compression codec abstraction for SequenceFiles. The reference supports
  * exactly one codec (Snappy, rejected otherwise at Parser.hs:62-65); real
  * Hadoop files in the wild also use the deflate-based codecs, which are
  * one `java.util.zip` call away — so the reader accepts them and the
  * registry stays open for more.
  *
  * Framing differences mirror Hadoop's writer classes:
  *  - Snappy uses `BlockCompressorStream` chunk framing
  *    ([BE32 raw size][BE32 chunk size][chunk]...; see SnappyBlockCodec).
  *  - Gzip/Default(zlib) use `CompressorStream`: each compressed buffer is
  *    one complete gzip member / zlib stream, no extra framing.
  */
trait SeqBlockCodec {
  def javaClass: String
  def decompress(buf: Array[Byte], off: Int, len: Int): Array[Byte]
  final def decompress(buf: Array[Byte]): Array[Byte] =
    decompress(buf, 0, buf.length)
  def compress(raw: Array[Byte], rawLen: Int): Array[Byte]
}

object SeqCodecs {
  val SnappyClass = "org.apache.hadoop.io.compress.SnappyCodec"
  val GzipClass = "org.apache.hadoop.io.compress.GzipCodec"
  val DefaultClass = "org.apache.hadoop.io.compress.DefaultCodec"
  val DeflateClass = "org.apache.hadoop.io.compress.DeflateCodec" // alias of Default

  object SnappyCodec extends SeqBlockCodec {
    val javaClass: String = SnappyClass
    def decompress(buf: Array[Byte], off: Int, len: Int): Array[Byte] =
      SnappyBlockCodec.decompress(buf, off, len)
    def compress(raw: Array[Byte], rawLen: Int): Array[Byte] =
      SnappyBlockCodec.compress(raw, rawLen)
  }

  private def drain(in: java.io.InputStream): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1 << 16)
    val buf = new Array[Byte](1 << 16)
    var r = in.read(buf)
    while (r >= 0) {
      if (r > 0) out.write(buf, 0, r)
      r = in.read(buf)
    }
    out.toByteArray
  }

  object GzipCodec extends SeqBlockCodec {
    val javaClass: String = GzipClass
    def decompress(buf: Array[Byte], off: Int, len: Int): Array[Byte] =
      try drain(new GZIPInputStream(new ByteArrayInputStream(buf, off, len)))
      catch { case e: java.util.zip.ZipException =>
        throw new SeqFileFormatException(s"corrupt gzip buffer: ${e.getMessage}") }
    def compress(raw: Array[Byte], rawLen: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(rawLen / 2 + 64)
      val gz = new GZIPOutputStream(out)
      gz.write(raw, 0, rawLen)
      gz.close()
      out.toByteArray
    }
  }

  /** Hadoop DefaultCodec: zlib-wrapped deflate. */
  object DeflateCodec extends SeqBlockCodec {
    val javaClass: String = DefaultClass
    def decompress(buf: Array[Byte], off: Int, len: Int): Array[Byte] =
      try drain(new InflaterInputStream(new ByteArrayInputStream(buf, off, len)))
      catch { case e: java.util.zip.ZipException =>
        throw new SeqFileFormatException(s"corrupt deflate buffer: ${e.getMessage}") }
    def compress(raw: Array[Byte], rawLen: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(rawLen / 2 + 64)
      val d = new DeflaterOutputStream(out, new Deflater(Deflater.DEFAULT_COMPRESSION))
      d.write(raw, 0, rawLen)
      d.close()
      out.toByteArray
    }
  }

  val ZstdClass = "org.apache.hadoop.io.compress.ZStandardCodec"

  /** Hadoop ZStandardCodec: each compressed buffer is one standard zstd
    * frame (CompressorStream family, like gzip — no extra chunk framing).
    * Implemented over zstd-jni (ships with Spark). Streaming API on both
    * sides: Hadoop's compressor emits frames without the content-size
    * header field, so decompression must not rely on it. Round-trip is
    * spec-verified against our own reader; Hadoop-native interop can't be
    * exercised in this container (its ZStandardCodec needs libhadoop), but
    * the bytes are plain zstd frames in the standard SequenceFile layout. */
  object ZstdCodec extends SeqBlockCodec {
    val javaClass: String = ZstdClass
    def decompress(buf: Array[Byte], off: Int, len: Int): Array[Byte] =
      try drain(new com.github.luben.zstd.ZstdInputStream(
        new ByteArrayInputStream(buf, off, len)))
      catch { case e: java.io.IOException =>
        throw new SeqFileFormatException(s"corrupt zstd buffer: ${e.getMessage}") }
    def compress(raw: Array[Byte], rawLen: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(rawLen / 3 + 64)
      val z = new com.github.luben.zstd.ZstdOutputStream(out)
      // zstd's default leaves the optional frame checksum off, which lets
      // mid-frame corruption in literal sections decompress "cleanly" into
      // garbage. The checksum bit is part of the standard frame format (any
      // decoder, incl. Hadoop's, handles it) and makes corruption an error.
      z.setChecksum(true)
      z.write(raw, 0, rawLen)
      z.close()
      out.toByteArray
    }
  }

  val Lz4Class = "org.apache.hadoop.io.compress.Lz4Codec"

  /** Hadoop Lz4Codec: snappy-style BlockCompressorStream framing with lz4
    * BLOCK chunks (pure-Java in Hadoop 3.3+, so real-Hadoop interop holds —
    * see Lz4BlockCodec). */
  object Lz4Codec extends SeqBlockCodec {
    val javaClass: String = Lz4Class
    def decompress(buf: Array[Byte], off: Int, len: Int): Array[Byte] =
      Lz4BlockCodec.decompress(buf, off, len)
    def compress(raw: Array[Byte], rawLen: Int): Array[Byte] =
      Lz4BlockCodec.compress(raw, rawLen)
  }

  private val byClass: Map[String, SeqBlockCodec] = Map(
    SnappyClass -> SnappyCodec,
    GzipClass -> GzipCodec,
    DefaultClass -> DeflateCodec,
    DeflateClass -> DeflateCodec,
    ZstdClass -> ZstdCodec,
    Lz4Class -> Lz4Codec)

  def forClass(name: String): Option[SeqBlockCodec] = byClass.get(name)

  def forClassOrThrow(name: String): SeqBlockCodec =
    byClass.getOrElse(name, throw new SeqFileFormatException(
      s"unsupported codec: $name (supported: ${byClass.keys.toSeq.sorted.mkString(", ")})"))
}
