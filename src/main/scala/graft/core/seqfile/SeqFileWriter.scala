package graft.core.seqfile

import java.io.{BufferedOutputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** SequenceFile writer: version 6, BLOCK compression, SnappyCodec — the exact
  * inverse of the format the reference reads (header grammar reference:
  * src/Data/Hadoop/SequenceFile/Parser.hs:42-78; block framing reference:
  * Parser.hs:93-110 + cbits/decode.c:76-118). The reference's README promises
  * write support but none exists (reference: README.md:3-5) — this delivers
  * it.
  *
  * Records accumulate in per-column buffers and flush as one compressed block
  * once the uncompressed payload reaches `blockSize` (Hadoop's
  * io.seqfile.compress.blocksize default, 1 MiB).
  *
  * The header metadata count is written big-endian like real Hadoop
  * (`DataOutput.writeInt`); the reference reads it little-endian
  * (reference: Parser.hs:72-75), a latent bug only byte-compatible for the
  * empty-metadata files it was tested on.
  */
final class SeqFileWriter(
    out: OutputStream,
    keyType: WritableType,
    valueType: WritableType,
    metadata: Seq[(String, String)] = Nil,
    blockSize: Int = 1 << 20,
    syncSeed: Long = System.nanoTime()) extends java.io.Closeable {

  private val os = new BufferedOutputStream(out, 1 << 16)
  private val sync: Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    md.update(s"graft.seqfile.$syncSeed".getBytes(StandardCharsets.UTF_8))
    md.digest()
  }

  private val keyLens = new GrowBuf()
  private val keyData = new GrowBuf()
  private val valLens = new GrowBuf()
  private val valData = new GrowBuf()
  private var nBuffered = 0
  private var closed = false

  writeHeader()

  private def writeHeader(): Unit = {
    os.write(SeqHeader.Magic)
    os.write(SeqHeader.Version)
    writeText(keyType.javaClass)
    writeText(valueType.javaClass)
    os.write(1) // compressed
    os.write(1) // block compressed
    writeText(SeqHeader.SnappyCodecClass)
    // metadata count, big-endian like real Hadoop (see class doc)
    val n = metadata.size
    os.write((n >> 24) & 0xff); os.write((n >> 16) & 0xff)
    os.write((n >> 8) & 0xff); os.write(n & 0xff)
    metadata.foreach { case (k, v) => writeText(k); writeText(v) }
    os.write(sync)
  }

  private def writeText(s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    VInt.write(os, b.length.toLong)
    os.write(b)
  }

  /** Append one record. Serialization per Writable type matches what the
    * reference's decoders strip back off: Text = vint payload length + UTF-8
    * (reference: Writable.hs:101-106), BytesWritable = 4-byte BE length +
    * bytes (Writable.hs:97-99), fixed-width = big-endian payload
    * (Writable.hs:77-95), NullWritable = empty (Writable.hs:73-75). */
  def append(key: Any, value: Any): Unit = {
    require(!closed, "writer closed")
    val k0 = keyData.size
    serialize(keyType, key, keyData)
    keyLens.appendVInt(keyData.size - k0)
    val v0 = valData.size
    serialize(valueType, value, valData)
    valLens.appendVInt(valData.size - v0)
    nBuffered += 1
    if (keyData.size + valData.size >= blockSize) flushBlock()
  }

  private def serialize(t: WritableType, v: Any, dst: GrowBuf): Unit = t match {
    case WritableType.NullW => ()
    case WritableType.ShortW => dst.appendBE16(v.asInstanceOf[Short])
    case WritableType.IntW => dst.appendBE32(v.asInstanceOf[Int])
    case WritableType.LongW => dst.appendBE64(v.asInstanceOf[Long])
    case WritableType.FloatW =>
      dst.appendBE32(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
    case WritableType.DoubleW =>
      dst.appendBE64(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
    case WritableType.TextW =>
      val b = v match {
        case s: String => s.getBytes(StandardCharsets.UTF_8)
        case a: Array[Byte] => a // pre-encoded UTF-8
        case other => other.toString.getBytes(StandardCharsets.UTF_8)
      }
      dst.appendVInt(b.length)
      dst.append(b, 0, b.length)
    case WritableType.BytesW =>
      val b = v.asInstanceOf[Array[Byte]]
      dst.appendBE32(b.length)
      dst.append(b, 0, b.length)
  }

  private def flushBlock(): Unit = {
    if (nBuffered == 0) return
    // sync escape + sync before every block (reference: Parser.hs:93-101)
    os.write(Array[Byte](-1, -1, -1, -1))
    os.write(sync)
    VInt.write(os, nBuffered.toLong)
    writeCompressed(keyLens)
    writeCompressed(keyData)
    writeCompressed(valLens)
    writeCompressed(valData)
    keyLens.reset(); keyData.reset(); valLens.reset(); valData.reset()
    nBuffered = 0
  }

  private def writeCompressed(b: GrowBuf): Unit = {
    val framed = SnappyBlockCodec.compress(b.array, b.size)
    VInt.write(os, framed.length.toLong)
    os.write(framed)
  }

  def close(): Unit = if (!closed) {
    flushBlock()
    os.flush()
    os.close()
    closed = true
  }
}

/** Minimal growable byte buffer (avoids ByteArrayOutputStream's sync'd writes
  * in the per-record hot path). */
final class GrowBuf(initial: Int = 1 << 16) {
  private var buf = new Array[Byte](initial)
  private var len = 0
  def array: Array[Byte] = buf
  def size: Int = len
  def reset(): Unit = len = 0
  private def ensure(n: Int): Unit =
    if (len + n > buf.length) {
      var cap = buf.length * 2
      while (cap < len + n) cap *= 2
      buf = java.util.Arrays.copyOf(buf, cap)
    }
  def append(src: Array[Byte], off: Int, n: Int): Unit = {
    ensure(n); System.arraycopy(src, off, buf, len, n); len += n
  }
  def appendVInt(v: Long): Unit = { ensure(9); len += VInt.write(buf, len, v) }
  def appendBE16(v: Short): Unit = {
    ensure(2); buf(len) = (v >> 8).toByte; buf(len + 1) = v.toByte; len += 2
  }
  def appendBE32(v: Int): Unit = {
    ensure(4)
    buf(len) = (v >>> 24).toByte; buf(len + 1) = (v >>> 16).toByte
    buf(len + 2) = (v >>> 8).toByte; buf(len + 3) = v.toByte
    len += 4
  }
  def appendBE64(v: Long): Unit = {
    ensure(8)
    var i = 0
    while (i < 8) { buf(len + i) = (v >>> (56 - 8 * i)).toByte; i += 1 }
    len += 8
  }
}
