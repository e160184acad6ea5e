package graft.core.seqfile

import java.io.{BufferedOutputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** SequenceFile writer: version 6, any compression layout — BLOCK (default,
  * the exact inverse of the format the reference reads; header grammar
  * reference: src/Data/Hadoop/SequenceFile/Parser.hs:42-78, block framing
  * Parser.hs:93-110 + cbits/decode.c:76-118), RECORD, or uncompressed —
  * across the snappy/gzip/deflate codecs. The reference's README promises
  * write support but none exists (reference: README.md:3-5) — this delivers
  * it, at write parity with real Hadoop (whose own Reader round-trips every
  * layout this writer emits; see SeqLayoutInteropSpec).
  *
  * BLOCK mode: records accumulate in per-column buffers and flush as one
  * compressed block once the uncompressed payload reaches `blockSize`
  * (Hadoop's io.seqfile.compress.blocksize default, 1 MiB). Record modes:
  * each record is written as [BE32 recordLen][BE32 keyLen][key][value]
  * with a sync marker every ~`SyncInterval` bytes (Hadoop's 100×20), the
  * value per-record compressed under RECORD.
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
    syncSeed: Long = System.nanoTime(),
    compression: SeqCompression = SeqCompression.Block,
    codec: SeqBlockCodec = SeqCodecs.SnappyCodec,
    bloomFpp: Option[Double] = None) extends java.io.Closeable {

  import SeqFileWriter.SyncInterval

  /** Logical bytes handed to the stream so far — counted UNDER the buffer,
    * so the count is current even while bytes sit unflushed. Block offsets
    * recorded for the zone map come from this. */
  private object counting extends OutputStream {
    var count: Long = 0L
    override def write(b: Int): Unit = { out.write(b); count += 1 }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      out.write(b, off, len); count += len
    }
    override def flush(): Unit = out.flush()
    override def close(): Unit = out.close()
  }
  private val os = new BufferedOutputStream(counting, 1 << 16)
  private def logicalPos: Long = counting.count // call only right after os.flush()
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
  // record-mode state: per-record scratch + byte position for sync cadence
  private val recKey = new GrowBuf(256)
  private val recVal = new GrowBuf(256)
  private var bodyPos = 0L   // bytes written after the header
  private var lastSync = 0L

  // zone-map collection (BLOCK mode; keys mandatory, values when ordered)
  private var zMin: ZoneKey = null
  private var zMax: ZoneKey = null
  private var zvMin: ZoneKey = null
  private var zvMax: ZoneKey = null
  private val zEntries = scala.collection.mutable.ArrayBuffer.empty[ZoneEntry]
  // per-block key hashes for the opt-in Bloom sidecar (see KeyBloom):
  // 8 bytes/record of transient memory, bounded by the block's record count
  private val bHashes =
    if (bloomFpp.isDefined) scala.collection.mutable.ArrayBuffer.empty[Long] else null

  writeHeader()

  private def writeHeader(): Unit = {
    os.write(SeqHeader.Magic)
    os.write(SeqHeader.Version)
    writeText(keyType.javaClass)
    writeText(valueType.javaClass)
    os.write(if (compression == SeqCompression.None) 0 else 1)
    os.write(if (compression == SeqCompression.Block) 1 else 0)
    // Hadoop writes the codec class only for compressed files
    if (compression != SeqCompression.None) writeText(codec.javaClass)
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
    if (compression == SeqCompression.Block) {
      val k0 = keyData.size
      serialize(keyType, key, keyData)
      keyLens.appendVInt(keyData.size - k0)
      val v0 = valData.size
      serialize(valueType, value, valData)
      valLens.appendVInt(valData.size - v0)
      ZoneKey.forValue(keyType, key).foreach { zk =>
        if (zMin == null || zk.cmp(zMin) < 0) zMin = zk
        if (zMax == null || zk.cmp(zMax) > 0) zMax = zk
        if (bHashes != null) bHashes += KeyBloom.hashKey(zk)
      }
      ZoneKey.forValue(valueType, value).foreach { zv =>
        if (zvMin == null || zv.cmp(zvMin) < 0) zvMin = zv
        if (zvMax == null || zv.cmp(zvMax) > 0) zvMax = zv
      }
      nBuffered += 1
      if (keyData.size + valData.size >= blockSize) flushBlock()
    } else appendRecord(key, value)
  }

  /** Record-layout append (uncompressed / RECORD): sync cadence like
    * Hadoop's writer (a marker before the record once `SyncInterval` bytes
    * have passed since the last one). */
  private def appendRecord(key: Any, value: Any): Unit = {
    recKey.reset(); recVal.reset()
    serialize(keyType, key, recKey)
    serialize(valueType, value, recVal)
    val valBytes =
      if (compression == SeqCompression.Record) codec.compress(recVal.array, recVal.size)
      else null
    val valLen = if (valBytes != null) valBytes.length else recVal.size
    if (bodyPos - lastSync >= SyncInterval) {
      os.write(Array[Byte](-1, -1, -1, -1))
      os.write(sync)
      bodyPos += 4 + sync.length
      lastSync = bodyPos
    }
    writeBE32(recKey.size + valLen)
    writeBE32(recKey.size)
    os.write(recKey.array, 0, recKey.size)
    if (valBytes != null) os.write(valBytes, 0, valBytes.length)
    else os.write(recVal.array, 0, recVal.size)
    bodyPos += 8 + recKey.size + valLen
  }

  private def writeBE32(v: Int): Unit = {
    os.write((v >>> 24) & 0xff); os.write((v >>> 16) & 0xff)
    os.write((v >>> 8) & 0xff); os.write(v & 0xff)
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
    // zone-map entry: record where this block's sync escape lands (flush
    // the buffer so the counting layer is current — one flush per ~1 MiB
    // block is noise)
    if (zMin != null || zvMin != null) {
      os.flush()
      val bloom =
        if (bHashes != null && bHashes.nonEmpty)
          Some(KeyBloom.build(bHashes.toArray, bloomFpp.get))
        else None
      zEntries += ZoneEntry(logicalPos, nBuffered.toLong,
        Option(zMin), Option(zMax), Option(zvMin), Option(zvMax), bloom)
      zMin = null; zMax = null; zvMin = null; zvMax = null
      if (bHashes != null) bHashes.clear()
    }
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
    val framed = codec.compress(b.array, b.size)
    VInt.write(os, framed.length.toLong)
    os.write(framed)
  }

  def close(): Unit = if (!closed) {
    if (compression == SeqCompression.Block) flushBlock()
    os.flush()
    os.close()
    closed = true
  }

  /** Per-block zone-map entries collected so far (BLOCK mode with an
    * ordered key type; empty otherwise). Call after close(); callers
    * persist these via ZoneMap.write as a sidecar. */
  def zoneEntries: Seq[ZoneEntry] = zEntries.toSeq

  /** Total bytes emitted (exact after close()). */
  def bytesWritten: Long = counting.count
}

object SeqFileWriter {
  /** Hadoop's SYNC_INTERVAL: 100 × (escape + sync) bytes. */
  val SyncInterval: Int = 100 * (4 + SeqHeader.SyncSize)
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
