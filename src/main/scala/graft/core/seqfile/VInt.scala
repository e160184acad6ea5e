package graft.core.seqfile

/** Hadoop zero-compressed variable-length integer codec
  * (`WritableUtils.readVInt`/`writeVLong` wire format).
  *
  * Semantics ported from the reference parser
  * (reference: src/Data/Hadoop/SequenceFile/Parser.hs:131-152 and
  * cbits/decode.c:40-72 — two equivalent implementations, one here):
  *   - first byte in [-112, 127]: the value itself (1-byte fast path)
  *   - first byte in [-120, -113]: positive value, (-111 - b) total bytes
  *   - first byte in [-128, -121]: negative value, (-119 - b) total bytes,
  *     payload is the one's complement of the magnitude bytes (big-endian)
  */
object VInt {

  /** Total encoded size (including the tag byte) given the first byte.
    * Mirrors `vintSize` (reference: src/Data/Hadoop/Writable.hs:140-147). */
  def decodeSize(first: Byte): Int =
    if (first >= -112) 1
    else if (first < -120) -119 - first
    else -111 - first

  def isNegative(first: Byte): Boolean =
    first < -120 || (first >= -112 && first < 0)

  /** Read a vlong starting at `pos`; caller advances by `decodeSize`. */
  def readLong(buf: Array[Byte], pos: Int): Long = {
    val first = buf(pos)
    val len = decodeSize(first)
    if (len == 1) return first.toLong
    var i = 0L
    var idx = 0
    while (idx < len - 1) {
      i = (i << 8) | (buf(pos + 1 + idx) & 0xffL)
      idx += 1
    }
    if (isNegative(first)) i ^ -1L else i
  }

  /** Encoded size of a value. */
  def encodedSize(value: Long): Int = {
    if (value >= -112 && value <= 127) return 1
    var i = if (value < 0) value ^ -1L else value
    var dataLen = 0
    while (i != 0) { i >>>= 8; dataLen += 1 }
    1 + dataLen
  }

  /** Write a vlong into `buf` at `pos`; returns bytes written. */
  def write(buf: Array[Byte], pos: Int, value: Long): Int = {
    if (value >= -112 && value <= 127) {
      buf(pos) = value.toByte
      return 1
    }
    var len = -112
    var i = value
    if (i < 0) { i ^= -1L; len = -120 }
    var tmp = i
    while (tmp != 0) { tmp >>= 8; len -= 1 }
    buf(pos) = len.toByte
    val dataLen = if (len < -120) -(len + 120) else -(len + 112)
    var idx = dataLen
    var off = pos + 1
    while (idx != 0) {
      val shift = (idx - 1) * 8
      buf(off) = ((i >> shift) & 0xff).toByte
      off += 1
      idx -= 1
    }
    1 + dataLen
  }

  def write(out: java.io.OutputStream, value: Long): Unit = {
    val tmp = new Array[Byte](9)
    val n = write(tmp, 0, value)
    out.write(tmp, 0, n)
  }
}
