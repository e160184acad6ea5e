package graft.core.media

/** Shared little-endian byte helpers for the media codecs. All reads take
  * Int offsets validated by callers; all LENGTH/SIZE arithmetic on values
  * read from untrusted files must be done in Long space — a crafted header
  * can make any Int product/sum wrap negative and slip past a bounds check
  * (then crash in allocation or copyOfRange, violating the decoders'
  * Left-on-corrupt contract). */
object ByteIO {
  def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  def putLe16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
  }
  def putLe32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
    b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
  }
}
