package graft.core.seqfile

import java.nio.charset.StandardCharsets

/** SequenceFile compression layout. The reference supports BLOCK only
  * (rejecting the others at Parser.hs:56-60); real Hadoop's default is
  * RECORD and uncompressed files are everywhere in data lakes, so the
  * reader accepts all three. */
sealed abstract class SeqCompression(val name: String)
object SeqCompression {
  case object None extends SeqCompression("NONE")
  case object Record extends SeqCompression("RECORD")
  case object Block extends SeqCompression("BLOCK")
}

/** Parsed SequenceFile header — the file-level schema descriptor (Java class
  * names as strings ARE the schema), analog of the reference's `Header`
  * (reference: src/Data/Hadoop/SequenceFile/Types.hs:16-25).
  *
  * @param codecClass empty string for uncompressed files (Hadoop omits the
  *                   codec class entirely when compressed=false).
  * @param dataStart  absolute offset of the first byte after the header sync.
  */
final case class SeqHeader(
    keyClass: String,
    valueClass: String,
    compression: SeqCompression,
    codecClass: String,
    metadata: Seq[(String, String)],
    sync: Array[Byte],
    dataStart: Long) {
  def keyType: WritableType = WritableType.forClassOrThrow(keyClass)
  def valueType: WritableType = WritableType.forClassOrThrow(valueClass)
  def codec: SeqBlockCodec = SeqCodecs.forClassOrThrow(codecClass)
}

object SeqHeader {
  val Magic: Array[Byte] = "SEQ".getBytes(StandardCharsets.US_ASCII)
  val Version: Int = 6
  val SyncSize: Int = 16
  val SnappyCodecClass = "org.apache.hadoop.io.compress.SnappyCodec"
  /** Sanity bound on header metadata entries, guarding against byte-order
    * confusion on corrupt files. */
  val MaxMetadataEntries: Int = 1 << 20

  /** Parse and validate a header. Magic/version/class parsing follows the
    * reference (Parser.hs:42-54); unlike the reference — which accepts only
    * block-compressed Snappy (Parser.hs:56-65) — all three compression
    * layouts and the deflate-family codecs are accepted (SeqCodecs), since
    * real Hadoop writes them by default. Unknown codecs still fail here,
    * fast, with the supported list in the message. */
  def parse(in: SeqInput): SeqHeader = {
    in.seek(0L)
    val magic = in.readFully(3)
    if (!java.util.Arrays.equals(magic, Magic))
      throw new SeqFileFormatException(
        s"not a sequence file: bad magic ${magic.map(b => f"$b%02x").mkString}")
    val version = in.readByte()
    if (version != Version)
      throw new SeqFileFormatException(
        s"unknown version: $version (only version $Version supported)")
    val keyClass = readText(in)
    val valueClass = readText(in)
    val compressed = readBool(in)
    val blockCompressed = readBool(in)
    val compression =
      if (blockCompressed && compressed) SeqCompression.Block
      else if (compressed) SeqCompression.Record
      else if (!blockCompressed) SeqCompression.None
      else throw new SeqFileFormatException(
        "invalid header: blockCompressed=true with compressed=false")
    // Hadoop writes the codec class only for compressed files.
    val codecClass =
      if (compressed) {
        val c = readText(in)
        SeqCodecs.forClassOrThrow(c) // validate now: fail at header, not mid-scan
        c
      } else ""
    // Metadata count: real Hadoop writes this big-endian (DataOutput.writeInt
    // in SequenceFile$Metadata.write). The reference reads it little-endian
    // (reference: Parser.hs:72-75 `anyWord32le`) — a latent bug that is
    // byte-identical only for the empty-metadata files it was tested on
    // (count 0). We follow real Hadoop, verified by round-tripping nonempty
    // metadata through hadoop-client's SequenceFile.Reader.
    val nMeta = in.readBE32()
    if (nMeta > MaxMetadataEntries)
      throw new SeqFileFormatException(s"metadata count $nMeta exceeds sanity bound")
    val metadata = (0L until nMeta).map { _ =>
      (readText(in), readText(in))
    }
    val sync = in.readFully(SyncSize)
    SeqHeader(keyClass, valueClass, compression, codecClass, metadata, sync, in.pos)
  }

  /** Hadoop `Text.readString`: vint byte length + UTF-8 bytes. */
  private def readText(in: SeqInput): String = {
    val len = in.readVInt()
    if (len < 0 || len > (1 << 24))
      throw new SeqFileFormatException(s"unreasonable string length $len in header")
    new String(in.readFully(len), StandardCharsets.UTF_8)
  }

  private def readBool(in: SeqInput): Boolean = in.readByte() match {
    case 0 => false
    case 1 => true
    case b => throw new SeqFileFormatException(s"invalid boolean byte $b in header")
  }
}
