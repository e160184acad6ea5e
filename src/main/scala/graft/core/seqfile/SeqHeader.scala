package graft.core.seqfile

import java.nio.charset.StandardCharsets

/** Parsed SequenceFile header — the file-level schema descriptor (Java class
  * names as strings ARE the schema), analog of the reference's `Header`
  * (reference: src/Data/Hadoop/SequenceFile/Types.hs:16-25).
  *
  * @param dataStart absolute offset of the first record block's escape word.
  */
final case class SeqHeader(
    keyClass: String,
    valueClass: String,
    codecClass: String,
    metadata: Seq[(String, String)],
    sync: Array[Byte],
    dataStart: Long) {
  def keyType: WritableType = WritableType.forClassOrThrow(keyClass)
  def valueType: WritableType = WritableType.forClassOrThrow(valueClass)
}

object SeqHeader {
  val Magic: Array[Byte] = "SEQ".getBytes(StandardCharsets.US_ASCII)
  val Version: Int = 6
  val SyncSize: Int = 16
  val SnappyCodecClass = "org.apache.hadoop.io.compress.SnappyCodec"
  /** Sanity bound on header metadata entries, guarding against byte-order
    * confusion on corrupt files. */
  val MaxMetadataEntries: Int = 1 << 20

  /** Parse and validate a header, enforcing exactly the reference's
    * restrictions: version 6 only (reference: Parser.hs:49-51), block
    * compression only (Parser.hs:56-60), SnappyCodec only (Parser.hs:62-65).
    */
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
    if (!compressed || !blockCompressed)
      throw new SeqFileFormatException(
        "only block compressed files supported " +
          s"(compressed=$compressed, blockCompressed=$blockCompressed)")
    val codecClass = readText(in)
    if (codecClass != SnappyCodecClass)
      throw new SeqFileFormatException(
        s"unsupported codec: $codecClass (only $SnappyCodecClass supported)")
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
    SeqHeader(keyClass, valueClass, codecClass, metadata, sync, in.pos)
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
