package graft.core.media

/** Minimal, real WAV/PCM codec — pure JVM, no libraries.
  *
  * Supported on decode: RIFF/WAVE with a PCM (format 1) 'fmt ' chunk,
  * 8-bit unsigned or 16-bit signed little-endian samples, any channel
  * count; unknown chunks are skipped (with the RIFF odd-length pad rule),
  * so files carrying LIST/INFO/fact chunks decode fine. Samples are
  * returned interleaved, normalized to signed ints centered on 0 (8-bit
  * values are re-biased by -128) so stats code is depth-independent.
  * Unsupported shapes return Left(reason) — corrupt-record semantics, not
  * exceptions.
  *
  * Encode emits canonical 44-byte-header 16-bit PCM (round-trip specs +
  * arithmetic-oracle fixtures).
  */
object WavCodec {

  final case class WavAudio(sampleRate: Int, channels: Int, bitsPerSample: Int,
                            samples: Array[Int]) {
    def nSamples: Int = samples.length
    def mean: Double =
      if (samples.isEmpty) 0.0 else samples.map(_.toLong).sum.toDouble / samples.length
    def rms: Double = {
      if (samples.isEmpty) return 0.0
      var s = 0.0
      var i = 0
      while (i < samples.length) { s += samples(i).toDouble * samples(i); i += 1 }
      math.sqrt(s / samples.length)
    }
    /** Fraction of adjacent sample pairs with a sign change. */
    def zeroCrossingRate: Double = {
      if (samples.length < 2) return 0.0
      var n = 0
      var i = 1
      while (i < samples.length) {
        if ((samples(i) >= 0) != (samples(i - 1) >= 0)) n += 1
        i += 1
      }
      n.toDouble / (samples.length - 1)
    }
  }

  import ByteIO.{le16, le32, putLe16, putLe32}

  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE"

  def decode(b: Array[Byte]): Either[String, WavAudio] = {
    if (!isWav(b)) return Left("not a WAV: missing RIFF/WAVE header")
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None     // (offset, len)
    while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(b, off)
      val len = le32(b, off + 4)
      val body = off + 8
      // Long-space bounds: a declared chunk length near Int.MaxValue wraps
      // body+len negative and would pass an Int comparison, then crash in
      // allocation or the next chunk seek instead of returning Left.
      if (len < 0 || body.toLong + len > b.length)
        return Left(s"chunk '$id' overruns file: len $len at $body of ${b.length}")
      id match {
        case "fmt " =>
          if (len < 16) return Left(s"fmt chunk too short: $len")
          val audioFormat = le16(b, body)
          if (audioFormat != 1) return Left(s"unsupported format $audioFormat (PCM only)")
          fmt = Some((le16(b, body + 2), le32(b, body + 4), le16(b, body + 14)))
        case "data" => data = Some((body, len))
        case _ => () // skip LIST/fact/...
      }
      off = body + len + (len & 1) // RIFF chunks pad to even length
    }
    (fmt, data) match {
      case (Some((ch, rate, bits)), Some((doff, dlen))) =>
        if (ch < 1) return Left(s"bad channel count $ch")
        if (rate <= 0) return Left(s"bad sample rate $rate")
        bits match {
          case 16 =>
            val n = dlen / 2
            val s = new Array[Int](n)
            var i = 0
            while (i < n) { s(i) = le16(b, doff + 2 * i).toShort.toInt; i += 1 }
            Right(WavAudio(rate, ch, 16, s))
          case 8 =>
            val s = new Array[Int](dlen)
            var i = 0
            while (i < dlen) { s(i) = (b(doff + i) & 0xff) - 128; i += 1 }
            Right(WavAudio(rate, ch, 8, s))
          case other => Left(s"unsupported bit depth $other (8/16 only)")
        }
      case (None, _) => Left("missing fmt chunk")
      case (_, None) => Left("missing data chunk")
    }
  }

  /** Encode interleaved signed samples as canonical 16-bit PCM. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Int]): Array[Byte] = {
    require(sampleRate > 0 && channels >= 1, s"bad shape $sampleRate/$channels")
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    putTag(out, 0, "RIFF"); putLe32(out, 4, 36 + dataLen); putTag(out, 8, "WAVE")
    putTag(out, 12, "fmt "); putLe32(out, 16, 16)
    putLe16(out, 20, 1) // PCM
    putLe16(out, 22, channels)
    putLe32(out, 24, sampleRate)
    putLe32(out, 28, sampleRate * channels * 2) // byte rate
    putLe16(out, 32, channels * 2)              // block align
    putLe16(out, 34, 16)                        // bits
    putTag(out, 36, "data"); putLe32(out, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      val v = math.max(Short.MinValue, math.min(Short.MaxValue, samples(i)))
      out(44 + 2 * i) = v.toByte
      out(44 + 2 * i + 1) = (v >> 8).toByte
      i += 1
    }
    out
  }

  private def putTag(b: Array[Byte], o: Int, t: String): Unit = {
    var i = 0
    while (i < 4) { b(o + i) = t.charAt(i).toByte; i += 1 }
  }
}
