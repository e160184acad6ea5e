package graft.core.seqfile

import java.util.Base64

/** Per-block key Bloom filter — the point-lookup complement to zone maps.
  *
  * Zone-map [min, max] pruning only bites when data is sorted (or at least
  * clustered) by the probed column: on an UNSORTED lake every block's range
  * spans the domain and `key = 42` prunes nothing. A Bloom filter per
  * record block answers "is this exact key possibly here?" regardless of
  * ordering, so equality and IN probes skip blocks (and, transitively,
  * whole files) on data nobody sorted. Opt-in at write time
  * (`bloomKeys=true`, `bloomFpp=0.01`): at the default 1% false-positive
  * rate the filter costs ~9.6 bits per distinct key — ~1.2 bytes/record
  * riding in the sidecar next to the ~100-byte min/max entry.
  *
  * Like every sidecar structure here it is advisory and conservative: a
  * Bloom "maybe" reads the block, Spark re-evaluates all filters on
  * surviving rows, and sidecar staleness is caught by the file-length
  * check before any of this runs.
  *
  * Implementation: standard Bloom with Kirsch–Mitzenmacher double hashing
  * (g_i = h1 + i·h2) over one 64-bit key hash; the key's canonical form is
  * its ZoneKey (same canonicalization the min/max stats use), hashed with
  * FNV-1a 64 + a murmur-style finalizer. Deterministic everywhere.
  */
final class KeyBloom(val bits: Array[Long], val numHashes: Int) {
  private val nBits: Long = bits.length.toLong * 64

  def mightContain(h: Long): Boolean = {
    val h2 = KeyBloom.fmix64(h) | 1L // odd => full cycle over any m
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h + i.toLong * h2, nBits)
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

object KeyBloom {

  private[seqfile] def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** 64-bit hash of a key's canonical ZoneKey form. */
  def hashKey(k: ZoneKey): Long = k match {
    case ZoneKey.L(v) => fmix64(v ^ 0x9e3779b97f4a7c15L)
    case ZoneKey.D(v) => fmix64(java.lang.Double.doubleToLongBits(v) ^ 0x2545f4914f6cdd1dL)
    case ZoneKey.B(bytes) =>
      var h = 0xcbf29ce484222325L // FNV-1a 64
      var i = 0
      while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
      fmix64(h)
  }

  /** Build a filter sized for `hashes.length` insertions at `fpp`:
    * m = ceil(−n·ln p / ln²2) bits (word-rounded), k = max(1, round(m/n·ln2)). */
  def build(hashes: Array[Long], fpp: Double): KeyBloom = {
    require(fpp > 0 && fpp < 1, s"fpp $fpp")
    val n = math.max(1, hashes.length)
    val m = math.max(64L,
      math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val words = ((m + 63) / 64).toInt
    val k = math.max(1, math.round(m.toDouble / n * math.log(2)).toInt)
    val bits = new Array[Long](words)
    val nBits = words.toLong * 64
    var j = 0
    while (j < hashes.length) {
      val h = hashes(j)
      val h2 = fmix64(h) | 1L
      var i = 0
      while (i < k) {
        val pos = java.lang.Long.remainderUnsigned(h + i.toLong * h2, nBits)
        bits((pos >>> 6).toInt) |= 1L << (pos & 63)
        i += 1
      }
      j += 1
    }
    new KeyBloom(bits, k)
  }

  /** Sidecar text encoding: `k<numHashes>:<base64 of little-endian words>`. */
  def encode(b: KeyBloom): String = {
    val buf = java.nio.ByteBuffer.allocate(b.bits.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.bits.foreach(buf.putLong)
    s"k${b.numHashes}:${Base64.getEncoder.encodeToString(buf.array())}"
  }

  def decode(s: String): KeyBloom = {
    require(s.nonEmpty && s.charAt(0) == 'k', s"bad bloom encoding")
    val sep = s.indexOf(':')
    val k = s.substring(1, sep).toInt
    val raw = Base64.getDecoder.decode(s.substring(sep + 1))
    require(raw.length % 8 == 0 && raw.length > 0, "bad bloom payload")
    val buf = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val bits = Array.fill(raw.length / 8)(buf.getLong())
    new KeyBloom(bits, k)
  }
}
