package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic hash kernels used by the fingerprinting / SimHash
  * expressions. Static methods so generated code (doGenCode) can call them
  * directly and stay inside whole-stage codegen.
  *
  * Self-contained (FNV-1a over UTF-8 bytes + murmur-style finalizer) — no
  * dependence on Spark-internal hash classes, stable across Spark versions.
  */
object HashKernels {

  final val FnvOffset: Long = 0xcbf29ce484222325L
  final val FnvPrime: Long = 0x100000001b3L

  /** 64-bit FNV-1a with avalanche finalizer over a byte range. */
  def fnv1a64(bytes: Array[Byte], off: Int, len: Int, seed: Long): Long = {
    var h = FnvOffset ^ seed
    var i = off
    val end = off + len
    while (i < end) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    fmix64(h)
  }

  /** murmur3 finalizer: avalanches FNV's weak low bits. */
  def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** Content fingerprint of a document: polynomial rolling hash over the
    * whitespace-normalized, lowercased text — a deterministic 64-bit
    * document identity for exact dedup at scale (hash-groupBy instead of
    * grouping by full text). Whitespace runs collapse to a single space;
    * leading/trailing whitespace ignored; ASCII uppercase folded. */
  def fingerprint64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = FnvOffset
    var i = 0
    var pendingSpace = false
    var emitted = false
    while (i < bytes.length) {
      val b = bytes(i)
      val isWs = b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'
      if (isWs) {
        if (emitted) pendingSpace = true
      } else {
        if (pendingSpace) { h ^= ' '.toLong; h *= FnvPrime; pendingSpace = false }
        val lower = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        h ^= (lower & 0xffL)
        h *= FnvPrime
        emitted = true
      }
      i += 1
    }
    fmix64(h)
  }

  /** SimHash over an array of token strings: per-token 64-bit hash votes on
    * each bit; the sign of each bit's vote sum forms the signature. Standard
    * Charikar construction; near-duplicate docs land within small Hamming
    * distance. */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val tok = tokens.getUTF8String(t)
        val b = tok.getBytes
        val h = fnv1a64(b, 0, b.length, 0L)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  /** Seeded string hash for MinHash permutations. */
  def seededHash64(s: UTF8String, seed: Long): Long = {
    val b = s.getBytes
    fnv1a64(b, 0, b.length, seed)
  }
}
